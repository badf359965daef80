package graft.pipeline

import graft.SparkSpec

/** Exact substring dedup: keep-first semantics, coverage merging for
  * runs longer than the window, within-doc repeats, short-doc no-op. */
class SubstringDedupSpec extends SparkSpec {

  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int) =
    Dedup.substringDedup(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("duplicated run removed from the later doc only; unique text untouched") {
    val shared = "one two three" // n = 3 → exactly one duplicated window
    val out = run(Seq(
      (1L, s"$shared alpha beta"),
      (2L, s"gamma delta $shared"),
      (3L, "totally unique tokens here")), n = 3)
    assert(out(0) == ((1L, 5L, 0L, "one two three alpha beta")),
      "globally first occurrence must survive")
    assert(out(1) == ((2L, 5L, 3L, "gamma delta")))
    assert(out(2) == ((3L, 4L, 0L, "totally unique tokens here")))
  }

  test("runs longer than the window are covered in full (overlap merge)") {
    val shared = "a b c d e" // 5 tokens, n=3 → 3 overlapping windows
    val out = run(Seq(
      (1L, s"$shared tail1 tail2"),
      (2L, s"head $shared")), n = 3)
    assert(out(0)._3 == 0L)
    assert(out(1) == ((2L, 6L, 5L, "head")),
      "every token of the shared run must be covered, none of the rest")
  }

  test("within-doc repetition: second occurrence masked") {
    val out = run(Seq((1L, "x y z mid x y z")), n = 3)
    assert(out(0) == ((1L, 7L, 3L, "x y z mid")))
  }

  test("docs shorter than the window are untouched") {
    val out = run(Seq((1L, "a b"), (2L, "a b")), n = 3)
    assert(out.map(_._3) == Seq(0L, 0L))
  }
}
