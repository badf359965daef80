package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Line-granularity curation: the C4 rule set and RefinedWeb-style
  * corpus-level duplicate-line removal over hand-built documents with
  * known line structure. */
class LinesSpec extends SparkSpec {

  import spark.implicits._

  // docs use "\n" lines directly (the operator takes any separator) —
  // the gate queries exercise the derived ". " sentence corpus.
  private val sep = "\n"

  test("c4LineFilter: word-count rule, blocklist rule, doc gate, reassembly") {
    val docs = Seq(
      // 4 lines: one too short, one blocklisted, two good → doc dropped
      (1L, "good line here\nshort one\nthis is spam content\nanother good line kept"),
      // 3 good lines → doc kept, clean text in original order
      (2L, "alpha beta gamma\ndelta epsilon zeta eta\ntheta iota kappa"),
      // blocklist must match whole tokens only: "spammy" is NOT "spam"
      (3L, "spammy words are fine\nsecond good line\nthird good line")
    ).toDF("doc_id", "text")
    val out = Lines.c4LineFilter(docs, "doc_id", "text",
        blocklist = Seq("spam"), minWords = 3, minKeptLines = 3, sep = sep)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Boolean, String)].collect()

    assert(out(0) == ((1L, 4L, 2L, 7L, false,
      "good line here | another good line kept")))
    assert(out(1) == ((2L, 3L, 3L, 10L, true,
      "alpha beta gamma | delta epsilon zeta eta | theta iota kappa")))
    assert(out(2)._5, "token-boundary blocklist must not match 'spammy'")
    assert(out(2)._3 == 3L)
  }

  test("corpusLineDedup: repeated line removed everywhere, order kept, empty-doc row survives") {
    val boiler = "accept all cookies"
    val docs = Seq(
      (1L, s"$boiler\nunique one\nunique two"),
      (2L, s"middle unique\n$boiler\ntail unique"),
      (3L, boiler) // all-boilerplate doc: row kept, clean_text empty
    ).toDF("doc_id", "text")
    val out = Lines.corpusLineDedup(docs, "doc_id", "text",
        minDocs = 2, sep = sep)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect()

    assert(out(0) == ((1L, 3L, 1L, "unique one | unique two")))
    assert(out(1) == ((2L, 3L, 1L, "middle unique | tail unique")),
      "survivor order must be original position order")
    assert(out(2) == ((3L, 1L, 1L, "")))
  }

  test("corpusLineDedup: minDocs threshold counts DISTINCT docs, not occurrences") {
    // line repeated twice WITHIN one doc only → df=1, must survive
    val docs = Seq((1L, "same line twice\nsame line twice\nother")).toDF("doc_id", "text")
    val out = Lines.corpusLineDedup(docs, "doc_id", "text",
        minDocs = 2, sep = sep)
      .as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 3L, 0L, "same line twice | same line twice | other")))
  }
}
