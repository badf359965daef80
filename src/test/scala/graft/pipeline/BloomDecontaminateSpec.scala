package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bloom-prefiltered decontamination == the exact broadcast-hash-table
  * operator, row for row — the no-false-negative + exact-verify
  * invariant, checked on the fixture corpus and on planted overlaps. */
class BloomDecontaminateSpec extends SparkSpec {

  import spark.implicits._

  private def docsToks = graft.queries.Tables.documents(spark, sf)
    .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"),
      (col("doc_id") % 7 === 3).as("is_bench"))

  test("bloom path == exact path on the fixture corpus") {
    val exact = TextAnalysis.contaminationHashedToks(docsToks, n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloom = TextAnalysis.contaminationBloomToks(docsToks, n = 5)
      .orderBy("doc_id").collect().toSeq
    assert(exact.nonEmpty, "fixture has no contamination — test is vacuous")
    assert(bloom == exact)
  }

  test("bloom path == exact path with a deliberately tiny, collision-prone filter") {
    // expectedItems=1 forces a minimal bloom (max false-positive rate):
    // the verify join must still kill every FP — output unchanged.
    val exact = TextAnalysis.contaminationHashedToks(docsToks, n = 5)
      .orderBy("doc_id").collect().toSeq
    val bloom = TextAnalysis.contaminationBloomToks(docsToks, n = 5,
        expectedItems = 1L)
      .orderBy("doc_id").collect().toSeq
    assert(bloom == exact)
  }

  test("plan: bloom filter guards the scan; bench side never broadcasts") {
    val plan = TextAnalysis.contaminationBloomToks(docsToks, n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom pre-filter missing from the plan:\n$plan")
    assert(!plan.contains("BroadcastHashJoin"),
      s"verify join broadcast the bench side — the exact operator's shape, " +
        s"not the bloom path's:\n$plan")
  }

  test("planted benchmark overlap is found; clean docs stay absent") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", false), // shares 5-gram w/ bench
      (2L, "one two three four five six seven", false),   // clean
      (10L, "alpha beta gamma delta epsilon other", true)
    ).toDF("doc_id", "text", "is_bench")
      .select(col("doc_id"), TextAnalysis.toks(col("text")).as("toks"),
        col("is_bench"))
    val out = TextAnalysis.contaminationBloomToks(docs, n = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 1L)))
  }
}
