package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for q275 — the collapse-then-join
  * composition. */
class Pipeline32Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q275 == q61 with implied_pairs 1 on the dup-free fixture") {
    val plain = q("q61_ngram_jaccard").collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toMap
    val collapsed = q("q275_collapsed_ngram_join").collect()
    assert(collapsed.length === plain.size)
    collapsed.foreach { r =>
      val k = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(plain(k) === ((r.getAs[Long]("inter"), r.getAs[Long]("uni"))))
      assert(r.getAs[Long]("implied_pairs") === 1L)
    }
  }

  test("collapse-then-join multiplies out byte-dup groups exactly") {
    val base = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(50)
      .localCheckpoint()
    // 3 byte-copies of every doc under shifted ids
    val dup = base
      .unionByName(base.select((col("doc_id") + 100000L).as("doc_id"),
        col("text")))
      .unionByName(base.select((col("doc_id") + 200000L).as("doc_id"),
        col("text")))
    val groups = Dedup.exactGroups(dup, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), col("n_dups"))
    val reps = dup.join(groups, "doc_id")
    // every group collapsed to its minimal id with multiplicity 3
    assert(reps.count() === 50)
    assert(reps.filter(col("n_dups") =!= 3).count() === 0)
    assert(reps.filter(col("doc_id") >= 100000L).count() === 0)
    // the rep-side join equals the join on the distinct base corpus,
    // and each implied count is 3x3
    val repPairs = Dedup.ngramJaccardPairs(
      reps.select(col("doc_id"), col("text")), "doc_id", "text",
      n = 3, tNum = 4, tDen = 5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    val basePairs = Dedup.ngramJaccardPairs(
      base, "doc_id", "text", n = 3, tNum = 4, tDen = 5).collect()
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))).toSet
    assert(repPairs === basePairs)
  }
}
