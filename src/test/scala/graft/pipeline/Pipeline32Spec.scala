package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for q275 — the collapse-then-join
  * composition. */
class Pipeline32Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q275 collapses its planted dups back onto q61's rep pairs") {
    // q275 = q61's corpus + byte-copies of the %7==3 slice (+1e7 ids)
    // and the %13==5 slice (+2e7). Collapse must (a) keep near rep
    // pairs EXACTLY q61's near pairs (reps are the original min ids),
    // (b) weight each by the planted multiplicity product, (c) emit
    // one dup edge per planted copy of a shingleable doc.
    def mult(id: Long): Long = 1L + (if (id % 7 == 3) 1L else 0L) +
      (if (id % 13 == 5) 1L else 0L)
    val plain = q("q61_ngram_jaccard").collect()
      .filter(_.getAs[String]("kind") == "near")
      .map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id")) ->
        (r.getAs[Long]("inter"), r.getAs[Long]("uni"))).toMap
    val rows = q("q275_collapsed_ngram_join").collect()
    val near = rows.filter(_.getAs[String]("kind") == "near")
    assert(near.length === plain.size)
    near.foreach { r =>
      val k = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(plain(k) === ((r.getAs[Long]("inter"), r.getAs[Long]("uni"))))
      assert(r.getAs[Long]("implied_pairs") === mult(k._1) * mult(k._2),
        s"implied mismatch at $k")
    }
    val dup = rows.filter(_.getAs[String]("kind") == "dup")
    dup.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(b == a + 10000000L || b == a + 20000000L, s"bad dup edge ($a,$b)")
      assert(r.getAs[Long]("inter") === r.getAs[Long]("uni"))
      assert(r.getAs[Long]("implied_pairs") === 1L)
    }
    assert(dup.nonEmpty, "planted copies produced no dup edges")
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
