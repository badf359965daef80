package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance weights: target-like raw docs must outscore
  * target-unlike ones; only raw-pool docs are scored; weights are
  * deterministic across runs. (Exact arithmetic is pinned by the q162
  * DuckDB oracle; this spec owns the semantics.) */
class DsirSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    // target corpus: dominated by "alpha beta"
    (100L, "alpha beta alpha beta alpha beta alpha beta"),
    (101L, "alpha beta alpha alpha beta beta alpha beta"),
    // raw pool
    (1L, "alpha beta alpha beta"),   // target-like
    (2L, "zzz qqq www rrr"),         // target-unlike
    (3L, "alpha beta zzz qqq")       // mixed
  ).toDF("doc_id", "text")

  private def weights = Curation.dsirWeights(
      docs, "doc_id", "text", isTarget = col("doc_id") >= 100L, nBuckets = 4096)
    .orderBy("doc_id")
    .as[(Long, Long, Long, Long)].collect().toSeq

  test("target-like raw docs outscore target-unlike; mixed sits between") {
    val w = weights.map(r => r._1 -> r._3).toMap
    assert(w.keySet == Set(1L, 2L, 3L), "only raw-pool docs are scored")
    assert(w(1L) > w(3L) && w(3L) > w(2L),
      s"expected w(1) > w(3) > w(2), got $w")
    assert(w(1L) > 0 && w(2L) < 0,
      "target-like mass should be positive, target-absent negative")
  }

  test("deterministic across runs and per-token mean is floor(w/n)") {
    val a = weights
    assert(a == weights)
    a.foreach { case (_, n, w, wpt) =>
      assert(wpt == math.floor(w.toDouble / n).toLong)
    }
  }
}
