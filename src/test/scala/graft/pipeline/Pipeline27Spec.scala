package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q255–q258 pack. */
class Pipeline27Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q255 MRR: reciprocal identity; mean reconstructs; self excluded") {
    val out = q("q255_label_mrr").collect()
    out.foreach { r =>
      val hr = r.getAs[Long]("hit_rank")
      assert(hr >= 0 && hr <= 10)
      val expected = if (hr > 0) 1000000L / hr else 0L
      assert(r.getAs[Long]("rr_micro") === expected)
    }
    val mean = out.map(_.getAs[Long]("rr_micro")).sum / out.length
    assert(out.head.getAs[Long]("mrr_micro") === mean)
  }

  test("q256 target encoding: exclusion identity — no fold sees itself") {
    val out = q("q256_target_encoding").collect()
    assert(out.length === 25)
    // per category: n_f + n_out is constant (the category total)
    out.groupBy(_.getAs[String]("cat")).foreach { case (_, rs) =>
      val totals = rs.map(r => r.getAs[Long]("n_f") + r.getAs[Long]("n_out"))
      assert(totals.distinct.length === 1)
      // the five leave-one-fold-out means must differ from each other
      // unless the data is pathologically uniform
      assert(rs.map(_.getAs[Long]("enc_cents")).distinct.length > 1)
    }
  }

  test("q257 ESS: bounded by n; skewed lang mix costs real sample") {
    val r = q("q257_ess_weights").head()
    val n = r.getAs[Long]("n_docs")
    val ess = r.getAs[Long]("ess_micro")
    assert(ess <= n * 1000000L)
    // en-heavy mix: uniform-target weights must cost >5% of the sample
    assert(r.getAs[Long]("ess_bp") < 9500L &&
      r.getAs[Long]("ess_bp") > 5000L)
  }

  test("q258 NMI: information inequalities hold") {
    val r = q("q258_cluster_nmi").head()
    val mi = r.getAs[Long]("mi_unats")
    val hc = r.getAs[Long]("hc_unats")
    val hl = r.getAs[Long]("hl_unats")
    // 0 <= MI <= min(H(C), H(L)) up to micro-nat rounding slack
    assert(mi >= 0 && mi <= math.min(hc, hl) + 100)
    val nmi = r.getAs[Long]("nmi_ppm")
    assert(nmi >= 0 && nmi <= 1000000L)
    assert(nmi === 2 * mi * 1000000L / (hc + hl))
  }
}
