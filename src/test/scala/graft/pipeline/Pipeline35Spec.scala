package graft.pipeline

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q282–q284 monitoring trio. */
class Pipeline35Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q282 Brier: Murphy identity holds to bin-rounding slack") {
    val r = q("q282_brier_decomposition").head()
    val bs = r.getAs[Long]("brier_micro")
    val rel = r.getAs[Long]("reliability_micro")
    val res = r.getAs[Long]("resolution_micro")
    val unc = r.getAs[Long]("uncertainty_micro")
    assert(Seq(bs, rel, res, unc).forall(v => v >= 0 && v <= 1000000L))
    // BS = UNC - RES + REL up to within-bin variance of confidences
    // (the identity is exact only when p is constant per bin) — on the
    // 10-bin grid the slack stays under ~0.02
    assert(math.abs(bs - (unc - res + rel)) < 20000L,
      s"bs=$bs unc-res+rel=${unc - res + rel}")
    // the q249-diagnosed miscalibration must dominate the probe's BS
    assert(rel > res)
  }

  test("q283 KS separation: consistent with the pinned AUC's signal") {
    val r = q("q283_score_ks").head()
    val ks = r.getAs[Long]("ks_ppm")
    assert(ks > 0 && ks <= 1000000L)
    // AUC 0.8+ implies strong separation; KS must clear 0.3
    assert(ks > 300000L, s"ks_ppm=$ks")
  }

  test("q284 score PSI: nonneg terms; same-population halves stay calm") {
    val out = q("q284_score_psi").collect()
    assert(out.length === 10)
    assert(out.forall(_.getAs[Long]("term_milli") >= 0))
    val psi = out.head.getAs[Long]("psi_milli")
    assert(out.forall(_.getAs[Long]("psi_milli") === psi))
    assert(psi === out.map(_.getAs[Long]("term_milli")).sum)
    // industry rule: PSI < 0.1 = stable — parity halves of one corpus
    assert(psi >= 0 && psi < 100L, s"psi_milli=$psi")
  }
}
