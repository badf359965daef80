package graft.pipeline

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q247–q250 eval/drift pack. */
class Pipeline25Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q247 AUC: probe beats chance decisively; counts partition corpus") {
    val r = q("q247_auc_probe").head()
    assert(r.getAs[Long]("np") + r.getAs[Long]("nn") === 500L)
    val auc = r.getAs[Long]("auc_ppm")
    // a centroid-difference probe on clustered embeddings must separate
    // label 0 from the rest far better than chance, below perfection
    assert(auc > 650000L && auc < 1000000L, s"auc_ppm=$auc")
  }

  test("q248 AP: above prevalence (the random-ranking baseline), below 1") {
    val r = q("q248_avg_precision").head()
    val ap = r.getAs[Long]("ap_ppm")
    val prev = r.getAs[Long]("prevalence_ppm")
    assert(ap > prev * 2 && ap < 1000000L, s"ap=$ap prev=$prev")
  }

  test("q249 ECE: bins census the corpus; ECE is the weighted gap mean") {
    val out = q("q249_calibration_ece").collect()
    assert(out.map(_.getAs[Long]("n")).sum === 500L)
    val ece = out.head.getAs[Long]("ece_ppm")
    assert(out.forall(_.getAs[Long]("ece_ppm") === ece))
    val recomputed = out.map(r => r.getAs[Long]("n") *
      r.getAs[Long]("gap_ppm")).sum / out.map(_.getAs[Long]("n")).sum
    assert(ece === recomputed)
    // accuracy must trend upward with confidence at the extremes for a
    // signal-bearing (even if uncalibrated) probe
    val accLo = out.filter(_.getAs[Long]("bin") <= 2)
      .map(_.getAs[Long]("acc_ppm")).max
    val accHi = out.filter(_.getAs[Long]("bin") >= 7)
      .map(_.getAs[Long]("acc_ppm")).max
    assert(accHi > accLo)
  }

  test("q250 KS: D bounded by 1, hash arms of one population drift little") {
    val r = q("q250_ks_drift").head()
    val d = r.getAs[Long]("d_ppm")
    val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
    val users = graft.queries.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(na + nb === users)
    // same-population halves: below the alpha=0.001 two-sample KS
    // critical value c(alpha)·sqrt((na+nb)/(na·nb)), which adapts the
    // bound to the fixture's sample size (tiny at sf0.001)
    val crit = 1.95 * math.sqrt((na + nb).toDouble / (na * nb))
    assert(d > 0 && d < math.min(1.0, crit) * 1000000L,
      s"d_ppm=$d crit=${(crit * 1e6).toLong}")
  }
}
