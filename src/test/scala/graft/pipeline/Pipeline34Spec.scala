package graft.pipeline

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q280–q281 curve evals. */
class Pipeline34Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q280 lift chart: gain monotone to 100%; lift decays to 1") {
    val out = q("q280_lift_chart").collect()
    assert(out.length === 10)
    val gains = out.map(_.getAs[Long]("cum_gain_bp"))
    assert(gains.zip(gains.tail).forall { case (a, b) => b >= a })
    assert(gains.last === 10000L)
    val lifts = out.map(_.getAs[Long]("cum_lift_ppm"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => b <= a })
    assert(lifts.last === 1000000L) // full population = prevalence
    // the probe targets: the top decile must beat random
    assert(lifts.head > 1500000L)
  }

  test("q281 ROC: monotone curve dominating the diagonal on average") {
    val out = q("q281_roc_points").collect()
    assert(out.length === 9)
    val tpr = out.map(_.getAs[Long]("tpr_ppm"))
    val fpr = out.map(_.getAs[Long]("fpr_ppm"))
    assert(tpr.zip(tpr.tail).forall { case (a, b) => b >= a })
    assert(fpr.zip(fpr.tail).forall { case (a, b) => b >= a })
    assert(tpr.forall(v => v >= 0 && v <= 1000000L))
    assert(fpr.forall(v => v >= 0 && v <= 1000000L))
    // a signal-bearing probe: TPR above FPR at every operating point
    assert(tpr.zip(fpr).forall { case (t, f) => t >= f })
    assert(tpr.zip(fpr).exists { case (t, f) => t > f })
  }
}
