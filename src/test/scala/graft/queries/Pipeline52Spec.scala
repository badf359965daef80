package graft.queries

import graft.SparkSpec

/** Round-12 pack, sixteenth batch: fairness-audit accounting — rates in
  * bounds, gaps centered on the global rate, guarded denominators.
  */
class Pipeline52Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q330: rates bounded, gaps centered, zero-positive groups guarded") {
    val rows = q("q330_fairness_audit").collect()
    assert(rows.nonEmpty)
    var nTot = 0L
    var gapWeighted = 0L
    rows.foreach { r =>
      val (n, nPos) = (r.getLong(1), r.getLong(2))
      val (sel, tpr, fpr) = (r.getLong(3), r.getLong(4), r.getLong(5))
      assert(sel >= 0 && sel <= 1000000L)
      assert(tpr >= 0 && tpr <= 1000000L)
      assert(fpr >= 0 && fpr <= 1000000L)
      if (nPos == 0) assert(tpr == 0, "guarded denominator reports 0")
      nTot += n
      gapWeighted += n * r.getLong(6)
    }
    // the global selection rate is the n-weighted mean of group rates,
    // so the weighted parity gaps cancel up to integer-floor residue
    assert(math.abs(gapWeighted) <= nTot * rows.length,
      s"weighted parity gaps should center near 0, got $gapWeighted")
  }
}
