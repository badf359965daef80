package graft.queries

import graft.SparkSpec

/** Round-12 pack, twelfth batch: conformal-threshold construction
  * invariants (finite-sample k, threshold/coverage monotonicity in α)
  * and join-advisor rule consistency.
  */
class Pipeline48Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q324: finite-sample k, monotone thresholds and coverage in alpha") {
    val rows = q("q324_conformal_threshold").orderBy("alpha_ppm").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (alpha, nCal, k) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val wantK = ((nCal + 1) * (1000000L - alpha) + 999999L) / 1000000L
      assert(k == wantK, s"k formula at alpha=$alpha")
      val cov = r.getLong(5)
      assert(cov >= 0L && cov <= 1000000L)
    }
    // smaller alpha -> larger k -> larger threshold -> more coverage
    val (a5, a10) = (rows(0), rows(1)) // 50000 < 100000
    assert(a5.getLong(2) >= a10.getLong(2))
    assert(a5.getLong(3) >= a10.getLong(3), "qhat monotone in 1-alpha")
    assert(a5.getLong(5) >= a10.getLong(5), "coverage monotone in 1-alpha")
  }

  test("q325: recommendation matches the published rule on every row") {
    val rows = q("q325_join_advisor").collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (probeRows, buildKeys, hot) =
        (r.getLong(2), r.getLong(3), r.getLong(4))
      val skew = r.getLong(5)
      assert(hot <= probeRows && buildKeys <= probeRows && hot >= 1)
      assert(skew == hot * 1000000L / probeRows)
      val want =
        if (buildKeys <= 10000L) "broadcast"
        else if (skew > 50000L) "salted_shuffle"
        else "shuffle"
      assert(r.getString(6) == want, s"${r.getString(0)}")
    }
  }
}
