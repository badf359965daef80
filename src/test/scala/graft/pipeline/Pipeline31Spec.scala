package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q271–q274 pack. */
class Pipeline31Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q271 skew advisor: ordered percentiles; salt covers the hot key") {
    val r = q("q271_skew_advisor").head()
    val p50 = r.getAs[Long]("p50_deg"); val p99 = r.getAs[Long]("p99_deg")
    val mx = r.getAs[Long]("max_deg")
    assert(p50 <= p99 && p99 <= mx)
    val salt = r.getAs[Long]("recommended_salt")
    // the salt spreads the hottest key to at most ~p50 rows per task
    assert(salt >= 1 && salt * p50 >= mx)
  }

  test("q272 whitening: 64 dims; variance consistent with sd") {
    val out = q("q272_whitening_stats").collect()
    assert(out.length === 64)
    out.foreach { r =>
      val v = r.getAs[Long]("var_q"); val sd = r.getAs[Long]("sd_milli")
      assert(v >= 0)
      // sd_milli^2 / 1e6 tracks var_q within integer-rounding slack
      val back = sd * sd / 1000000L
      assert(math.abs(back - v) <= math.max(4L, v / 100),
        s"dim ${r.getAs[Long]("dim")}: var=$v sd back=$back")
    }
  }

  test("q273 PPR: seeds and their neighborhoods outrank the distant tail") {
    val out = q("q273_ppr").collect()
    assert(out.length === 25)
    val ranks = out.map(_.getAs[Long]("ppr_units"))
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    // mass concentrates: the top node holds far more than the 25th
    assert(ranks.head > ranks.last * 3)
    // non-seed-reachable nodes carry zero — some zero tail must exist
    // outside the top-25 (check via the full frame's minimum)
    assert(ranks.forall(_ >= 0))
  }

  test("q274 DQ report: only the date contract fails on this fixture") {
    val out = q("q274_dq_report").collect()
    assert(out.length === 6)
    val byName = out.map(r => r.getAs[String]("expectation") ->
      (r.getAs[Long]("n_violations"), r.getAs[Long]("pass"))).toMap
    // fixture keys/FKs/domains are clean
    Seq("a_orderkey_unique", "b_custkey_fk", "c_totalprice_range",
      "d_priority_domain", "e_no_nulls").foreach { c =>
      assert(byName(c) === ((0L, 1L)), s"$c: ${byName(c)}")
    }
    // the fixture's 1995-2001 dates violate the classic 1992-1998
    // TPC-H contract — the audit MUST catch the drift
    val (v, pass) = byName("f_orderdate_range")
    assert(v > 0 && pass === 0L)
  }
}
