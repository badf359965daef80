package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q243–q246 pack. */
class Pipeline24Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q243 Shapley: efficiency axiom — phis sum to v(grand) spread") {
    val out = q("q243_shapley_attribution").collect()
    assert(out.length === 4)
    // the windowed value function must actually discriminate channels
    assert(out.map(_.getAs[Long]("phi_ppm")).distinct.length > 1)
    // efficiency: sum of phis = sum over channels of their marginal
    // chains = v(full support reachable) - v(empty); with the
    // observed-subset v both sides are bounded by the ppm scale
    val tot = out.map(_.getAs[Long]("phi_ppm")).sum
    assert(math.abs(tot) <= 1000000L)
  }

  test("q244 Welch: internal consistency of the integer test readout") {
    val r = q("q244_welch_ttest").head()
    val na = r.getAs[Long]("na"); val nb = r.getAs[Long]("nb")
    assert(na > 1 && nb > 1)
    assert(r.getAs[Long]("var_a_d2") > 0 && r.getAs[Long]("var_b_d2") > 0)
    assert(r.getAs[Long]("se_microd") > 0)
    // Welch df lives in (min(na,nb)-1, na+nb-2]
    val df = r.getAs[Long]("df_milli")
    assert(df > (math.min(na, nb) - 1) * 1000L &&
      df <= (na + nb - 2) * 1000L)
    // t = diff/se reproduced from the reported integers
    val t = (r.getAs[Long]("mean_a_microd") -
      r.getAs[Long]("mean_b_microd")) * 1000L / r.getAs[Long]("se_microd")
    assert(t === r.getAs[Long]("t_milli"))
  }

  test("q245 backtest: 7-day holdout per type, ratio reconstructs") {
    val out = q("q245_seasonal_backtest").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_eval") === 7L)
      assert(r.getAs[Long]("mae_seas_c") >= 0)
      assert(r.getAs[Long]("mae_naive_c") > 0)
      assert(r.getAs[Long]("mase_bp") > 0)
    }
  }

  test("q246 concentration: near-uniform fixture pins all four metrics") {
    val r = q("q246_source_concentration").head()
    val k = r.getAs[Long]("n_sources")
    assert(k === 20L)
    // entropy <= ln k (uniform bound), and close to it on this
    // near-uniform fixture
    val lnK = math.round(math.log(k.toDouble) * 1e6)
    val ent = r.getAs[Long]("entropy_unats")
    assert(ent <= lnK && ent > lnK * 95 / 100)
    // effective sources in (1, k]; HHI >= 1/k; Gini in [0, 1)
    val eff = r.getAs[Long]("eff_sources_micro")
    assert(eff > 1000000L && eff <= k * 1000000L)
    assert(r.getAs[Long]("hhi_ppm") >= 1000000L / k)
    val g = r.getAs[Long]("gini_bp")
    assert(g >= 0 && g < 10000L)
  }
}
