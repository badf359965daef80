package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q235–q238 pack. */
class Pipeline22Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q235 CUPED: arms partition users; adjustment preserves totals") {
    val out = q("q235_cuped_abtest").collect()
    assert(out.length === 2)
    val users = graft.queries.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users)
    // CUPED shifts arms against their covariate imbalance but the
    // scalars (theta, var reduction, SRM) are experiment-level
    assert(out.map(_.getAs[Long]("theta_ppm")).distinct.length === 1)
    assert(out.map(_.getAs[Long]("var_red_bp")).forall(_ >= 0))
    assert(out.map(_.getAs[Long]("srm_bp")).forall(b => b >= 0 && b < 10000))
    // adjusted mean stays within 1% of the raw mean at this theta
    out.foreach { r =>
      val raw = r.getAs[Long]("mean_post_cents") * 1000000L
      val adj = r.getAs[Long]("adj_mean_microcents")
      assert(math.abs(adj - raw) < raw / 100)
    }
  }

  test("q236 KM: risk set conserves users; log-survival non-increasing") {
    val out = q("q236_kaplan_meier").collect()
    val users = graft.queries.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    // first row's risk set is everyone; leavings sum to the user count
    assert(out.head.getAs[Long]("n_risk") === users)
    assert(out.map(r => r.getAs[Long]("n_events") +
      r.getAs[Long]("n_censored")).sum === users)
    // survival can only decay, and only event rows decay it
    val ls = out.map(_.getAs[Long]("log_surv_unats"))
    assert(ls.zip(ls.tail).forall { case (a, b) => b <= a })
    assert(ls.forall(_ <= 0))
    out.zipWithIndex.foreach { case (r, i) =>
      if (r.getAs[Long]("n_events") === 0 && i > 0)
        assert(ls(i) === ls(i - 1))
    }
    // censoring exists in-window (otherwise KM degenerates to a census)
    assert(out.map(_.getAs[Long]("n_censored")).sum > 0)
  }

  test("q237 matryoshka: recall consistent and truncation actually lossy") {
    val out = q("q237_matryoshka_recall").collect()
    assert(out.length === 5)
    out.foreach { r =>
      val h = r.getAs[Long]("n_hits")
      assert(h >= 0 && h <= 5)
      assert(r.getAs[Long]("recall_bp") === h * 10000L / 5)
    }
    // 16 of 64 dims must lose SOMETHING on this corpus, else the eval
    // is vacuous
    assert(out.map(_.getAs[Long]("n_hits")).sum < 25)
  }

  test("q238 robust means: trimming bounds and interval arithmetic") {
    val out = q("q238_robust_means").collect()
    assert(out.length === 5)
    out.foreach { r =>
      val n = r.getAs[Long]("n")
      val p10 = r.getAs[Long]("p10_cents")
      val p90 = r.getAs[Long]("p90_cents")
      assert(p10 < p90)
      // every estimator lives inside the clamped value range
      Seq("mean_cents", "trimmed_mean_cents", "winsor_mean_cents")
        .foreach { c =>
          val v = r.getAs[Long](c)
          assert(v > p10 && v < p90,
            s"$c=$v outside ($p10, $p90) for n=$n")
        }
    }
  }
}
