package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q200–q204 pack (values are pinned by
  * the DuckDB oracle; these assert the properties that must hold by
  * construction). */
class Pipeline14Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q200 containment: bounds hold and Jaccard ≤ containment vs q197") {
    val cont = q("q200_kmv_containment")
    assert(cont.count() === 190)
    assert(cont.filter(col("shared") > least(col("na"), col("nb")) ||
      col("cont_ab_bp") > 10000 || col("cont_ba_bp") > 10000 ||
      col("na") > 64 || col("nb") > 64).count() === 0)
    // q197 and q200 merge the SAME per-source sketches, so the shared
    // count must agree pair-for-pair, and Jaccard (shared/|union topk|)
    // can never exceed either containment (shared/|side ∩ topk|)
    val jac = q("q197_kmv_setops")
      .select(col("src_a"), col("src_b"), col("shared").as("j_shared"),
        col("jaccard_bp"))
    val bad = cont.join(jac, Seq("src_a", "src_b"))
      .filter(col("shared") =!= col("j_shared") ||
        col("jaccard_bp") > col("cont_ab_bp") ||
        col("jaccard_bp") > col("cont_ba_bp"))
      .count()
    assert(bad === 0)
  }

  test("q201 EB smoothing: posterior sits between the MLE and the prior") {
    // floor-div on each side can perturb by 1 ppm — tolerance ±1
    val bad = q("q201_eb_rates")
      .filter(col("smoothed_ppm") <
          least(col("raw_ppm"), col("prior_ppm")) - 1 ||
        col("smoothed_ppm") >
          greatest(col("raw_ppm"), col("prior_ppm")) + 1)
      .count()
    assert(bad === 0)
  }

  test("q202 anomalies: flags exist, directions consistent, moments constant") {
    val out = q("q202_hourly_anomaly")
    assert(out.count() > 0)
    // which tail fires is data-dependent (at the sparse fixture, μ < 2σ,
    // so silent hours do NOT flag and every flag is a spike) — assert
    // the direction bit agrees with a recompute, not a tail census
    assert(out.filter(col("is_spike") =!=
      (col("c") * col("n") > col("s"))).count() === 0)
    // per-type moments are constants of the type, not of the hour
    val drift = out.groupBy("event_type")
      .agg(countDistinct("n").as("dn"), countDistinct("s").as("ds"),
        countDistinct("s2").as("ds2"))
      .filter(col("dn") > 1 || col("ds") > 1 || col("ds2") > 1)
      .count()
    assert(drift === 0)
  }

  test("q203 rolling actives: wau ≥ dau, bounded by the user universe") {
    val users = graft.queries.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val bad = q("q203_rolling_active")
      .filter(col("wau") < col("dau") || col("wau") > users ||
        col("dau") < 0)
      .count()
    assert(bad === 0)
  }

  test("q204 temperature: isqrt exact, shares sum to ~1, spread compressed") {
    val out = q("q204_mixture_temperature")
    assert(out.filter(col("w") * col("w") > col("n") ||
      (col("w") + 1) * (col("w") + 1) <= col("n")).count() === 0)
    val sums = out.agg(sum("natural_bp"), sum("temperature_bp")).head()
    assert(sums.getLong(0) > 10000 - 20 && sums.getLong(0) <= 10000)
    assert(sums.getLong(1) > 10000 - 20 && sums.getLong(1) <= 10000)
    // α = 1/2 compresses the mixture: the biggest source loses share,
    // the smallest gains (±1 bp floor tolerance)
    val ex = out.agg(max("natural_bp"), max("temperature_bp"),
      min("natural_bp"), min("temperature_bp")).head()
    assert(ex.getLong(1) <= ex.getLong(0) + 1)
    assert(ex.getLong(3) >= ex.getLong(2) - 1)
  }
}
