package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q231–q234 pack. */
class Pipeline21Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q231 Count-Min: one-sided overestimate, bounded by corpus mass") {
    val out = q("q231_countmin_freq")
    // CMS never underestimates (est = min over rows of colliding sums)
    assert(out.filter(col("est_cnt") < col("exact_cnt")).count() === 0)
    assert(out.filter(col("over_bp") < 0).count() === 0)
    // no estimate can exceed the total token mass in a single cell
    val mass = graft.queries.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("t"))
      .filter(length(col("t")) > 0).count()
    assert(out.filter(col("est_cnt") > mass).count() === 0)
    // the deliberately narrow 4x16 sketch must actually collide at
    // this vocabulary (31 toks / 16 buckets) — the eval is non-trivial
    assert(out.filter(col("over_bp") > 0).count() > 0)
  }

  test("q232 kappa: bounded by observed agreement, consistent ppm") {
    val r = q("q232_annotator_kappa").head()
    val n = r.getAs[Long]("n")
    val agree = r.getAs[Long]("agree")
    val po = r.getAs[Long]("po_ppm")
    val pe = r.getAs[Long]("pe_ppm")
    val k = r.getAs[Long]("kappa_ppm")
    assert(agree <= n)
    assert(po === agree * 1000000L / n)
    // kappa <= po (chance-corrected can't exceed raw agreement) and
    // sits in (0, 1e6) for mostly-agreeing annotators
    assert(k <= po && k > 0 && k < 1000000L)
    assert(pe > 0 && pe < po)
  }

  test("q233 Bradley-Terry: strengths normalize; order follows evidence") {
    val out = q("q233_bradley_terry")
    assert(out.count() === 20)
    val tot = out.agg(sum("strength_ppm")).head().getLong(0)
    // integer-div normalization loses at most 1 ppm per source
    assert(tot <= 1000000L && tot >= 1000000L - 20)
    // every source is positive (pseudo-games keep the graph connected)
    assert(out.filter(col("strength_ppm") <= 0).count() === 0)
    // the top source must not have fewer raw wins than the bottom one
    val rows = out.collect()
    assert(rows.head.getAs[Long]("wins") >= rows.last.getAs[Long]("wins"))
  }

  test("q234 JSD: nonnegative, bounded by ln2, symmetric by construction") {
    val out = q("q234_jsd_sources")
    assert(out.count() === 30)
    // JSD in [0, ln 2] => unats in [0, 693147]
    assert(out.filter(col("jsd_unats") < 0 ||
      col("jsd_unats") > 693147L).count() === 0)
    // pairs are canonical (sa < sb) and unique
    assert(out.filter(col("sa") >= col("sb")).count() === 0)
    assert(out.select("sa", "sb").distinct().count() === 30)
  }
}
