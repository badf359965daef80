package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q276–q279 pack. */
class Pipeline33Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q276 features: leakage-free by construction; window arithmetic") {
    val out = q("q276_forecast_features").collect()
    assert(out.nonEmpty)
    val daily = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000000").as("day"))
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("day")) ->
        r.getAs[Long]("count")).toMap
    out.foreach { r =>
      val t = r.getAs[String]("event_type"); val d = r.getAs[Long]("day")
      // every feature is a strictly EARLIER day's value; the target is
      // strictly later — re-derived from the raw census
      assert(r.getAs[Long]("lag1") === daily((t, d - 1)))
      assert(r.getAs[Long]("lag7") === daily((t, d - 7)))
      assert(r.getAs[Long]("target") === daily((t, d + 1)))
      val m7 = (1 to 7).map(k => daily((t, d - k))).sum * 100 / 7
      assert(r.getAs[Long]("mean7_centi") === m7)
    }
  }

  test("q277 entropy: bounded by ln(#types); erratic users top the list") {
    val out = q("q277_sequence_entropy").collect()
    assert(out.length === 15)
    val lnTypes = math.round(math.log(5.0) * 1e6)
    out.foreach { r =>
      val h = r.getAs[Long]("entropy_unats")
      assert(h >= 0 && h <= lnTypes, s"entropy $h outside [0, ln 5]")
    }
    val hs = out.map(_.getAs[Long]("entropy_unats"))
    assert(hs.zip(hs.tail).forall { case (a, b) => a >= b })
  }

  test("q278 assortativity: a genuine correlation in [-1, 1]") {
    val r = q("q278_assortativity").head()
    val a = r.getAs[Long]("assortativity_ppm")
    assert(a >= -1000000L && a <= 1000000L)
    assert(r.getAs[Long]("m2") > 0)
  }

  test("q279 correlations: bounded; diagonal-free canonical pairs") {
    val out = q("q279_column_correlation").collect()
    assert(out.length === 6)
    out.foreach { r =>
      val c = r.getAs[Long]("corr_ppm")
      assert(c >= -1000000L && c <= 1000000L)
      val Array(a, b) = r.getAs[String]("pair").split("__")
      assert(a !== b)
    }
    assert(out.map(_.getAs[String]("pair")).distinct.length === 6)
  }
}
