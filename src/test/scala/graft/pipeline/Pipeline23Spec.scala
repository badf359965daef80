package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q239–q242 pack. */
class Pipeline23Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q239 MAD: medians are observed values; outlier rate sane") {
    val out = q("q239_mad_outliers").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("mad_cents") > 0)
      val bp = r.getAs[Long]("outlier_bp")
      // a symmetric-ish value distribution flags a small tail, never
      // the bulk (3-MAD cut: < 25%), and the fixture isn't outlier-free
      assert(bp > 0 && bp < 2500)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("q240 CUSUM: reflection identity holds; stable fixture stays quiet") {
    val out = q("q240_cusum_changepoint").collect()
    // nonneg statistic, no alarms on stable data, but real movement
    assert(out.forall(_.getAs[Long]("cusum_micro") >= 0))
    assert(out.forall(_.getAs[Long]("alarm") === 0L))
    assert(out.map(_.getAs[Long]("cusum_micro")).max > 0)
    // per type: day-count rows equal the distinct days of that type
    val days = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"), expr("ts div 86400000000000").as("d"))
      .distinct().count()
    assert(out.length.toLong === days)
  }

  test("q241 basket rules: symmetric lift, confidence bounded by 1") {
    val out = q("q241_basket_rules").collect()
    assert(out.length === 20)
    out.foreach { r =>
      assert(r.getAs[Long]("cab") >= 3)
      assert(r.getAs[Long]("conf_ppm") > 0 &&
        r.getAs[Long]("conf_ppm") <= 1000000L)
      // interesting rules only: lift must exceed independence
      assert(r.getAs[Long]("lift_ppm") > 1000000L)
    }
    // lift is direction-independent: both directions of a surviving
    // pair carry the same lift_ppm
    val byPair = out.groupBy(r => {
      val a = r.getAs[Long]("ante"); val b = r.getAs[Long]("cons")
      (math.min(a, b), math.max(a, b))
    })
    byPair.values.filter(_.length == 2).foreach { rs =>
      assert(rs.map(_.getAs[Long]("lift_ppm")).distinct.length === 1)
    }
  }

  test("q242 RFM: cells census every purchasing user; scores in 1..4") {
    val out = q("q242_rfm_segments").collect()
    val users = graft.queries.Tables.events(spark, sf)
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users)
    Seq("r_score", "f_score", "m_score").foreach { c =>
      assert(out.forall { r =>
        val v = r.getAs[Int](c); v >= 1 && v <= 4
      })
    }
    // monetary score must order mean monetary value monotonically at
    // the margins: cells with m_score=4 average above cells with 1
    val lo = out.filter(_.getAs[Int]("m_score") == 1)
      .map(r => r.getAs[Long]("avg_money_cents")).max
    val hi = out.filter(_.getAs[Int]("m_score") == 4)
      .map(r => r.getAs[Long]("avg_money_cents")).min
    assert(hi > lo)
  }
}
