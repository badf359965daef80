package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q259–q262 pack. */
class Pipeline28Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q259 skyline: strictly increasing in BOTH dims; none dominated") {
    val out = q("q259_skyline").collect()
    assert(out.nonEmpty)
    // by construction price ascends; sizes must STRICTLY ascend too
    // (a later equal-or-smaller size would be dominated)
    val sizes = out.map(_.getAs[Long]("size"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => b > a })
    // spot-proof non-domination against the raw table: no part is
    // cheaper-or-equal AND larger than a skyline point (strictly
    // better somewhere)
    val parts = graft.queries.Tables.part(spark, sf)
      .select(expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("p"),
        col("p_size").cast("long").as("sz")).collect()
    out.foreach { sk =>
      val p0 = sk.getAs[Long]("price_cents"); val s0 = sk.getAs[Long]("size")
      assert(!parts.exists(r => r.getLong(0) <= p0 && r.getLong(1) >= s0 &&
        (r.getLong(0) < p0 || r.getLong(1) > s0)),
        s"skyline point ($p0, $s0) is dominated")
    }
  }

  test("q260 SPRT: crossing is genuine and before the end") {
    val r = q("q260_sprt_boundary").head()
    val n = r.getAs[Long]("n_events")
    val cross = r.getAs[Long]("first_cross_idx")
    val decision = r.getAs[String]("decision")
    if (decision == "no_decision") assert(cross === 0L)
    else {
      assert(cross > 0 && cross <= n)
      // a sequential decision must beat the batch sample size hugely
      // on this strongly-separated fixture
      assert(cross < n / 10)
    }
  }

  test("q261 geo join: symmetric-free canonical pairs within threshold") {
    val out = q("q261_geo_bin_join").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[String]("za") < r.getAs[String]("zb"))
      assert(r.getAs[Long]("d2") <= 62500000000L)
    }
    // ordered by distance: non-decreasing d2
    val ds = out.map(_.getAs[Long]("d2"))
    assert(ds.zip(ds.tail).forall { case (a, b) => b >= a })
  }

  test("q262 burstiness: day census consistent; Fano near Poisson here") {
    val out = q("q262_burstiness").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("var_daily") >= 0)
      assert(r.getAs[Long]("peak_to_mean_bp") >= 10000L) // peak >= mean
      // the synthetic uniform-arrival fixture is Poisson-ish: Fano in
      // a loose (0.2, 5) band — a 100x dispersion would flag a bug
      val f = r.getAs[Long]("fano_ppm")
      assert(f > 200000L && f < 5000000L, s"fano_ppm=$f")
    }
  }
}
