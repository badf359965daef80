package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q267–q270 pack. */
class Pipeline30Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q267 capture-recapture: Chapman brackets the true census") {
    val r = q("q267_capture_recapture").head()
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val m = r.getAs[Long]("m")
    assert(m <= math.min(n1, n2))
    val truth = r.getAs[Long]("true_users")
    val est = r.getAs[Long]("chapman_est")
    // the estimator can't fall below the observed union and should
    // land within 25% of the truth on this well-mixed fixture
    assert(est >= n1 + n2 - m)
    assert(math.abs(est - truth) * 4 <= truth, s"est=$est truth=$truth")
    assert(r.getAs[Long]("var_milli") >= 0)
  }

  test("q268 seasonal: additive indices balance near zero per type") {
    val out = q("q268_seasonal_decompose").collect()
    out.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      assert(rs.length === 7, s"$t has ${rs.length} dows")
      // detrended means weighted by obs must nearly cancel (additive
      // model: sum over the series of detrended terms is small)
      val weighted = rs.map(r =>
        r.getAs[Long]("seasonal_micro") * r.getAs[Long]("n_obs")).sum
      val n = rs.map(_.getAs[Long]("n_obs")).sum
      assert(math.abs(weighted / n) < 3000000L, s"$t imbalance $weighted")
    }
  }

  test("q269 postings: byte accounting consistent with df and gaps") {
    val out = q("q269_postings_varint").collect()
    assert(out.length === 15)
    out.foreach { r =>
      val df = r.getAs[Long]("df"); val bytes = r.getAs[Long]("bytes")
      // each posting costs 1..4 bytes
      assert(bytes >= df && bytes <= 4 * df)
      assert(r.getAs[Long]("bytes_per_posting_centi") === bytes * 100 / df)
      assert(r.getAs[Long]("avg_gap") >= 0)
    }
  }

  test("q270 funnel z: step counts nest; same-population arms stay calm") {
    val out = q("q270_funnel_significance").collect()
    assert(out.length === 2)
    out.foreach { r =>
      assert(r.getAs[Long]("conv_a") <= r.getAs[Long]("n_a"))
      assert(r.getAs[Long]("conv_b") <= r.getAs[Long]("n_b"))
      // hash-split arms of one population: |z| under 4 (no real effect)
      assert(math.abs(r.getAs[Long]("z_milli")) < 4000L)
    }
    // step 2's population is step 1's converters
    val s1 = out.find(_.getAs[String]("step").startsWith("1_")).get
    val s2 = out.find(_.getAs[String]("step").startsWith("2_")).get
    assert(s2.getAs[Long]("n_a") === s1.getAs[Long]("conv_a"))
    assert(s2.getAs[Long]("n_b") === s1.getAs[Long]("conv_b"))
  }
}
