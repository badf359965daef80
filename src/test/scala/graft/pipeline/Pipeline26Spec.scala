package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q251–q254 pack. */
class Pipeline26Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q251 DP release: reconstruction identity; noise within Laplace tails") {
    val out = q("q251_dp_noised_release").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("released_micro") ===
        r.getAs[Long]("n_true") * 1000000L + r.getAs[Long]("noise_micro"))
      assert(r.getAs[Long]("err_micro") ===
        math.abs(r.getAs[Long]("noise_micro")))
      // Laplace(b=2) with u in [1e-6, 1-1e-6]: |noise| <= 2·ln(1e6)
      assert(r.getAs[Long]("err_micro") <= (2 * math.log(1e6) * 1e6).toLong)
    }
    // the pseudo-noise must not be degenerate (all same sign or zero)
    val signs = out.map(r => java.lang.Long.signum(
      r.getAs[Long]("noise_micro"))).distinct
    assert(signs.length > 1)
  }

  test("q252 k-anonymity: histogram reconciles; k is the smallest size") {
    val out = q("q252_k_anonymity").collect()
    val k = out.head.getAs[Long]("k_anonymity")
    assert(out.forall(_.getAs[Long]("k_anonymity") === k))
    assert(out.map(_.getAs[Long]("gsize")).min === k)
    val customers = graft.queries.Tables.customer(spark, sf).count()
    assert(out.map(_.getAs[Long]("n_rows")).sum === customers)
    val risky = out.filter(_.getAs[Long]("gsize") < 5)
      .map(_.getAs[Long]("n_rows")).sum
    assert(out.head.getAs[Long]("risky_rows") === risky)
  }

  test("q253 Pareto: deciles census customers; shares decay and sum to 1") {
    val out = q("q253_revenue_pareto").collect()
    assert(out.length === 10)
    val customers = graft.queries.Tables.orders(spark, sf)
      .select("o_custkey").distinct().count()
    assert(out.map(_.getAs[Long]("n_customers")).sum === customers)
    val shares = out.map(_.getAs[Long]("share_bp"))
    // ranked descending: decile shares are non-increasing
    assert(shares.zip(shares.tail).forall { case (a, b) => a >= b })
    assert(out.last.getAs[Long]("cum_share_bp") === 10000L)
    // concentration is real: top decile above the uniform 1000 bp
    assert(shares.head > 1000L)
  }

  test("q254 modularity: bounds and the intra/degree decomposition") {
    val r = q("q254_graph_modularity").head()
    assert(r.getAs[Long]("m_edges") > 0)
    val intra = r.getAs[Long]("intra_ppm")
    val qq = r.getAs[Long]("q_ppm")
    // intra share in [0, 1]; Q in [-1, 1) and strictly below intra
    assert(intra >= 0 && intra <= 1000000L)
    assert(qq >= -1000000L && qq < 1000000L && qq < intra)
  }
}
