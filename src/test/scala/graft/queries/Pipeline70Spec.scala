package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, eighteenth batch: weekly PSI, Neyman allocation,
  * sample-size table.
  */
class Pipeline70Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q373: contributions tile each week's PSI; PSI nonnegative-ish") {
    val rows = q("q373_weekly_mix_psi").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val psi = g.head._6
      assert(g.forall(_._6 == psi))
      assert(g.map(_._5).sum == psi, "contributions must tile the PSI")
      // each term (p−q)·ln(p/q) is nonnegative up to ppm/micro rounding
      g.foreach(t => assert(t._5 >= -2L, s"term ${t._5} too negative"))
      assert(psi >= 0L)
    }
  }

  test("q374: allocations near-tile the budget; variance recompute") {
    val rows = q("q374_neyman_allocation").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val budget = 10000L
    val ney = rows.map(_._4).sum
    val prop = rows.map(_._5).sum
    assert(ney <= budget && ney >= budget - rows.length)
    assert(prop <= budget && prop >= budget - rows.length)
    rows.foreach(t => assert(t._6 == t._4 - t._5))
    // σ recompute for one source
    val (src, _, sig, _, _, _) = rows.head
    val xs = graft.queries.Tables.documents(spark, sf)
      .filter(col("source") === src)
      .select(size(split(lower(col("text")), "\\s+")).cast("long"))
      .collect().map(_.getLong(0))
    val n = BigInt(xs.length)
    val sx = xs.map(BigInt(_)).sum
    val sxx = xs.map(x => BigInt(x) * BigInt(x)).sum
    val expected = math.round(
      math.sqrt((n * sxx - sx * sx).toDouble) / xs.length * 1000.0)
    assert(sig == expected, s"$src sigma $sig vs $expected")
  }

  test("q375: Wald formula exact; widths order the requirements") {
    val rows = q("q375_sample_size_planner").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nDocs, p, w, nReq, feas) =>
      assert(p >= 0L && p <= 1000000L)
      assert(nReq == 38416L * p * (1000000L - p) / (10000L * w * w))
      assert(feas == (nReq <= nDocs))
    }
    // tighter width ⇒ more labels, monotone per source
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.sortBy(_._4)
      s.sliding(2).foreach { case Array(a, b) => assert(a._5 >= b._5) }
    }
  }
}
