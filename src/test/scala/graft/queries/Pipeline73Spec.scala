package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, final batch: lognormal length model. */
class Pipeline73Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q380: moments match a BigInt driver recompute; medians sane") {
    val rows = q("q380_lognormal_fit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    val lx = graft.queries.Tables.documents(spark, sf)
      .select(col("source"),
        greatest(lit(1L), size(split(lower(col("text")), "\\s+"))
          .cast("long")).as("t"))
      .collect()
      .map(r => (r.getString(0),
        math.round(math.log(r.getLong(1).toDouble) * 1e6)))
    val bySrc = lx.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    rows.foreach { case (src, n, mu, sigma, med, skew) =>
      val xs = bySrc(src)
      assert(n == xs.length)
      val s1 = xs.map(BigInt(_)).sum
      assert(mu == (s1 / n).toLong)
      val s2 = xs.map(x => BigInt(x) * BigInt(x)).sum
      val expSigma = math.round(
        math.sqrt((BigInt(n) * s2 - s1 * s1).toDouble) / n)
      assert(sigma == expSigma)
      assert(med == math.round(math.exp(mu.toDouble / 1e6)))
      // lengths are bounded, so |skew| should be a small number of units
      assert(math.abs(skew) < 20000L, s"$src skew $skew")
      assert(med >= 1L)
    }
  }
}
