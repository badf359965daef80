package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, nineteenth batch: KMV algebra, consistent-hash churn.
  */
class Pipeline71Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q376: driver sketch replay; union estimate tracks the exact union") {
    val rows = q("q376_kmv_union").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // driver replay: per-source gram hash sets
    val grams = graft.queries.Tables.documents(spark, sf)
      .select(col("source"),
        explode(graft.expressions.functions.ngram_shingles(
          split(lower(col("text")), "\\s+"), 3, distinct = true))
          .as("sh"))
      .select(col("source"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
          .as("h"))
      .distinct().collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = grams.groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    val sketches = bySrc.view
      .mapValues(_.toSeq.sorted.take(64)).toMap
    rows.foreach { case (a, b, inBoth, unionEst, interEst, jac) =>
      val sa = sketches(a); val sb = sketches(b)
      val mg = (sa ++ sb).distinct.sorted.take(64)
      val hk = mg.last
      val both = mg.count(x => sa.contains(x) && sb.contains(x)).toLong
      val expU = (BigInt(63) * BigInt("1152921504606846976") /
        BigInt(math.max(1L, hk))).toLong
      assert(inBoth == both && unionEst == expU)
      assert(interEst == both * expU / 64)
      assert(jac == both * 1000000L / 64)
      // the estimate tracks the exact union within KMV error (~1/√64)
      val exact = (bySrc(a) union bySrc(b)).size.toLong
      assert(math.abs(unionEst - exact) * 10 <= exact * 5,
        s"($a,$b): est $unionEst vs exact $exact")
    }
  }

  test("q377: loads tile the keys; churn near the 1/9 theory") {
    val rows = q("q377_consistent_hash_churn").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val churn = rows.head._5
    assert(rows.forall(_._5 == churn))
    val n = graft.queries.Tables.documents(spark, sf).count()
    Seq(8L, 9L).foreach { sc =>
      val g = rows.filter(_._1 == sc)
      assert(g.map(_._3).sum == n, s"scenario $sc loads must tile keys")
      assert(g.map(_._2).forall(_ < sc))
    }
    // consistent hashing moves ~1/9 of keys (naive mod-N moves ~8/9);
    // wide tolerance for the 4-vnode ring's variance
    assert(churn > 200L && churn < 4000L, s"churn $churn bp")
  }
}
