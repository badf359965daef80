package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.SparkSpec

/** Two-pass global row numbering — and the round-16 cached-plan
  * regression: rowNumber/runningSum output must survive a DOWNSTREAM
  * persist() bit-exactly. Before the operators materialized their
  * partitioned pass, the offsets branch re-derived the range shuffle
  * with an independent RangePartitioner sample; under cached-plan
  * compilation the two branches' pids diverged and the __pid join
  * silently dropped 97% of the rows (466 of 15000 survived — the q326
  * failure RankProbe pinned). These tests run the exact failing shape. */
class GlobalRankSpec extends SparkSpec {

  import spark.implicits._

  test("rowNumber is the 1..n permutation in key order, multi-partition") {
    val rnd = new scala.util.Random(3)
    val df = rnd.shuffle((1 to 4000).toList).map(i => (i.toLong, i % 7))
      .toDF("id", "junk").repartition(11)
    val got = GlobalRank.rowNumber(df, "rn", col("id"))
      .select(col("id"), col("rn").cast("long")).as[(Long, Long)]
      .collect().toMap
    assert(got.size == 4000)
    assert((1 to 4000).forall(i => got(i.toLong) == i.toLong))
  }

  test("rowNumber output survives a downstream persist (cached-plan regression)") {
    val df = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_custkey"))
    val n = df.count()
    val rn = GlobalRank.rowNumber(df, "rn", col("o_orderkey"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val agg = rn.agg(count(lit(1)), countDistinct(col("rn")),
        min(col("rn")).cast("long"), max(col("rn")).cast("long")).collect()(0)
      assert(agg.getLong(0) == n, "cached copy lost rows")
      assert(agg.getLong(1) == n, "rn not distinct in cached copy")
      assert(agg.getLong(2) == 1L && agg.getLong(3) == n,
        "rn not the 1..n permutation in cached copy")
    } finally rn.unpersist(true)
  }

  test("runningSum output survives a downstream persist (cached-plan regression)") {
    val df = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderkey"), lit(1L).as("w"))
    val n = df.count()
    val cum = GlobalCumSum.runningSum(df, col("w"), "cum", col("o_orderkey"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // weight 1 on a unique key: the running sum IS the row number
      val agg = cum.agg(count(lit(1)), countDistinct(col("cum")),
        min(col("cum")).cast("long"), max(col("cum")).cast("long")).collect()(0)
      assert(agg.getLong(0) == n, "cached copy lost rows")
      assert(agg.getLong(1) == n, "cum not distinct in cached copy")
      assert(agg.getLong(2) == 1L && agg.getLong(3) == n,
        "cum not the 1..n prefix in cached copy")
    } finally cum.unpersist(true)
  }

  test("rowNumberManaged/runningSumManaged cleanup releases the internal persist (ADVICE r16)") {
    val df = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderkey"), lit(1L).as("w"))
    // quiet baseline: the shared session carries prior suites' blocks
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    def cachedRdds() = spark.sparkContext.getPersistentRDDs.size
    assert(cachedRdds() == 0)
    val (rn, cleanRn) = GlobalRank.rowNumberManaged(df, "rn", col("o_orderkey"))
    rn.agg(max(col("rn"))).collect()
    assert(cachedRdds() > 0, "operator should register its internal persist")
    cleanRn()
    assert(cachedRdds() == 0,
      s"rowNumber cleanup left ${cachedRdds()} persisted RDDs")
    val (cum, cleanCum) = GlobalCumSum.runningSumManaged(
      df, col("w"), "cum", col("o_orderkey"))
    cum.agg(max(col("cum"))).collect()
    assert(cachedRdds() > 0)
    cleanCum()
    cleanCum() // safe to call more than once (the documented contract)
    assert(cachedRdds() == 0,
      s"runningSum cleanup left ${cachedRdds()} persisted RDDs")
  }
}
