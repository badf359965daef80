package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located join: pre-bucketing both sides on the join key
  * removes the shuffle from every subsequent join — the 100 TB pattern
  * for repeated fact⋈fact joins (SURVEY.md "partitioning & shuffle"). */
class BucketingSpec extends SparkSpec {

  test("partitioned layout: read is partition-pruned, untouched partitions unread") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("part_docs").toString
    graft.queries.Tables.documents(spark, sf)
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("lang") === "en")
      .select(col("doc_id"), col("n_chars"))
    val n = df.count()
    assert(n > 0, "fixture has no en docs")
    val plan = df.queryExecution.executedPlan.toString
    // the lang filter must be a PARTITION filter (directory pruning —
    // at 100 TB this is the difference between reading one partition and
    // the whole corpus), not a post-scan row filter.
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"lang not pruned at partition level:\n$plan")
    val scanned = df.queryExecution.executedPlan.collectLeaves().map(_.toString)
      .mkString
    assert(!scanned.contains("PushedFilters: [IsNotNull(lang"),
      s"lang degraded to a data filter:\n$scanned")
  }

  test("bucketed tables join without a shuffle exchange") {
    // at fixture scale Spark prefers broadcast; disable it so the join
    // actually exercises the bucket layout (sort-merge, no exchange)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    graft.queries.Tables.orders(spark, sf)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.queries.Tables.lineitem(spark, sf)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not shuffle either side (only the final
    // aggregation exchanges)
    val joinPart = plan.split("HashAggregate").last
    assert(joinPart.contains("SortMergeJoin") || joinPart.contains("ShuffledHashJoin"),
      plan.take(800))
    assert(!joinPart.contains("Exchange"),
      s"bucketed join should not shuffle:\n${plan.take(1200)}")

    // results equal the plain (unbucketed) join, group by group
    val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exp = graft.queries.Tables.lineitem(spark, sf)
      .join(graft.queries.Tables.orders(spark, sf),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == exp, s"bucketed join results differ: $got vs $exp")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("q78 gate query: join keys never exchange (bucket layout honored)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = graft.queries.Relational3.entries
        .find(_.name == "q78_bucketed_fact_join").get.fn(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
        !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"join key exchanged despite buckets:\n${plan.take(1500)}")
      assert(df.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q79 gate query: the per-user window runs without an exchange") {
    val df = graft.queries.Relational3.entries
      .find(_.name == "q79_bucketed_asof").get.fn(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(800))
    assert(!plan.contains("Exchange hashpartitioning(user_id"),
      s"user_id exchanged despite buckets:\n${plan.take(1500)}")
    assert(df.count() > 0)
  }
}
