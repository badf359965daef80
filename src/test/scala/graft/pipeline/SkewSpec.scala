package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Salting must change the distribution, never the answer. */
class SkewSpec extends SparkSpec {

  test("twoPhaseSumCount equals direct groupBy") {
    val li = Tables.lineitem(spark, sf)
    val cents = round(col("l_extendedprice") * 100, 0).cast("long")
    val direct = li.groupBy(col("l_suppkey"))
      .agg(sum(cents).as("revenue_cents"), count(lit(1)).as("cnt"))
    val salted = Skew.twoPhaseSumCount(
      li, Seq("l_suppkey"), Seq("revenue_cents" -> cents),
      uniq = col("l_orderkey"), buckets = 8)
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("saltedJoin equals plain join (inner and left)") {
    val orders = Tables.orders(spark, sf)
    val cust = Tables.customer(spark, sf)
      .select(col("c_custkey"), col("c_mktsegment"))
    for (jt <- Seq("inner", "left")) {
      val plain = orders.join(cust, col("o_custkey") === col("c_custkey"), jt)
        .select(col("o_orderkey"), col("c_mktsegment"))
      val salted = Skew.saltedJoin(orders, cust, "o_custkey", "c_custkey",
          uniq = col("o_orderkey"), buckets = 8, joinType = jt)
        .select(col("o_orderkey"), col("c_mktsegment"))
      assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty,
        s"join type $jt diverges")
    }
  }

  test("a hot key actually spreads across salt buckets") {
    import spark.implicits._
    val hot = Seq.tabulate(1000)(i => ("hot", i.toLong)).toDF("k", "row_id")
    val spread = hot.withColumn("_salt", Skew.salt(col("row_id"), 8))
      .groupBy(col("_salt")).count().count()
    assert(spread >= 6, s"1000 rows landed in only $spread of 8 buckets")
  }
}
