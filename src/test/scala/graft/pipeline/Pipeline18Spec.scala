package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q217–q220 pack. */
class Pipeline18Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q217 cardinality: exact side equals the real join size") {
    val real = graft.queries.Tables.load(spark, sf, "lineitem")
      .join(graft.queries.Tables.load(spark, sf, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    val row = q("q217_join_cardinality").head()
    assert(row.getAs[Long]("exact_rows") === real)
    // the 8-bucket estimate should land within ±25% on this join shape
    assert(math.abs(row.getAs[Long]("err_bp")) < 2500,
      s"estimate drifted: err_bp=${row.getAs[Long]("err_bp")}")
  }

  test("q218 IVM: merged partials equal the from-scratch recompute") {
    // the oracle asserts this cross-engine; assert it in-engine too so a
    // partial-split refactor can't silently change the merge semantics
    val recompute = graft.queries.Tables.events(spark, sf)
      .select(col("event_type"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("cents").as("sum_cents"))
      .select(col("event_type"), col("n"), col("sum_cents"),
        expr("sum_cents div n").as("mean_cents"))
    assert(q("q218_ivm_merge").exceptAll(recompute).count() === 0)
  }

  test("q219 equi-depth: boundaries monotone, depths within dup slack") {
    val out = q("q219_equidepth_histogram")
    assert(out.count() === 40) // 5 priorities × 8 boundaries
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("prio").orderBy("b")
    val nonMono = out
      .withColumn("prev", lag(col("boundary"), 1).over(w))
      .filter(col("prev").isNotNull && col("boundary") < col("prev"))
      .count()
    assert(nonMono === 0)
    // the 8th boundary is the max value per priority
    val mx = graft.queries.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("prio").agg(max("cents").as("mx"))
    assert(out.filter(col("b") === 8).join(mx, "prio")
      .filter(col("boundary") =!= col("mx")).count() === 0)
  }

  test("q220 erasure: totals reconcile and the flag rule is exact") {
    val out = q("q220_gdpr_erasure")
    val ev = graft.queries.Tables.events(spark, sf)
    val flagged = ev.filter(col("user_id") % 37 === 0).count()
    val t = out.agg(sum("n_erased"), sum("n_remaining")).head()
    assert(t.getLong(0) === flagged)
    assert(t.getLong(0) + t.getLong(1) === ev.count())
  }
}
