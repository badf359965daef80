package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q227–q230 pack. */
class Pipeline20Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q227 sequences: support bounded by the user universe") {
    val users = graft.queries.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val out = q("q227_frequent_sequences")
    assert(out.count() === 10)
    assert(out.filter(col("support") > users ||
      col("support") > col("n_occurrences")).count() === 0)
  }

  test("q229 Benford: digit census covers every order exactly once") {
    val out = q("q229_benford_audit")
    assert(out.count() === 9) // totals >= $1.00 ⇒ first digit 1–9
    val n = graft.queries.Tables.load(spark, sf, "orders").count()
    assert(out.agg(sum("obs")).head().getLong(0) === n)
    assert(out.filter(col("chi_term") < 0 || col("exp") <= 0)
      .count() === 0)
  }

  test("q230 referential audit: clean fixture — zero orphans, totals add") {
    val out = q("q230_referential_audit").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("a_orphan_lineitems") === 0L) // fixture FKs are clean
    val orders = graft.queries.Tables.load(spark, sf, "orders").count()
    val withChildren = out.collect {
      case (m, v) if m.startsWith("c_fanout_") => v
    }.sum
    assert(out("b_childless_orders") + withChildren === orders)
    val li = graft.queries.Tables.load(spark, sf, "lineitem").count()
    val liFromHist = out.collect {
      case (m, v) if m.startsWith("c_fanout_") =>
        m.stripPrefix("c_fanout_").toLong * v
    }.sum
    assert(liFromHist === li)
  }
}
