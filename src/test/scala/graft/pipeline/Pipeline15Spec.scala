package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q205–q208 pack. */
class Pipeline15Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q205 split: every doc lands in exactly one of 5 populated folds") {
    val out = q("q205_groupsafe_split")
    assert(out.count() === 5) // the sparse edge rule keeps all folds live
    val t = out.agg(sum("n_docs"), sum("n_components")).head()
    assert(t.getLong(0) === 500)
    assert(t.getLong(1) <= t.getLong(0))
    assert(out.filter(col("n_components") > col("n_docs") ||
      col("n_docs") <= 0).count() === 0)
  }

  test("q206 weighted median: bounded by the per-source length range") {
    val lens = graft.queries.Tables.documents(spark, sf)
      .select(col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("len"),
        col("n_chars"))
      .groupBy("source")
      .agg(min("len").as("lo"), max("len").as("hi"),
        sum("n_chars").as("w"))
    val bad = q("q206_weighted_median").join(lens, "source")
      .filter(col("wmedian_len") < col("lo") ||
        col("wmedian_len") > col("hi") || col("tot_w") =!= col("w"))
      .count()
    assert(bad === 0)
  }

  test("q207 Markov: stationary sums to ~1e6, transition count reconciles") {
    val out = q("q207_markov_stationary")
    val t = out.agg(sum("stationary_ppm"), sum("n_transitions")).head()
    assert(t.getLong(0) > 1000000L - 10 && t.getLong(0) <= 1000000L)
    // every user's ordered sequence yields (events − 1) transitions
    val ev = graft.queries.Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(t.getLong(1) === expected)
  }

  test("q208 churn: point-in-time discipline — no post-cutoff user leaks in") {
    val out = q("q208_churn_features")
    assert(out.filter(col("days_since_last") < 0 ||
      !col("churned").isin(0L, 1L) || col("mean_cents") < 0).count() === 0)
    // the row universe is exactly the users active at or before cutoff
    val dayUs = 86400L * 1000000L
    val ev = graft.queries.Tables.events(spark, sf)
      .select(col("user_id"), expr(s"(ts div 1000) div $dayUs").as("day"))
    val cutoff = ev.agg(max("day")).head().getLong(0) - 7
    val expected = ev.filter(col("day") <= cutoff)
      .select("user_id").distinct().count()
    assert(out.count() === expected)
  }
}
