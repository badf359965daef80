package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q209–q212 pack. */
class Pipeline16Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q209 RRF: 5 rows per query, fused score recomputes from the ranks") {
    val out = q("q209_rrf_fusion")
    val perQ = out.groupBy("q_id").agg(count(lit(1)).as("n"))
    assert(perQ.filter(col("n") =!= 5).count() === 0)
    val recompute = expr(
      "CASE WHEN lex_rn > 0 THEN 1000000 div (60 + lex_rn) ELSE 0 END + " +
      "CASE WHEN sem_rn > 0 THEN 1000000 div (60 + sem_rn) ELSE 0 END")
    assert(out.filter(col("rrf_micro") =!= recompute).count() === 0)
    // a rank of 0 means "absent from that arm" — never both absent
    assert(out.filter(col("lex_rn") === 0 && col("sem_rn") === 0)
      .count() === 0)
  }

  test("q210 lateness: totals reconcile, bucket bounds hold") {
    val out = q("q210_late_arrival")
    val totals = out.groupBy("event_type").agg(sum("n").as("n"))
    val expected = graft.queries.Tables.events(spark, sf)
      .groupBy("event_type").agg(count(lit(1)).as("e"))
    assert(totals.join(expected, "event_type")
      .filter(col("n") =!= col("e")).count() === 0)
    val bad = out.filter(
      (col("bucket") === "a_ontime" && col("max_late_us") =!= 0) ||
      (col("bucket") === "b_1min" &&
        (col("max_late_us") <= 0 || col("max_late_us") > 60000000L)) ||
      (col("bucket") === "c_1hour" &&
        (col("max_late_us") <= 60000000L ||
          col("max_late_us") > 3600000000L)) ||
      (col("bucket") === "d_later" && col("max_late_us") <= 3600000000L))
      .count()
    assert(bad === 0)
  }

  test("q211 phrase precision: phrase docs are a subset of AND docs") {
    val out = q("q211_phrase_vs_and")
    assert(out.count() === 5)
    assert(out.filter(col("n_phrase_docs") > col("n_and_docs") ||
      col("precision_bp") > 10000 || col("n_phrase_docs") < 1 ||
      col("n_occurrences") < col("n_phrase_docs")).count() === 0)
  }

  test("q212 sampling table: w = floor(n^(3/4)) exactly, probs sum to ~1") {
    val rows = q("q212_negative_sampling")
      .select("n", "w", "prob_ppm").collect()
    rows.foreach { r =>
      val n = BigInt(r.getLong(0)); val w = BigInt(r.getLong(1))
      assert(w.pow(4) <= n.pow(3), s"w too big for n=$n")
      assert((w + 1).pow(4) > n.pow(3), s"w too small for n=$n")
    }
    val tot = rows.map(_.getLong(2)).sum
    assert(tot > 1000000L - rows.length - 1 && tot <= 1000000L)
  }
}
