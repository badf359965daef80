package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Stats

/** Dimension-contract windows are GUARDED, not doc-enforced (VERDICT
  * r10 item 3): a corpus-grain misuse of the unpartitioned/partitioned
  * ordered-window helpers raises with the MEASURED cardinality instead
  * of funneling the frame through one WindowExec task. */
class StatsGuardSpec extends SparkSpec {

  test("skyline2d refuses a corpus-grain dimension, reporting its size") {
    // every row a distinct minDim value — the dimension IS the corpus
    val corpusGrain = spark.range(5000)
      .select(col("id").as("x"), pmod(col("id"), lit(7)).as("y"))
    val e = intercept[IllegalArgumentException] {
      Stats.skyline2d(corpusGrain, col("x"), col("y"), maxDimRows = 1000)
    }
    assert(e.getMessage.contains("5000") && e.getMessage.contains("1000"),
      e.getMessage)
    assert(e.getMessage.contains("skyline2d"))
  }

  test("skyline2d under the cap still computes the frontier") {
    val df = spark.range(1000)
      .select(pmod(col("id"), lit(10)).as("x"),
        (pmod(col("id"), lit(10)) * 2 + pmod(col("id"), lit(3))).as("y"))
    val rows = Stats.skyline2d(df, col("x"), col("y"), maxDimRows = 1000)
      .orderBy(col("__x")).collect()
    // y grows with x here, so every x survives the exclusive running max
    assert(rows.length == 10)
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).sorted.toSeq)
  }

  test("kmLogSurvival refuses an unbounded duration dimension") {
    val durs = spark.range(3000)
      .select(col("id").as("t"), lit(0L).as("c"))
    val e = intercept[IllegalArgumentException] {
      Stats.kmLogSurvival(durs, col("t"), col("c"), maxDimRows = 500)
    }
    assert(e.getMessage.contains("3000") && e.getMessage.contains("500"),
      e.getMessage)
  }

  test("boundedDimPerKey measures the WORST key, not the total") {
    // key 0: 400 distinct rows; key 1: 5 — the guard must report 400
    val dim = spark.range(405)
      .select(when(col("id") < 400, 0L).otherwise(1L).as("k"),
        col("id").as("v"))
    val e = intercept[IllegalArgumentException] {
      Stats.boundedDimPerKey(dim, Seq("k"), "spec", maxRowsPerKey = 100)
    }
    assert(e.getMessage.contains("400") && !e.getMessage.contains("405"),
      e.getMessage)
    // under the cap: frame passes through with rows intact
    assert(Stats.boundedDimPerKey(dim, Seq("k"), "spec",
      maxRowsPerKey = 400).count() == 405)
  }
}
