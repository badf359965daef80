package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** End-to-end profiling pipeline: detect semantic columns, then classify
  * every cell of every detected column in ONE pass over the data.
  *
  * Reference lifecycle (SURVEY.md §3): per detected column it re-reads and
  * re-parses the whole CSV (no caching, `phone-number-v0.py:118-123`) and
  * shuffles per column. Here: one scan, one projection producing all
  * verdict structs, one explode — verdicts for k columns cost one pass,
  * and Parquet column pruning keeps the scan limited to detected columns
  * plus the row-key.
  */
object Profiler {

  /** Row identity (reference O3 `rdd.zipWithIndex`, SURVEY.md §7 hard part
    * 1): when a stable key column is supplied we use it directly as rowId
    * (cheap, deterministic, cluster-safe); otherwise fall back to
    * `monotonically_increasing_id` (unique but partition-dependent — fine
    * for profiling, documented divergence). */
  def withRowId(df: DataFrame, keyCol: Option[String]): DataFrame = keyCol match {
    case Some(k) => df.withColumn("rowId", col(k).cast("long"))
    case None    => df.withColumn("rowId", monotonically_increasing_id())
  }

  /** Classify every cell of the detected (column, type) pairs.
    * Output schema: rowId, column, semType, code, raw, norm. */
  def verdicts(
      df: DataFrame,
      detected: Seq[DetectedColumn],
      specs: Seq[Detector.TypeSpec] = Detector.defaultSpecs,
      keyCol: Option[String] = None): DataFrame = {
    val byType = specs.map(s => s.semType -> s.validator).toMap
    // the verdict struct stays NESTED through the explode: extracting
    // code/norm only after the Generate means each validator tree is
    // planned + codegen'd exactly once (getField before the explode would
    // clone the whole when-tree per extracted field).
    val cells = detected.map { d =>
      struct(
        lit(d.column).as("column"),
        lit(d.semType).as("semType"),
        col(d.column).cast("string").as("raw"),
        byType(d.semType)(col(d.column)).as("v"))
    }
    withRowId(df, keyCol)
      .select(col("rowId"), explode(array(cells: _*)).as("cell"))
      .select(col("rowId"), col("cell.column").as("column"),
        col("cell.semType").as("semType"), col("cell.v.code").as("code"),
        col("cell.raw").as("raw"), col("cell.v.norm").as("norm"))
  }

  /** detect + classify + aggregate: per (column, semType, code) counts —
    * the compact profile report. One detection job + one data pass. */
  def profile(
      df: DataFrame,
      specs: Seq[Detector.TypeSpec] = Detector.defaultSpecs,
      sampleN: Int = 100,
      keyCol: Option[String] = None): DataFrame = {
    val detected = Detector.detect(df, specs, sampleN)
    if (detected.isEmpty) {
      df.sparkSession.emptyDataFrame
        .select(lit("").as("column"), lit("").as("semType"),
          lit(0).as("code"), lit(0L).as("n"))
        .limit(0)
    } else {
      verdicts(df, detected, specs, keyCol)
        .groupBy(col("column"), col("semType"), col("code"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("column"), col("semType"), col("code"))
    }
  }
}
