package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** CSV ingestion matching the reference's only source (SURVEY.md O1:
  * `spark.read.csv(path, header, inferSchema)` in all 8 scripts).
  *
  * PERMISSIVE mode subsumes the reference's manual ragged-row guards
  * (`line[col] if len(line) > col else ""`, O10). Schema inference costs
  * one extra pass — at 100 TB prefer an explicit schema or
  * `samplingRatio`; both knobs are surfaced here.
  */
object CsvSource {

  def read(
      spark: SparkSession,
      path: String,
      inferSchema: Boolean = true,
      samplingRatio: Double = 1.0): DataFrame =
    spark.read
      .option("header", "true")
      .option("inferSchema", inferSchema.toString)
      .option("samplingRatio", samplingRatio.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** Text-sink parity with the reference's `saveAsTextFile` outputs
    * (O15): verdicts rendered as `(col,(row,code,norm))` lines. The
    * structured parquet sink is the primary output; this exists for
    * downstream consumers of the reference's format. */
  def writeVerdictText(verdicts: DataFrame, outPath: String): Unit = {
    import org.apache.spark.sql.functions._
    verdicts
      .select(concat(
        lit("("), col("column"),
        lit(",("), col("rowId"), lit(","), col("code"), lit(","),
        col("norm"), lit("))")).as("value"))
      .write.mode("overwrite").text(outPath)
  }
}
