package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.profile.{Detector, Profiler}
import graft.sources.CsvSource

/** The user-facing entry point — the drop-in replacement for the
  * reference's eight per-type spark-submit scripts
  * (`phone-number-v0.py`, `check_states.py`, `zip-validate.py`, … each
  * run separately per input):
  *
  * {{{
  * spark-submit ... graft.ProfileMain <input.csv|.parquet> <outDir> \
  *   [--types phone,state,boro,zip,lat,long,coords] [--sample N] [--text]
  * }}}
  *
  * One run detects all requested semantic types in one job, classifies
  * every cell of every detected column in one data pass (fused verdict
  * kernels), and writes verdicts partitioned by semType (parquet; plus
  * the reference's text format with `--text`) and a per-(column, type,
  * code) summary. The reference needed 8 jobs × k columns passes.
  */
object ProfileMain {

  case class Args(
      input: String,
      outDir: String,
      types: Seq[String],
      sampleN: Int,
      text: Boolean)

  def parse(argv: Array[String]): Args = {
    // built-ins + anything the embedding application registered through
    // graft.profile.TypeRegistry (the pluggable-type seam)
    val all = graft.profile.TypeRegistry.all.map(_.semType)
    var types = all
    var sampleN = 100
    var text = false
    val pos = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < argv.length) {
      argv(i) match {
        case "--types" => types = argv(i + 1).split(",").toSeq.map(_.trim); i += 2
        case "--sample" => sampleN = argv(i + 1).toInt; i += 2
        case "--text" => text = true; i += 1
        case p => pos += p; i += 1
      }
    }
    require(pos.length == 2, s"usage: ProfileMain <input> <outDir> [--types t1,t2] [--sample N] [--text]")
    val unknown = types.filterNot(all.contains)
    require(unknown.isEmpty, s"unknown types: ${unknown.mkString(",")} (have: ${all.mkString(",")})")
    Args(pos(0), pos(1), types, sampleN, text)
  }

  /** Testable core: profile `input` into `outDir`; returns the verdict
    * DataFrame. */
  def run(spark: SparkSession, a: Args): DataFrame = {
    val df =
      if (a.input.endsWith(".parquet") || a.input.endsWith(".pq"))
        spark.read.parquet(a.input)
      else CsvSource.read(spark, a.input)

    val specs = graft.profile.TypeRegistry.allFused
      .filter(s => a.types.contains(s.semType))
    val detected = Detector.detect(df, specs, a.sampleN)
    println(s"[profile] detected: " + detected.map(d =>
      s"${d.column}:${d.semType}(${d.hits}/${d.sampled})").mkString(", "))

    import spark.implicits._
    val verdicts =
      if (detected.isEmpty)
        Seq.empty[(Long, String, String, Int, String, String)]
          .toDF("rowId", "column", "semType", "code", "raw", "norm")
      else Profiler.verdicts(df.cache(), detected, specs)
    verdicts.write.mode("overwrite")
      .partitionBy("semType").parquet(s"${a.outDir}/verdicts")
    if (a.text) CsvSource.writeVerdictText(verdicts, s"${a.outDir}/text")

    import org.apache.spark.sql.functions._
    verdicts.groupBy(col("column"), col("semType"), col("code"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("column"), col("semType"), col("code"))
      .write.mode("overwrite").parquet(s"${a.outDir}/summary")
    verdicts
  }

  def main(argv: Array[String]): Unit = {
    val a = parse(argv)
    val spark = SparkSession.builder()
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, a)
    spark.stop()
  }
}
