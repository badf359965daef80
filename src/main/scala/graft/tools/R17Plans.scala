package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Round-17 optimization evidence: writes the formatted physical plan of
  * each named query to `<outDir>/<query>_<tag>.txt` (tag = "before" /
  * "after"), so plan-shape claims in OPTIMIZATION_r17.md are checkable
  * without running Spark.
  *
  * Usage:
  *   sbt "runMain graft.tools.R17Plans <sfDir> <outDir> <tag> <q> [q ...]"
  */
object R17Plans {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag) = args.take(3)
    val names = args.drop(3).toSeq
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names) {
      val txt =
        try graft.SparkEntry.queries(n)(spark, sfDir)
          .queryExecution.explainString(ExplainMode.fromString("formatted"))
        catch { case e: Throwable => s"ERROR building $n: ${e.getMessage}" }
      Files.write(Paths.get(outDir, s"${n}_$tag.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[r17plans] wrote $outDir/${n}_$tag.txt")
      // same inter-query hygiene as Bench so a query's persisted frames
      // don't linger into the next plan build
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
