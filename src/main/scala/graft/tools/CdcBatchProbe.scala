package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (VERDICT r16 item 2 done-bar): drive
  * [[graft.pipeline.Dedup.StreamingCdcDedup]] through N micro-batches on
  * a replica corpus and print per-batch wall + state plan leaves, for
  * both state arms — the "flat per-batch wall" evidence that the tiered
  * in-memory compaction (O(log n) leaves, O(batch·log n) amortized
  * absorb) and the parquet stateDir arm (1 scan leaf) hold as batches
  * accumulate. The r16 append-only list grew one plan leaf per batch;
  * at long-lived stream depths that is a linearly growing analyze/
  * codegen cost per batch even when the data work is O(batch).
  *
  * Usage: runMain graft.tools.CdcBatchProbe <sfDir> [nBatches] [arm]
  *   arm: mem (default) | parquet
  */
object CdcBatchProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfrep100s")
    val n = if (args.length > 1) args(1).toInt else 12
    val arm = if (args.length > 2) args(2) else "mem"
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.queries.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("text"))
    val seed = docs.filter(col("doc_id") % (n + 1) === 0)
    val arrivals = docs.filter(col("doc_id") % (n + 1) =!= 0)
      .withColumn("__b", pmod(col("doc_id"), lit(n.toLong)))
      .localCheckpoint() // batches re-filter this, not the parquet scan
    val stateDir = if (arm == "parquet")
      Some(s"/tmp/cdc_probe_state_${System.nanoTime()}") else None
    val t0 = System.nanoTime()
    val gate = new graft.pipeline.Dedup.StreamingCdcDedup(
      seed, "text", 8, 16, onBatch = df => { df.count(); () },
      stateDir = stateDir)
    println(f"[cdc-probe] arm=$arm seed build ${(System.nanoTime() - t0) / 1e9}%.1f s")
    for (b <- 0 until n) {
      val t = System.nanoTime()
      gate.processBatch(arrivals.filter(col("__b") === b.toLong), b.toLong)
      println(f"[cdc-probe] batch $b: ${(System.nanoTime() - t) / 1e9}%.1f s | leaves ${gate.stateLeaves}")
    }
    spark.stop()
  }
}
