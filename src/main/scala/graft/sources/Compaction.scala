package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Small-files compaction — the table-maintenance pass every long-lived
  * ingestion layout needs. Streaming sinks, incremental batches, and
  * per-partition writers leave thousands of KB-scale parquet files;
  * at 100 TB that is millions of files, and scan planning (footer
  * reads, split enumeration, NameNode/liststore pressure) starts to
  * dominate query time before a single row is read. Compaction
  * rewrites a directory to ~`targetBytes` files.
  *
  * Sizing uses the SOURCE listing (cheap metadata, no data read), then
  * one `repartition(n)` rewrite — a single all-to-all pass, the price
  * of a balanced layout. Readers see either the old or the new
  * directory (write-to-temp + atomic-ish swap is the caller's deploy
  * concern; this operator owns the rewrite itself). Row fidelity is
  * spec-checked — compaction must never change WHAT the table says,
  * only how many files say it. */
object Compaction {

  /** Total bytes + file count of the data files under `dir`. */
  def layoutStats(spark: SparkSession, dir: String): (Long, Int) = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p).filter(f =>
      f.isFile && !f.getPath.getName.startsWith("_")
        && !f.getPath.getName.startsWith("."))
    (files.map(_.getLen).sum, files.length)
  }

  /** Rewrite `srcDir` (parquet) into `outDir` with ceil(bytes/target)
    * files. Returns (filesBefore, filesAfter). */
  def compact(spark: SparkSession, srcDir: String, outDir: String,
      targetBytes: Long): (Int, Int) = {
    require(targetBytes > 0, s"need a positive target size, got $targetBytes")
    val (bytes, before) = layoutStats(spark, srcDir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(srcDir)
      .repartition(n)
      .write.mode("overwrite").parquet(outDir)
    val (_, after) = layoutStats(spark, outDir)
    (before, after)
  }

  def readBack(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)
}
