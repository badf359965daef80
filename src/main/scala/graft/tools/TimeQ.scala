package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: time individual SparkEntry queries with the same noop-write
  * materialization as graft.Bench (count() lets Catalyst prune the very
  * work being measured — memory/BASELINE.md methodology note).
  *
  * Usage: runMain graft.tools.TimeQ <sfDir> <queryName> [queryName ...]
  * Each query runs twice; both times print (first includes planning
  * warm-up, second is the steadier signal).
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val names = args.tail.toSeq
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-timeq")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names; round <- 1 to 2) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name round $round: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // same between-query hygiene as Bench: drop the finished round's
      // checkpoint blocks (untimed) so multi-query invocations don't
      // accumulate dead blocks in the block manager
      try spark.catalog.clearCache() // drop SQL cache ENTRIES, not just blocks
      catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => () }
    }
    spark.stop()
  }
}
