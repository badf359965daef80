package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Dev probe (VERDICT r15 item 5): the fourth scaling decade for the
  * flagship dedup families — run named gate queries against a replica
  * dir (default the ×1000 sf0.1 replica ≈ sf100, 5M docs) and report
  * wall, shuffle read/write, SPILL, and PEAK TASK MEMORY per round, so
  * the SCALE.md decade rows carry memory-ceiling evidence, not just
  * walls.
  *
  * Usage: runMain graft.tools.DecadeProbe <dir> <query> [query ...]
  */
object DecadeProbe {

  private final class Meter extends SparkListener {
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def reset(): Unit = {
      shuffleRead.set(0); shuffleWrite.set(0); peakMem.set(0); spill.set(0)
    }
  }

  /** Cumulative GC wall across all collectors (ms) — the per-round delta
    * makes old-gen debt VISIBLE in the probe line instead of inferred
    * from wall variance (VERDICT r16 item 4). */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfrep1000")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q408_dedup_ladder", "q37_minhash_pairs",
        "q55_dedup_components")
    // GC-debt controls (VERDICT r16 item 4 — q37's 1000x round-2 read
    // 299.8 s vs 159.8 with IDENTICAL shuffle bytes; q449's 100x 95.5 s
    // vs 59.8: old-gen debt from the prior round's churn, not a plan
    // change):
    //  - SPARK_GRAFT_OFFHEAP=<size> puts execution memory (shuffle/
    //    sort/agg buffers — the churn source) in off-heap pages the GC
    //    never scans, so a round's buffer traffic cannot become the
    //    next round's old-gen backlog;
    //  - between rounds the probe runs an explicit full GC (untimed,
    //    after the unpersist sweep): the probe measures the QUERY, not
    //    the allocator backlog a prior measurement left behind. Both
    //    mechanisms + per-round GC-time deltas land in the probe line.
    val offHeap = sys.env.get("SPARK_GRAFT_OFFHEAP")
    val b = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    offHeap.foreach { sz =>
      b.config("spark.memory.offHeap.enabled", "true")
      b.config("spark.memory.offHeap.size", sz)
    }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[decade] offHeap=${offHeap.getOrElse("off")}")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "2").toInt
    for (name <- names; round <- 1 to rounds) {
      meter.reset()
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val gcS = (gcMillis() - gc0) / 1e3
      val gb = 1024.0 * 1024 * 1024
      println(f"[decade] $name round $round: $wall%.1f s | " +
        f"shuffle r/w ${meter.shuffleRead.get / gb}%.2f/" +
        f"${meter.shuffleWrite.get / gb}%.2f GiB | " +
        f"spill ${meter.spill.get / gb}%.2f GiB | " +
        f"peak task mem ${meter.peakMem.get / (1024.0 * 1024)}%.0f MiB | " +
        f"gc $gcS%.1f s")
      try spark.catalog.clearCache() // drop SQL cache ENTRIES, not just blocks
      catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => () }
      // untimed full GC: clear THIS round's allocator backlog so it
      // cannot tax the next round's measurement
      System.gc()
    }
    spark.stop()
  }
}
