package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Microbench (dev tooling): GlobalCumSum's two-pass running sum vs
  * the naive `sum() OVER (ORDER BY k)` single-partition window, at a
  * scale where the funnel actually hurts — the operator now underpins
  * q163/q242/q247/q248/q250/q253/q260, so the claim deserves numbers
  * (SCALE.md records them). Synthetic: N rows, key = a bijective
  * integer mix (uniform, shuffle-heavy), weight = small int.
  *
  * Usage: runMain graft.tools.CumSumBench [nRows]
  */
object CumSumBench {

  private final class Meter extends SparkListener {
    val read = new java.util.concurrent.atomic.AtomicLong
    val write = new java.util.concurrent.atomic.AtomicLong
    val peak = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        peak.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)

    // key: xxhash64 of id — near-unique, uniform, order-destroying
    // (ANSI mode forbids the wrapping multiplicative mix)
    val df = spark.range(n).select(
      xxhash64(col("id")).as("k"),
      (pmod(col("id"), lit(7L)) + 1).as("w"))

    def run(name: String)(body: => Long): Unit = {
      val r0 = meter.read.get; val w0 = meter.write.get
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[cumsum] $name%-22s n=$n wall=$wall%8.1fs " +
        f"shuffleRead=${(meter.read.get - r0) / 1e9}%.2fGB " +
        f"shuffleWrite=${(meter.write.get - w0) / 1e9}%.2fGB " +
        f"peakTaskMem=${meter.peak.get / 1e9}%.2fGB checksum=$out")
    }

    run("two-pass GlobalCumSum") {
      graft.operators.GlobalCumSum.runningSum(df, col("w"), "run", col("k"))
        .agg(sum(col("run") % 1000003L)).head().getLong(0)
    }
    run("naive global window") {
      df.withColumn("run", sum(col("w")).over(
          Window.orderBy(col("k"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .agg(sum(col("run") % 1000003L)).head().getLong(0)
    }
    spark.stop()
  }
}
