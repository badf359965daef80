package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scale-safe global running sum — the cumulative-total scan behind
  * token-budget cuts, curriculum prefixes, and quota lines.
  *
  * `sum(w) OVER (ORDER BY k)` funnels every row through one task (the
  * same single-partition failure mode GlobalRank exists for). Same
  * two-pass fix, with a SUM where GlobalRank carries a count:
  *
  *  1. range-partition + sort by the key — partitions hold ordered,
  *     contiguous key ranges;
  *  2. per-partition running sum — a window PARTITIONED by `__pid`
  *     (partition-local, narrow, no global funnel);
  *  3. per-partition totals (O(numPartitions) rows) cumulative-summed
  *     into offsets, broadcast back: global running sum = offset(pid)
  *     + local running sum.
  *
  * Cost honesty: unlike GlobalRank (whose local sequence falls out of
  * `monotonically_increasing_id` arithmetic, no window at all), the
  * local running SUM is a real window PARTITIONED BY `__pid`, and
  * Catalyst cannot see that range partitioning already clusters by
  * `__pid` — it inserts one pid-keyed hash exchange. Each source
  * partition moves as a single block (pid is the partition id), so the
  * extra pass is skew-free and never funnels; the plain global window
  * it replaces moves the ENTIRE dataset through one task.
  *
  * The partitioned pass is MATERIALIZED (lazy MEMORY_AND_DISK persist)
  * and both branches read the cached partitions — the same correctness
  * requirement as GlobalRank (see its scaladoc): two independent range
  * exchanges sample boundaries independently, and under cached-plan
  * compilation the pid join between the branches diverged (round-16
  * RankProbe). One materialized exchange = consistent pids AND the
  * range shuffle runs once.
  *
  * Determinism: exact for integer weights when `key` is a total order
  * (the caller's contract, same as GlobalRank). The running sum
  * INCLUDES the current row (ROWS UNBOUNDED PRECEDING..CURRENT).
  *
  * CACHE LIFECYCLE (ADVICE r16): the internal persist is released by the
  * harness-level `spark.catalog.clearCache()` between gate queries; a
  * long-lived caller should use [[runningSumManaged]], which returns the
  * frame PLUS a cleanup thunk (blocking unpersist) to invoke after the
  * terminal action. */
object GlobalCumSum {

  /** [[runningSum]] plus an explicit release for the internal persist. */
  def runningSumManaged(df: DataFrame, weight: Column, out: String,
      key: Column*): (DataFrame, () => Unit) = {
    val (res, parted) = build(df, weight, out, key: _*)
    (res, () => { try parted.unpersist(blocking = true) catch { case _: Throwable => () }; () })
  }

  def runningSum(df: DataFrame, weight: Column, out: String,
      key: Column*): DataFrame =
    build(df, weight, out, key: _*)._1

  private def build(df: DataFrame, weight: Column, out: String,
      key: Column*): (DataFrame, DataFrame) = {
    val parted = df.repartitionByRange(key: _*).sortWithinPartitions(key: _*)
      .withColumn("__w", weight)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__run", sum(col("__w")).over(
        Window.partitionBy(col("__pid")).orderBy(col("__mid"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__mid")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val offsets = parted.groupBy(col("__pid"))
      .agg(sum(col("__w")).as("__tot"))
      .withColumn("__offset",
        coalesce(sum(col("__tot")).over(
          Window.orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val res = parted.join(broadcast(offsets), "__pid")
      .withColumn(out, col("__run") + col("__offset"))
      .drop("__pid", "__run", "__w", "__offset")
    (res, parted)
  }
}
