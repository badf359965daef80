package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact heavy hitters (keys with frequency strictly above n/k) via the
  * classic two-job shape: a bounded-memory Misra–Gries candidate sweep,
  * then an exact recount of the (few) candidates.
  *
  * Why not a plain `GROUP BY key HAVING count > n/k`? At 100 TB the
  * group-by shuffles EVERY distinct key — billions of groups for a
  * handful of answers. Misra–Gries runs per partition in O(capacity)
  * memory and guarantees every key with global frequency > n/capacity
  * survives in at least one partition's summary (if f(x) > n/cap then
  * some partition has f_p(x) > n_p/cap, and per-partition MG keeps every
  * such key). So with capacity >= k the candidate union is a superset of
  * the true hitters; the recount shuffles only rows matching the
  * broadcast candidate set and the exact counts discard false positives.
  * Shuffle volume drops from O(distinct keys) to O(candidates).
  *
  * This is one of the rare genuinely per-partition-imperative operators —
  * `mapPartitions` is the designed tool, not a demotion (SURVEY.md §2a O2
  * note): the sketch state is a bounded mutable map that Spark SQL
  * aggregation cannot express without shuffling the full key set first.
  */
object HeavyHitters {

  /** Misra–Gries sweep over one partition: at most `cap` counters; when
    * full and a new key arrives, every counter decrements (amortized O(1)
    * per row — each decrement cancels a prior increment). Surviving keys
    * are the partition's candidates. */
  private[operators] def misraGries(cap: Int)(it: Iterator[String]): Iterator[String] = {
    val counters = mutable.HashMap.empty[String, Long]
    it.foreach { x =>
      counters.get(x) match {
        case Some(c) => counters.update(x, c + 1)
        case None if counters.size < cap => counters.update(x, 1L)
        case None =>
          val dead = mutable.ArrayBuffer.empty[String]
          counters.keysIterator.foreach { k =>
            val c = counters(k) - 1
            if (c == 0) dead += k else counters.update(k, c)
          }
          dead.foreach(counters.remove)
      }
    }
    counters.keysIterator
  }

  /** Keys of `key` whose exact count exceeds n/k, with their exact counts.
    * Output: (key string, cnt long), one row per hitter.
    *
    * @param capacity sketch size per partition; must be >= k for the
    *                 superset guarantee (default 4k cuts false positives)
    */
  def exact(df: DataFrame, key: Column, k: Int, capacity: Int = 0): DataFrame = {
    val cap = if (capacity > 0) capacity else 4 * k
    require(cap >= k, s"capacity $cap < k $k breaks the MG superset guarantee")
    val spark = df.sparkSession
    import spark.implicits._
    // localCheckpoint (the repo convention for multi-consumer frames,
    // Dedup.components) materializes the one-column projection once; the
    // sweep, the count and the recount all read the same blocks, and the
    // blocks release with the frame instead of leaking like cache() would
    // across a long session.
    val keyed = df.select(key.cast("string").as("key")).localCheckpoint()
    val candidates = keyed.as[String]
      .mapPartitions(misraGries(cap))
      .toDF("key").distinct()
    val n = keyed.count() // cheap: counts the checkpointed blocks
    // Null-safe (<=>) recount: GROUP BY treats NULL as a real group, and
    // the MG sweep can legitimately keep a null key as a candidate — a
    // plain equi-join would silently drop it even above the threshold.
    keyed.join(
        broadcast(candidates.withColumnRenamed("key", "__cand_key")),
        col("key") <=> col("__cand_key"))
      .groupBy(col("key")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
  }
}
