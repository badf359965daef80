package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact multi-column COUNT(DISTINCT) without the Expand blow-up.
  *
  * Spark plans `agg(count_distinct(a), count_distinct(b), count(*))` by
  * EXPANDING every input row once per distinct aggregate (plus once for
  * the plain ones): k distinct columns shuffle (k+1) x input rows. At
  * 100 TB that multiplier IS the job cost. The rewrite here runs one
  * two-phase aggregation PER distinct column — pre-aggregate on
  * (keys, value) with map-side partial dedup, count the survivors — and
  * joins the small per-key results. Shuffle volume: sum of per-column
  * distinct rows (each <= input, map-side deduped) instead of
  * (k+1) x input; the final join touches |keys| rows only.
  *
  * Single-distinct queries don't need this (Spark's own two-phase plan is
  * already right); it pays off from the second distinct column on.
  */
object MultiDistinct {

  /** @param keys      grouping columns
    * @param distincts (outputName -> column) exact distinct counts
    * @return one row per key combo: keys ++ distinct counts ++ cnt(*)
    */
  def exact(
      df: DataFrame,
      keys: Seq[String],
      distincts: Seq[(String, String)]): DataFrame = {
    require(distincts.nonEmpty, "need at least one distinct column")
    require(keys.nonEmpty,
      "global (keyless) multi-distinct isn't supported: the per-column " +
        "results would have no join key — aggregate each column separately")
    val keyCols = keys.map(col)
    val base = df.groupBy(keyCols: _*).agg(count(lit(1)).as("cnt"))
    distincts.foldLeft(base) { case (acc, (outName, c)) =>
      // distinct() is the partial-agg dedup stage (map-side combine);
      // NULL values don't count (SQL count(DISTINCT) semantics), and a
      // group whose values are ALL null must still report 0 — hence the
      // not-null filter + left join + coalesce.
      val nd = df.select((keyCols :+ col(c)): _*)
        .filter(col(c).isNotNull)
        .distinct()
        .groupBy(keyCols: _*).agg(count(lit(1)).as(outName))
      // Null-safe (<=>) join: groupBy treats NULL as a real group, and a
      // name-based equi-join would never match it, zeroing its counts.
      val ndR = keys.foldLeft(nd)((d, k) => d.withColumnRenamed(k, s"__nd_$k"))
      val cond = keys.map(k => col(k) <=> col(s"__nd_$k")).reduce(_ && _)
      keys.foldLeft(acc.join(ndR, cond, "left"))((d, k) => d.drop(s"__nd_$k"))
        .withColumn(outName, coalesce(col(outName), lit(0L)))
    }
  }
}
