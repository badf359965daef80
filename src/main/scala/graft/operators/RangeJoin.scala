package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Binned interval (range-containment) join: points joined to the
  * intervals that contain them, without the cartesian /
  * broadcast-nested-loop plan Spark falls back to for a bare
  * `pt BETWEEN lo AND hi` condition.
  *
  * Shape: pick a bin width `W >= max interval length`; every interval
  * then overlaps at most two bins, so each interval registers under
  * `floor(lo/W)..floor(hi/W)` (<= 2 rows) and each point under its single
  * `floor(pt/W)`. An EQUALITY join on the bin produces a candidate set a
  * constant factor above the true result, and the residual
  * `pt BETWEEN lo AND hi` filter runs map-side after the join. A point
  * matches a given interval through exactly one bin (its own), so no
  * dedup pass is needed.
  *
  * Scale: both sides hash-partition by bin — shuffle volume is O(points +
  * 2×intervals) and Catalyst still broadcasts the interval side when it is
  * small. Bin cardinality grows with the covered domain, so there is no
  * single hot reducer unless the data itself piles onto one bin (then:
  * shrink W toward the max interval length, or salt the bin). This is the
  * standard rewrite a range-join-aware optimizer applies; expressed
  * manually it works on stock Spark.
  */
object RangeJoin {

  /** @param points    frame with numeric column `ptCol`
    * @param intervals frame with numeric `loCol`/`hiCol` (inclusive)
    * @param binWidth  must be >= the longest interval (checked per-row:
    *                  an interval longer than W would register in > 2 bins
    *                  and silently lose matches — fail loudly instead)
    * @return points x matching intervals (all columns of both frames)
    */
  def binned(
      points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // The width guard lives INSIDE the bin expression (a guard in a
    // dropped side column would be column-pruned away with it).
    val hiBin = when(col(hiCol) - col(loCol) <= binWidth,
      floor(col(hiCol) / binWidth).cast("long"))
      .otherwise(raise_error(concat(
        lit(s"RangeJoin.binned: interval longer than binWidth=$binWidth: "),
        col(loCol), lit(".."), col(hiCol))).cast("long"))
    val binned = intervals
      .withColumn("__rj_bin",
        explode(sequence(floor(col(loCol) / binWidth).cast("long"), hiBin)))
    points
      .withColumn("__rj_bin", floor(col(ptCol) / binWidth).cast("long"))
      .join(binned, "__rj_bin")
      .filter(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__rj_bin")
  }
}
