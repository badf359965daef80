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

  /** Band (self-)join: all pairs of rows whose numeric `valCol` differ
    * by at most `eps` — scalar similarity blocking (numeric near-dup,
    * co-occurrence-in-time), without the O(n²) theta join.
    *
    * Same bin rewrite as [[binned]]: with bins of width `eps`, a
    * qualifying pair is always in the same or adjacent bins, so the
    * LEFT side probes {bin, bin+1} (explode, 2 rows/point) and an
    * equality join + residual |a-b| <= eps filter finds every pair
    * exactly. Same-bin pairs arrive twice (each side probes its own
    * bin) — the `a < b` ordering plus distinct dedups. Shuffle is
    * O(2n) rows keyed by bin; bin cardinality grows with the value
    * domain, skew only if the VALUES pile up (then shrink eps or salt).
    *
    * @param df     (idCol, valCol) — idCol must be unique
    * @return (a_id, b_id, a_val, b_val) with a_id < b_id
    */
  def bandJoin(df: DataFrame, idCol: String, valCol: String, eps: Long): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val bin = floor(col(valCol) / eps).cast("long")
    val probes = df.select(col(idCol).as("a_id"), col(valCol).as("a_val"),
      explode(array(bin, bin + 1)).as("__bj_bin"))
    val owners = df.select(col(idCol).as("b_id"), col(valCol).as("b_val"),
      bin.as("__bj_bin"))
    // A cross-bin pair is found only via the LOWER-bin point's upward
    // probe, whichever id that is — so normalize (least, greatest)
    // AFTER the match rather than filtering a_id < b_id during it
    // (that would lose pairs where the higher id sits in the lower
    // bin). Same-bin pairs match twice and collapse in the distinct.
    probes.join(owners, "__bj_bin")
      .filter(col("a_id") =!= col("b_id") &&
        abs(col("a_val") - col("b_val")) <= eps)
      .select(least(col("a_id"), col("b_id")).as("p_a"),
        greatest(col("a_id"), col("b_id")).as("p_b"),
        when(col("a_id") < col("b_id"), col("a_val")).otherwise(col("b_val")).as("p_av"),
        when(col("a_id") < col("b_id"), col("b_val")).otherwise(col("a_val")).as("p_bv"))
      .select(col("p_a").as("a_id"), col("p_b").as("b_id"),
        col("p_av").as("a_val"), col("p_bv").as("b_val"))
      .distinct()
  }
}
