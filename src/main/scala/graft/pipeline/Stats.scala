package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared statistical kernels behind the session-4 monitoring/eval
  * queries (q236 Kaplan–Meier, q240 CUSUM, q247 AUC, q259 skyline).
  * Factored so the gate queries and the randomized differential spec
  * (Session4FuzzSpec) exercise the SAME code: each kernel here is
  * fuzz-tested against its brute-force/sequential definition on
  * seeded random data, and oracle-pinned through the queries.
  *
  * All kernels keep the suite's disciplines: integer fixed point
  * across aggregation boundaries, ordered windows only over bounded
  * dimensions — and the bound is now GUARDED, not just documented:
  * [[boundedDim]]/[[boundedDimPerKey]] fail fast with the measured
  * cardinality (the `ngramJaccardPairs` maxPosting pattern) instead of
  * letting a corpus-grain misuse funnel everything through one
  * WindowExec task whose only symptom is a log warning.
  */
object Stats {

  /** Cardinality fail-fast for an UNPARTITIONED ordered window's input:
    * localCheckpoints the dimension frame (the guard's count and the
    * window then share one materialization — on a cluster this is
    * persist()/checkpoint()) and refuses to proceed past `maxRows`.
    * A single WindowExec task sorts the whole frame, so the cap is the
    * largest frame one task should ever hold.
    *
    * EAGER: this runs a Spark job (checkpoint + count) at
    * plan-construction time — building a [[skyline2d]]/[[kmLogSurvival]]
    * plan executes the guard immediately, like `ngramJaccardPairs`'s
    * maxPosting census. For plan-only composition (no guard job, no
    * checkpoint), pass `maxRows = Long.MaxValue`, which short-circuits
    * and returns the frame untouched. */
  def boundedDim(dim: DataFrame, what: String,
      maxRows: Long = 1000000L): DataFrame = {
    if (maxRows == Long.MaxValue) return dim
    val d = dim.localCheckpoint()
    val n = d.count()
    require(n <= maxRows,
      s"$what: unpartitioned ordered window over $n rows, past the cap " +
        s"$maxRows — this frame would sort through a SINGLE task. The " +
        "input is corpus-grain, not a bounded value dimension; reduce to " +
        "a dimension first (groupBy the window key) or raise maxRows if " +
        "the cardinality is genuinely bounded")
    d
  }

  /** [[boundedDim]] for PARTITIONED dimension windows: the hazard is the
    * largest per-key group (one WindowExec buffer), so the guard measures
    * max rows per key — one constant-buffer count aggregate, map-side
    * combined — and fails with the worst key's size. The default cap
    * matches [[boundedDim]]'s: the hazard (one task buffering the frame)
    * is identical, so the per-task bound is too. EAGER like
    * [[boundedDim]] (checkpoint + one agg job at construction time);
    * `maxRowsPerKey = Long.MaxValue` short-circuits for plan-only
    * composition. */
  def boundedDimPerKey(dim: DataFrame, keys: Seq[String], what: String,
      maxRowsPerKey: Long = 1000000L): DataFrame = {
    if (maxRowsPerKey == Long.MaxValue) return dim
    val d = dim.localCheckpoint()
    val worst = d.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val biggest = if (worst.isNullAt(0)) 0L else worst.getLong(0)
    require(biggest <= maxRowsPerKey,
      s"$what: largest per-(${keys.mkString(",")}) window group holds " +
        s"$biggest rows, past the cap $maxRowsPerKey — one WindowExec " +
        "task would buffer it whole. The value dimension is not bounded " +
        "for this data; coarsen the value (bucket it) or raise " +
        "maxRowsPerKey if the cardinality is genuinely bounded")
    d
  }

  /** One-sided CUSUM S_t = max(0, S_{t-1} + dev_t) WITHOUT sequential
    * recursion, via the reflection identity S_t = P_t - min(0,
    * min_{j<=t} P_j) with P the prefix sum — two windows over the
    * (partCols, orderCol) frame, fully parallel per partition key.
    * Caller contract: the frame is a bounded dimension (e.g. (type,
    * day)), not corpus rows. Adds `out` to the frame. */
  def cusum(df: DataFrame, partCol: Column, orderCol: Column,
      dev: Column, out: String): DataFrame = {
    val w = Window.partitionBy(partCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__p", sum(dev).over(w))
      .withColumn(out,
        col("__p") - least(lit(0L), min(col("__p")).over(w)))
      .drop("__p")
  }

  /** 2D skyline (minimize `minDim`, maximize `maxDim`) without an
    * all-pairs dominance test: reduce to the (minDim, best maxDim)
    * dimension, then survivors are the rows whose best value exceeds
    * the EXCLUSIVE running max over strictly smaller minDim. The
    * bounded-dimension contract (the q239 saturating-dimension
    * argument) is enforced by [[boundedDim]] — a corpus-grain minDim
    * raises with the measured cardinality instead of single-task
    * sorting. Output: (minDim, `size` = best maxDim,
    * n_rows) — the frontier, minDim ascending. */
  def skyline2d(df: DataFrame, minDim: Column, maxDim: Column,
      maxDimRows: Long = 1000000L): DataFrame = {
    val dim = boundedDim(
      df.select(minDim.as("__x"), maxDim.as("__y"))
        .groupBy(col("__x"))
        .agg(max(col("__y")).as("__best"), count(lit(1)).as("n_rows")),
      "Stats.skyline2d", maxDimRows)
    val w = Window.orderBy(col("__x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    dim
      .withColumn("__rm",
        coalesce(max(col("__best")).over(w), lit(Long.MinValue)))
      .filter(col("__best") > col("__rm"))
      .select(col("__x"), col("__best"), col("n_rows"))
  }

  /** Tie-aware Mann–Whitney U (doubled to stay integral): from a
    * (s, y) scored frame, reduces to per-score blocks and computes
    * sum over blocks of n_pos·(2·cum_before + size + 1) — twice the
    * positive rank sum — via two-pass GlobalCumSum (no corpus sort).
    * Returns a 1-row frame (np, nn, u2) with
    * AUC = (u2 - np(np+1)) / (2·np·nn). */
  def aucU2(scored: DataFrame, s: Column, y: Column): DataFrame = {
    val dim = scored.select(s.as("__s"), y.as("__y"))
      .groupBy(col("__s"))
      .agg(sum(col("__y")).as("np_s"),
        sum(lit(1L) - col("__y")).as("nn_s"))
    val cum = graft.operators.GlobalCumSum
      .runningSum(dim, col("np_s") + col("nn_s"), "cum", col("__s"))
    val tot = dim.agg(sum(col("np_s")).as("np"), sum(col("nn_s")).as("nn"))
    cum.crossJoin(broadcast(tot))
      .select(col("np"), col("nn"),
        (col("np_s") *
          (lit(2L) * (col("cum") - col("np_s") - col("nn_s")) +
            col("np_s") + col("nn_s") + 1)).as("r2"))
      .groupBy(col("np"), col("nn"))
      .agg(sum(col("r2")).as("u2"))
  }

  /** Kaplan–Meier life table in the log domain from a (t, censored)
    * duration frame: per-duration (n_risk, n_events, n_censored) and
    * the cumulative log-survival in integer micro-nats (hazard term
    * round(1e6·ln((r-e)/r)) with an epsilon floor at r = e). The
    * bounded duration dimension (hours/days in an observation window)
    * is enforced by [[boundedDim]]. */
  def kmLogSurvival(durs: DataFrame, t: Column, censored: Column,
      maxDimRows: Long = 1000000L): DataFrame = {
    val table = boundedDim(
      durs.select(t.as("t"), censored.as("__c"))
        .groupBy(col("t"))
        .agg(sum(lit(1L) - col("__c")).as("n_events"),
          sum(col("__c")).as("n_censored")),
      "Stats.kmLogSurvival", maxDimRows)
    val w = Window.orderBy(col("t"))
    val atRisk = table
      .withColumn("__leaving", col("n_events") + col("n_censored"))
      .withColumn("n_risk", sum(col("__leaving")).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
    atRisk
      .withColumn("__term", expr(
        "CASE WHEN n_events > 0 THEN CAST(round(ln(CAST(" +
          "greatest(n_risk - n_events, 1L) AS DOUBLE) / n_risk) " +
          "* 1e6) AS BIGINT) ELSE 0L END"))
      .withColumn("log_surv_unats", sum(col("__term")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("t"), col("n_risk"), col("n_events"),
        col("n_censored"), col("log_surv_unats"))
  }
}
