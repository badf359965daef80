package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, closing pack: the two curve-shaped evals that
  * complete the q247–q249 scalar family — the decile gain/lift chart
  * and ROC curve points. Both ride the shared linear probe and the
  * two-pass GlobalCumSum rank discipline (no corpus sort).
  */
object Pipeline34 {

  // shared with Pipeline25 — the q247-pinned probe and its oracle
  // prefix (single source of truth; no drift possible)
  private def probeScores(s: org.apache.spark.sql.SparkSession,
      d: String) = Pipeline25.probeScores(s, d)
  private val ProbeSql = Pipeline25.ProbeSql

  val entries: Seq[QEntry] = Seq(

    // Gain/lift chart: rank by score descending (two-pass GlobalCumSum
    // on the negated key), fold into 10 rank deciles, report per
    // decile the positives captured, cumulative capture (gain) in bp
    // of all positives, and cumulative lift vs prevalence in ppm — the
    // targeting chart every campaign readout starts from.
    QEntry("q280_lift_chart",
      (s, d) => {
        val ranked = graft.operators.GlobalCumSum.runningSum(
          probeScores(s, d).withColumn("neg", -col("s")),
          lit(1L), "rk", col("neg"), col("vec_id"))
        val tot = ranked.agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
        val dec = ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr("((rk - 1) * 10) div n"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_rows"), sum(col("y")).as("n_pos"),
            max(col("n")).as("n"), max(col("np")).as("np"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("decile")) // 10-row decile dimension
        dec
          .withColumn("cum_pos", sum(col("n_pos")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
          .withColumn("cum_rows", sum(col("n_rows")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
          .select(col("decile"), col("n_rows"), col("n_pos"),
            expr("(cum_pos * 10000) div np").as("cum_gain_bp"),
            expr("(cum_pos * n * 1000000) div (cum_rows * np)")
              .as("cum_lift_ppm"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH $ProbeSql,
              ranked AS (
                SELECT *, row_number() OVER (ORDER BY s DESC, vec_id)
                  AS rk
                FROM scored),
              tot AS (SELECT count(*) AS n, sum(y) AS np FROM scored),
              dec AS (
                SELECT ((rk - 1) * 10) // tot.n AS decile,
                  count(*) AS n_rows, sum(y) AS n_pos,
                  max(tot.n) AS n, max(tot.np) AS np
                FROM ranked, tot GROUP BY 1)
              SELECT CAST(decile AS BIGINT) AS decile,
                CAST(n_rows AS BIGINT) AS n_rows,
                CAST(n_pos AS BIGINT) AS n_pos,
                CAST(sum(n_pos) OVER wc * 10000 // np AS BIGINT)
                  AS cum_gain_bp,
                CAST(sum(n_pos) OVER wc * n * 1000000 //
                  (sum(n_rows) OVER wc * np) AS BIGINT) AS cum_lift_ppm
              FROM dec
              WINDOW wc AS (ORDER BY decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              ORDER BY decile""")),

    // ROC curve points at the 9 inner decile thresholds of the score
    // distribution: TPR/FPR in ppm from the (score) dimension's
    // cumulative positive/negative counts — the curve q247's scalar
    // AUC summarizes, at fixed operating points (threshold = smallest
    // score whose rank-from-top crosses k/10 of the corpus).
    QEntry("q281_roc_points",
      (s, d) => {
        val dim = probeScores(s, d)
          .groupBy(col("s"))
          .agg(sum(col("y")).as("np_s"),
            sum(lit(1L) - col("y")).as("nn_s"))
          .withColumn("neg", -col("s"))
        val cumP = graft.operators.GlobalCumSum
          .runningSum(dim, col("np_s"), "tp", col("neg"))
        val cum = graft.operators.GlobalCumSum
          .runningSum(cumP, col("nn_s"), "fp", col("neg"))
        val tot = dim.agg(sum(col("np_s")).as("np"),
          sum(col("nn_s")).as("nn"))
        val k = s.range(1, 10).select(col("id").as("k"))
        cum.crossJoin(broadcast(tot)).crossJoin(broadcast(k))
          .filter((col("tp") + col("fp")) * 10 >=
            (col("np") + col("nn")) * col("k"))
          .groupBy(col("k"))
          .agg(max(col("np")).as("np"), max(col("nn")).as("nn"),
            min(struct(col("tp") + col("fp"), col("tp"), col("fp")))
              .as("first"))
          .select(col("k"),
            expr("(first.tp * 1000000) div np").as("tpr_ppm"),
            expr("(first.fp * 1000000) div nn").as("fpr_ppm"))
          .orderBy(col("k"))
      },
      Some(s"""WITH $ProbeSql,
              dim AS (
                SELECT s, sum(y) AS np_s, sum(1 - y) AS nn_s
                FROM scored GROUP BY s),
              cum AS (
                SELECT *,
                  sum(np_s) OVER wd AS tp, sum(nn_s) OVER wd AS fp
                FROM dim
                WINDOW wd AS (ORDER BY s DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              tot AS (SELECT sum(np_s) AS np, sum(nn_s) AS nn FROM dim),
              pts AS (
                SELECT k.range AS k, cum.tp, cum.fp, tot.np, tot.nn,
                  row_number() OVER (PARTITION BY k.range
                    ORDER BY cum.tp + cum.fp) AS rn
                FROM cum, tot, range(1, 10) k
                WHERE (cum.tp + cum.fp) * 10 >= (tot.np + tot.nn) * k.range)
              SELECT CAST(k AS BIGINT) AS k,
                CAST((tp * 1000000) // np AS BIGINT) AS tpr_ppm,
                CAST((fp * 1000000) // nn AS BIGINT) AS fpr_ppm
              FROM pts WHERE rn = 1 ORDER BY k"""))
  )
}
