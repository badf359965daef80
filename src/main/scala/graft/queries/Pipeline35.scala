package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, model-monitoring trio: Brier score with the
  * Murphy decomposition, the credit-scoring KS separation statistic,
  * and PSI drift of the score distribution between corpus halves —
  * the three checks a deployed scorer is watched with. All ride the
  * shared Pipeline25 probe. Conventions unchanged.
  */
object Pipeline35 {

  private def probeScores(s: org.apache.spark.sql.SparkSession,
      d: String) = Pipeline25.probeScores(s, d)
  private val ProbeSql = Pipeline25.ProbeSql

  /** Min-max normalized probe "probability" in ppm (the q249 mapping,
    * shared by all three queries). */
  private def normed(s: org.apache.spark.sql.SparkSession, d: String) = {
    val scored = probeScores(s, d)
    val mm = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
    scored.crossJoin(broadcast(mm))
      .withColumn("p_ppm", expr("((s - lo) * 1000000) div (hi - lo)"))
  }

  private val NormSql =
    """mm AS (SELECT min(s) AS lo, max(s) AS hi FROM scored),
      normed AS (
        SELECT vec_id, y,
          ((s - mm.lo) * 1000000) // (mm.hi - mm.lo) AS p_ppm
        FROM scored, mm)"""

  val entries: Seq[QEntry] = Seq(

    // Brier score + Murphy decomposition: BS = uncertainty -
    // resolution + reliability, each term exact from the 10 q249 bins
    // (integer micro-ppm² units div n — order-independent sums; the
    // identity is checked to bin-mean rounding in the spec). The
    // proper-score readout that says WHY a scorer is bad: badly
    // calibrated (reliability up) vs uninformative (resolution down).
    QEntry("q282_brier_decomposition",
      (s, d) => {
        val binned = normed(s, d)
          .withColumn("bin", expr("least(9L, p_ppm div 100000)"))
        val bins = binned.groupBy(col("bin"))
          .agg(count(lit(1)).as("n_b"), sum(col("y")).as("pos_b"),
            sum(col("p_ppm")).as("sp"),
            // per-row squared error in ppm^2 div 1e6 to stay in int64:
            // (p - y*1e6)^2 div 1e6  (max 1e6 per row)
            sum(expr("((p_ppm - y * 1000000) * (p_ppm - y * 1000000)) " +
              "div 1000000")).as("se_milli"))
          .localCheckpoint() // 10-row bin frame feeds all terms
        val tot = bins.agg(sum(col("n_b")).as("n"),
          sum(col("pos_b")).as("np"), sum(col("se_milli")).as("se"))
        val terms = bins.crossJoin(broadcast(tot))
          .select(col("n_b"),
            expr("(pos_b * 1000000) div n_b").as("acc_ppm"),
            expr("sp div n_b").as("conf_ppm"),
            expr("(np * 1000000) div n").as("base_ppm"),
            col("n"), col("se"))
          .select(col("n"), col("se"),
            expr("(n_b * (((conf_ppm - acc_ppm) * (conf_ppm - acc_ppm)) " +
              "div 1000000))").as("rel_term"),
            expr("(n_b * (((acc_ppm - base_ppm) * (acc_ppm - base_ppm)) " +
              "div 1000000))").as("res_term"),
            expr("(n_b * (((base_ppm * (1000000 - base_ppm))) " +
              "div 1000000))").as("unc_term"))
          .groupBy(col("n"), col("se"))
          .agg(sum(col("rel_term")).as("sr"), sum(col("res_term")).as("ss"),
            sum(col("unc_term")).as("su"))
        terms.select(col("n"),
          expr("se div n").as("brier_micro"),
          expr("sr div n").as("reliability_micro"),
          expr("ss div n").as("resolution_micro"),
          expr("su div n").as("uncertainty_micro"))
      },
      Some(s"""WITH $ProbeSql,
              $NormSql,
              binned AS (
                SELECT *, least(9, p_ppm // 100000) AS bin FROM normed),
              bins AS (
                SELECT bin, count(*) AS n_b, sum(y) AS pos_b,
                  sum(p_ppm) AS sp,
                  sum(((p_ppm - y * 1000000) * (p_ppm - y * 1000000))
                    // 1000000) AS se_milli
                FROM binned GROUP BY bin),
              tot AS (
                SELECT sum(n_b) AS n, sum(pos_b) AS np,
                  sum(se_milli) AS se
                FROM bins),
              terms AS (
                SELECT tot.n, tot.se,
                  sum(n_b * ((((sp // n_b) - (pos_b * 1000000) // n_b) *
                    ((sp // n_b) - (pos_b * 1000000) // n_b))
                    // 1000000)) AS sr,
                  sum(n_b * (((((pos_b * 1000000) // n_b) -
                    (tot.np * 1000000) // tot.n) *
                    (((pos_b * 1000000) // n_b) -
                    (tot.np * 1000000) // tot.n)) // 1000000)) AS ss,
                  sum(n_b * (((((tot.np * 1000000) // tot.n) *
                    (1000000 - (tot.np * 1000000) // tot.n)))
                    // 1000000)) AS su
                FROM bins, tot GROUP BY tot.n, tot.se)
              SELECT CAST(n AS BIGINT) AS n,
                CAST(se // n AS BIGINT) AS brier_micro,
                CAST(sr // n AS BIGINT) AS reliability_micro,
                CAST(ss // n AS BIGINT) AS resolution_micro,
                CAST(su // n AS BIGINT) AS uncertainty_micro
              FROM terms""")),

    // KS separation statistic of the scorer (the credit-scoring KS —
    // distinct from q250's two-SAMPLE drift test): max |cdf_pos(s) -
    // cdf_neg(s)| over the score dimension with exact integer
    // cross-products, witness score reported. The one-number
    // discrimination summary loan books are governed by.
    QEntry("q283_score_ks",
      (s, d) => {
        val dim = probeScores(s, d)
          .groupBy(col("s"))
          .agg(sum(col("y")).as("np_s"),
            sum(lit(1L) - col("y")).as("nn_s"))
        val cumP = graft.operators.GlobalCumSum
          .runningSum(dim, col("np_s"), "cp", col("s"))
        val cum = graft.operators.GlobalCumSum
          .runningSum(cumP, col("nn_s"), "cn", col("s"))
        val tot = dim.agg(sum(col("np_s")).as("np"),
          sum(col("nn_s")).as("nn"))
        cum.crossJoin(broadcast(tot))
          .select(col("np"), col("nn"), col("s"),
            abs(col("cp") * col("nn") - col("cn") * col("np")).as("gap"))
          .orderBy(col("gap").desc, col("s"))
          .limit(1)
          .select(col("np"), col("nn"), col("s").as("at_score"),
            expr("(gap * 1000000) div (np * nn)").as("ks_ppm"))
      },
      Some(s"""WITH $ProbeSql,
              dim AS (
                SELECT s, sum(y) AS np_s, sum(1 - y) AS nn_s
                FROM scored GROUP BY s),
              cum AS (
                SELECT s,
                  sum(np_s) OVER wa AS cp, sum(nn_s) OVER wa AS cn
                FROM dim
                WINDOW wa AS (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
              tot AS (SELECT sum(np_s) AS np, sum(nn_s) AS nn FROM dim)
              SELECT CAST(tot.np AS BIGINT) AS np,
                CAST(tot.nn AS BIGINT) AS nn,
                CAST(s AS BIGINT) AS at_score,
                CAST((abs(cp * tot.nn - cn * tot.np) * 1000000) //
                  (tot.np * tot.nn) AS BIGINT) AS ks_ppm
              FROM cum, tot
              ORDER BY abs(cp * tot.nn - cn * tot.np) DESC, s
              LIMIT 1""")),

    // PSI drift of the score distribution between corpus halves
    // (vec_id parity = the train/serve split simulation): 10 q249
    // bins, PSI = sum (pa - pb)·ln(pa/pb) with shares in ppm, logs
    // rounded to micro-nats from exact ratios (q184's metric applied
    // to the MODEL's output — the deployed-scorer drift alarm).
    // Laplace +1 smoothing keeps empty bins finite.
    QEntry("q284_score_psi",
      (s, d) => {
        val binned = normed(s, d)
          .withColumn("bin", expr("least(9L, p_ppm div 100000)"))
          .withColumn("half", pmod(col("vec_id"), lit(2L)))
        // Explicit 10-row bin dimension: groupBy sees OBSERVED bins only,
        // and the +1/+10 Laplace form assumes all 10 materialize — a bin
        // empty in both halves would otherwise drop out and the smoothed
        // shares would no longer sum to ~1e6 (standard-form divergence).
        val observed = binned.groupBy(col("bin"))
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("cb"))
        val cells = s.range(10).select(col("id").as("bin"))
          .join(observed, Seq("bin"), "left")
          .select(col("bin"), coalesce(col("ca"), lit(0L)).as("ca"),
            coalesce(col("cb"), lit(0L)).as("cb"))
        val tot = cells.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        cells.crossJoin(broadcast(tot))
          .select(col("bin"), col("ca"), col("cb"),
            expr("((ca + 1) * 1000000) div (na + 10)").as("pa_ppm"),
            expr("((cb + 1) * 1000000) div (nb + 10)").as("pb_ppm"))
          .withColumn("term_milli", expr(
            "((pa_ppm - pb_ppm) * CAST(round(ln(CAST(pa_ppm AS DOUBLE) " +
              "/ pb_ppm) * 1e6) AS BIGINT)) div 1000000000"))
          .select(col("bin"), col("ca"), col("cb"), col("pa_ppm"),
            col("pb_ppm"), col("term_milli"))
          .withColumn("psi_milli",
            sum(col("term_milli")).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(lit(1))))
          .orderBy(col("bin"))
      },
      Some(s"""WITH $ProbeSql,
              $NormSql,
              binned AS (
                SELECT *, least(9, p_ppm // 100000) AS bin,
                  vec_id % 2 AS half
                FROM normed),
              observed AS (
                SELECT bin,
                  sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS cb
                FROM binned GROUP BY bin),
              cells AS (
                SELECT d.bin, coalesce(o.ca, 0) AS ca,
                  coalesce(o.cb, 0) AS cb
                FROM range(10) AS d(bin)
                LEFT JOIN observed o ON o.bin = d.bin),
              tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM cells),
              t AS (
                SELECT bin, ca, cb,
                  ((ca + 1) * 1000000) // (tot.na + 10) AS pa_ppm,
                  ((cb + 1) * 1000000) // (tot.nb + 10) AS pb_ppm
                FROM cells, tot),
              tm AS (
                SELECT *, ((pa_ppm - pb_ppm) *
                  CAST(round(ln(CAST(pa_ppm AS DOUBLE) / pb_ppm) * 1e6)
                    AS BIGINT)) // 1000000000 AS term_milli
                FROM t),
              ps AS (SELECT sum(term_milli) AS psi FROM tm)
              SELECT CAST(bin AS BIGINT) AS bin, CAST(ca AS BIGINT)
                  AS ca,
                CAST(cb AS BIGINT) AS cb,
                CAST(pa_ppm AS BIGINT) AS pa_ppm,
                CAST(pb_ppm AS BIGINT) AS pb_ppm,
                CAST(term_milli AS BIGINT) AS term_milli,
                CAST(ps.psi AS BIGINT) AS psi_milli
              FROM tm, ps ORDER BY bin"""))
  )
}
