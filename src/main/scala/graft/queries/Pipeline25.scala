package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 session-4, fifth pack: the model-eval quartet a training
  * pipeline runs on its own by-products — exact tie-aware ROC AUC,
  * tie-aware average precision, calibration (reliability bins + ECE),
  * and a two-sample Kolmogorov–Smirnov drift test. The classifier
  * under eval is a one-pass integer linear probe (difference of
  * label-centroid means over quantized embeddings) so the whole chain
  * — train, score, eval — is deterministic integer arithmetic both
  * engines replay exactly. All ranking statistics ride the
  * (score, label) DIMENSION with two-pass GlobalCumSum — no corpus
  * sort, no single-task rank funnel (the q114/q119/q242 discipline).
  */
object Pipeline25 {

  /** Linear-probe scores: y = (label == 0), s = <qe, w> with
    * w = int-mean(pos dims) − int-mean(neg dims). One corpus pass to
    * the 64-row dim frame, one broadcast-dim join back. */
  private[queries] def probeScores(s: SparkSession, d: String): DataFrame = {
    val qz = Tables.embeddings(s, d)
      .select(col("vec_id"),
        (col("label") === 0).cast("long").as("y"),
        graft.pipeline.Similarity.quantize(col("embedding")).as("qe"))
    val dims = qz
      .select(col("y"), posexplode(col("qe")).as(Seq("i", "v")))
      .groupBy(col("i"))
      .agg(
        expr("sum(CASE WHEN y = 1 THEN v ELSE 0 END) div " +
          "sum(CASE WHEN y = 1 THEN 1 ELSE 0 END)").as("mp"),
        expr("sum(CASE WHEN y = 0 THEN v ELSE 0 END) div " +
          "sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)").as("mn"))
      .select(col("i"), (col("mp") - col("mn")).as("w"))
    qz.select(col("vec_id"), col("y"),
        posexplode(col("qe")).as(Seq("i", "v")))
      .join(broadcast(dims), "i")
      .groupBy(col("vec_id"), col("y"))
      .agg(sum(col("v") * col("w")).as("s"))
  }

  /** The probe's oracle prefix, shared by q247–q249. */
  private[queries] val ProbeSql =
    """qz AS (
        SELECT vec_id,
          CASE WHEN label = 0 THEN 1 ELSE 0 END AS y,
          list_transform(embedding, v -> CAST(round(
            CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
        FROM embeddings),
      dims AS (
        SELECT i,
          sum(CASE WHEN y = 1 THEN qe[i+1] ELSE 0 END) //
            sum(CASE WHEN y = 1 THEN 1 ELSE 0 END) -
          (sum(CASE WHEN y = 0 THEN qe[i+1] ELSE 0 END) //
            sum(CASE WHEN y = 0 THEN 1 ELSE 0 END)) AS w
        FROM qz, range(64) r(i) GROUP BY i),
      scored AS (
        SELECT qz.vec_id, qz.y, sum(qe[i+1] * dims.w) AS s
        FROM qz, range(64) r(i) JOIN dims USING (i)
        GROUP BY qz.vec_id, qz.y)"""

  val entries: Seq[QEntry] = Seq(

    // Exact tie-aware ROC AUC of the linear probe via the rank-sum
    // (Mann–Whitney) identity on the (score) dimension: per-score
    // blocks carry (n_pos, n_neg); twice-the-average-rank of a block is
    // the INTEGER 2·cum_before + size + 1, so the tie-corrected U
    // statistic is exact integer arithmetic — no per-row rank, no sort
    // of the corpus (GlobalCumSum provides the block prefix totals).
    QEntry("q247_auc_probe",
      (s, d) => {
        graft.pipeline.Stats
          .aucU2(probeScores(s, d), col("s"), col("y"))
          .select(col("np"), col("nn"),
            expr("((u2 - np * (np + 1)) * 1000000) div " +
              "(2 * np * nn)").as("auc_ppm"))
      },
      Some(s"""WITH $ProbeSql,
              dim AS (
                SELECT s, sum(y) AS np_s, sum(1 - y) AS nn_s
                FROM scored GROUP BY s),
              cum AS (
                SELECT *, sum(np_s + nn_s) OVER (ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cum
                FROM dim),
              tot AS (
                SELECT sum(np_s) AS np, sum(nn_s) AS nn FROM dim)
              SELECT CAST(tot.np AS BIGINT) AS np,
                CAST(tot.nn AS BIGINT) AS nn,
                CAST(((sum(np_s * (2 * (cum - np_s - nn_s) + np_s +
                  nn_s + 1)) - max(tot.np) * (max(tot.np) + 1)) *
                  1000000) // (2 * max(tot.np) * max(tot.nn)) AS BIGINT)
                  AS auc_ppm
              FROM cum, tot GROUP BY tot.np, tot.nn""")),

    // Tie-aware average precision (the step-interpolated formulation:
    // AP = sum over descending score blocks of dTP·P(block end) / np)
    // — precision at each block end is exact from the GlobalCumSum
    // prefix totals on the NEGATED score key (descending traversal as
    // an ascending cumsum — GlobalCumSum needs no order variants).
    QEntry("q248_avg_precision",
      (s, d) => {
        val dim = probeScores(s, d)
          .groupBy(col("s"))
          .agg(sum(col("y")).as("np_s"),
            count(lit(1)).as("n_s"))
          .withColumn("neg_s", -col("s"))
        val cumTp = graft.operators.GlobalCumSum
          .runningSum(dim, col("np_s"), "tp", col("neg_s"))
        val cumAll = graft.operators.GlobalCumSum
          .runningSum(cumTp, col("n_s"), "k", col("neg_s"))
        val tot = dim.agg(sum(col("np_s")).as("np"),
          sum(col("n_s")).as("n"))
        cumAll.crossJoin(broadcast(tot))
          .select(col("np"), col("n"),
            (col("np_s") * expr("(tp * 1000000) div k")).as("contrib"))
          .groupBy(col("np"), col("n"))
          .agg(sum(col("contrib")).as("sc"))
          .select(col("np"), col("n"),
            expr("sc div np").as("ap_ppm"),
            expr("(np * 1000000) div n").as("prevalence_ppm"))
      },
      Some(s"""WITH $ProbeSql,
              dim AS (
                SELECT s, sum(y) AS np_s, count(*) AS n_s
                FROM scored GROUP BY s),
              cum AS (
                SELECT *,
                  sum(np_s) OVER (ORDER BY s DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS tp,
                  sum(n_s) OVER (ORDER BY s DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS k
                FROM dim),
              tot AS (SELECT sum(np_s) AS np, sum(n_s) AS n FROM dim)
              SELECT CAST(tot.np AS BIGINT) AS np,
                CAST(tot.n AS BIGINT) AS n,
                CAST(sum(np_s * ((tp * 1000000) // k)) // max(tot.np)
                  AS BIGINT) AS ap_ppm,
                CAST((max(tot.np) * 1000000) // max(tot.n) AS BIGINT)
                  AS prevalence_ppm
              FROM cum, tot GROUP BY tot.np, tot.n""")),

    // Calibration reliability bins + expected calibration error: the
    // probe score min-max normalized to ppm (exact integer ratio),
    // 10 equal-width confidence bins, per-bin accuracy vs mean
    // confidence and the count-weighted |gap| rollup (ECE). The scalar
    // min/max agg replaces any need to sort; bins are a 10-row frame.
    QEntry("q249_calibration_ece",
      (s, d) => {
        val scored = probeScores(s, d)
        val mm = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        val binned = scored.crossJoin(broadcast(mm))
          .withColumn("norm_ppm",
            expr("((s - lo) * 1000000) div (hi - lo)"))
          .withColumn("bin", expr("least(9L, norm_ppm div 100000)"))
        val bins = binned.groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"),
            sum(col("norm_ppm")).as("sum_conf"))
          .select(col("bin"), col("n"), col("n_pos"),
            expr("(n_pos * 1000000) div n").as("acc_ppm"),
            expr("sum_conf div n").as("conf_ppm"))
          .withColumn("gap_ppm", abs(col("acc_ppm") - col("conf_ppm")))
        val ece = bins.agg(
          expr("sum(n * gap_ppm) div sum(n)").as("ece_ppm"))
        bins.crossJoin(broadcast(ece))
          .select(col("bin"), col("n"), col("n_pos"), col("acc_ppm"),
            col("conf_ppm"), col("gap_ppm"), col("ece_ppm"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH $ProbeSql,
              mm AS (SELECT min(s) AS lo, max(s) AS hi FROM scored),
              binned AS (
                SELECT y,
                  ((s - mm.lo) * 1000000) // (mm.hi - mm.lo) AS norm_ppm
                FROM scored, mm),
              bins AS (
                SELECT least(9, norm_ppm // 100000) AS bin,
                  count(*) AS n, sum(y) AS n_pos,
                  (sum(y) * 1000000) // count(*) AS acc_ppm,
                  sum(norm_ppm) // count(*) AS conf_ppm
                FROM binned GROUP BY 1),
              g AS (
                SELECT *, abs(acc_ppm - conf_ppm) AS gap_ppm FROM bins),
              ece AS (
                SELECT sum(n * gap_ppm) // sum(n) AS ece_ppm FROM g)
              SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n,
                CAST(n_pos AS BIGINT) AS n_pos,
                CAST(acc_ppm AS BIGINT) AS acc_ppm,
                CAST(conf_ppm AS BIGINT) AS conf_ppm,
                CAST(gap_ppm AS BIGINT) AS gap_ppm,
                CAST(ece.ece_ppm AS BIGINT) AS ece_ppm
              FROM g, ece ORDER BY bin""")),

    // Two-sample Kolmogorov–Smirnov drift test between the q235 arms'
    // per-user spend distributions: D = max |cdfA - cdfB| evaluated on
    // the merged value dimension with exact integer cross-products
    // (|cumA·nb - cumB·na| — no rational cdfs), argmax reported at the
    // smallest witnessing value. Completes the drift family: PSI
    // (binned), KL/JSD (distributional), KS (nonparametric sup-norm).
    QEntry("q250_ks_drift",
      (s, d) => {
        val users = Tables.events(s, d)
          .select(col("user_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .groupBy(col("user_id"))
          .agg(expr("sum(cents) div 100").as("yd"))
          .withColumn("arm",
            conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 2)
        val dim = users.groupBy(col("yd"))
          .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
        val cumA = graft.operators.GlobalCumSum
          .runningSum(dim, col("ca"), "cuma", col("yd"))
        val cum = graft.operators.GlobalCumSum
          .runningSum(cumA, col("cb"), "cumb", col("yd"))
        val tot = dim.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        cum.crossJoin(broadcast(tot))
          .select(col("na"), col("nb"), col("yd"),
            abs(col("cuma") * col("nb") - col("cumb") * col("na"))
              .as("gap"))
          .orderBy(col("gap").desc, col("yd"))
          .limit(1)
          .select(col("na"), col("nb"), col("yd").as("at_dollars"),
            expr("(gap * 1000000) div (na * nb)").as("d_ppm"))
      },
      Some("""WITH u AS (
                SELECT user_id,
                  sum(CAST(round(value * 100) AS BIGINT)) // 100 AS yd,
                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    ::BIGINT % 2 AS arm
                FROM events GROUP BY user_id),
              dim AS (
                SELECT yd,
                  sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
                  sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
                FROM u GROUP BY yd),
              cum AS (
                SELECT yd,
                  sum(ca) OVER (ORDER BY yd ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cuma,
                  sum(cb) OVER (ORDER BY yd ROWS BETWEEN UNBOUNDED
                    PRECEDING AND CURRENT ROW) AS cumb
                FROM dim),
              tot AS (SELECT sum(ca) AS na, sum(cb) AS nb FROM dim)
              SELECT CAST(tot.na AS BIGINT) AS na,
                CAST(tot.nb AS BIGINT) AS nb,
                CAST(yd AS BIGINT) AS at_dollars,
                CAST((abs(cuma * tot.nb - cumb * tot.na) * 1000000) //
                  (tot.na * tot.nb) AS BIGINT) AS d_ppm
              FROM cum, tot
              ORDER BY abs(cuma * tot.nb - cumb * tot.na) DESC, yd
              LIMIT 1"""))
  )
}
