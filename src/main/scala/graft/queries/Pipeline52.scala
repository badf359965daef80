package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, sixteenth batch — model-governance readouts over the
  * linear probe: per-group fairness rates (demographic parity, TPR /
  * FPR gaps), the audit a model card cites.
  */
object Pipeline52 {

  val entries: Seq[QEntry] = Seq(

    // Fairness audit: probe predictions (confidence ≥ 0.5 on the q249
    // min-max ppm normalization) sliced by the document's source
    // (vec_id ⋈ doc_id — the corpus's only organic group column).
    // Per group, exact integer rates: selection rate (demographic
    // parity), TPR, FPR, plus each group's gap to the GLOBAL rate in
    // signed ppm. Zero-positive groups report rate 0 over a guarded
    // denominator rather than failing ANSI division. One corpus pass
    // to the group dimension; gaps are a broadcast join against the
    // 1-row global frame.
    QEntry("q330_fairness_audit",
      (s, d) => {
        val scored = Pipeline25.probeScores(s, d)
        val mm = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        val pred = scored.crossJoin(broadcast(mm))
          .withColumn("conf_ppm",
            expr("((s - lo) * 1000000) div (hi - lo)"))
          .withColumn("yhat", (col("conf_ppm") >= 500000L).cast("long"))
          .join(Tables.documents(s, d)
            .select(col("doc_id").as("vec_id"), col("source")), "vec_id")
          .localCheckpoint() // group census + global census share it
        def census(df: org.apache.spark.sql.DataFrame) = df
          .agg(count(lit(1)).as("n"),
            sum(col("y")).as("n_pos"),
            sum(col("yhat")).as("n_sel"),
            sum(col("y") * col("yhat")).as("n_tp"),
            sum((lit(1L) - col("y")) * col("yhat")).as("n_fp"))
          .select(col("n"), col("n_pos"), col("n_sel"),
            expr("n_sel * 1000000 div n").as("sel_ppm"),
            expr("n_tp * 1000000 div greatest(1L, n_pos)").as("tpr_ppm"),
            expr("n_fp * 1000000 div greatest(1L, n - n_pos)")
              .as("fpr_ppm"))
        val global = census(pred)
          .select(col("sel_ppm").as("g_sel"), col("tpr_ppm").as("g_tpr"),
            col("fpr_ppm").as("g_fpr"))
        val groups = pred.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("y")).as("n_pos"),
            sum(col("yhat")).as("n_sel"),
            sum(col("y") * col("yhat")).as("n_tp"),
            sum((lit(1L) - col("y")) * col("yhat")).as("n_fp"))
          .select(col("source"), col("n"), col("n_pos"),
            expr("n_sel * 1000000 div n").as("sel_ppm"),
            expr("n_tp * 1000000 div greatest(1L, n_pos)").as("tpr_ppm"),
            expr("n_fp * 1000000 div greatest(1L, n - n_pos)")
              .as("fpr_ppm"))
        groups.crossJoin(broadcast(global))
          .select(col("source"), col("n"), col("n_pos"),
            col("sel_ppm"), col("tpr_ppm"), col("fpr_ppm"),
            (col("sel_ppm") - col("g_sel")).as("parity_gap_ppm"),
            (col("tpr_ppm") - col("g_tpr")).as("tpr_gap_ppm"),
            (col("fpr_ppm") - col("g_fpr")).as("fpr_gap_ppm"))
          .orderBy(col("source"))
      },
      Some(s"""WITH ${Pipeline25.ProbeSql},
              mm AS (SELECT min(s) AS lo, max(s) AS hi FROM scored),
              pred AS (
                SELECT sc.vec_id, sc.y,
                  CASE WHEN ((sc.s - mm.lo) * 1000000) //
                    (mm.hi - mm.lo) >= 500000 THEN 1 ELSE 0 END AS yhat,
                  d.source
                FROM scored sc
                JOIN documents d ON d.doc_id = sc.vec_id, mm),
              g AS (
                SELECT sum(yhat) * 1000000 // count(*) AS g_sel,
                  sum(y * yhat) * 1000000 // greatest(1, sum(y)) AS g_tpr,
                  sum((1 - y) * yhat) * 1000000 //
                    greatest(1, count(*) - sum(y)) AS g_fpr
                FROM pred),
              gr AS (
                SELECT source, count(*) AS n, sum(y) AS n_pos,
                  sum(yhat) * 1000000 // count(*) AS sel_ppm,
                  sum(y * yhat) * 1000000 // greatest(1, sum(y))
                    AS tpr_ppm,
                  sum((1 - y) * yhat) * 1000000 //
                    greatest(1, count(*) - sum(y)) AS fpr_ppm
                FROM pred GROUP BY 1)
              SELECT gr.source, CAST(gr.n AS BIGINT) AS n,
                CAST(gr.n_pos AS BIGINT) AS n_pos,
                CAST(gr.sel_ppm AS BIGINT) AS sel_ppm,
                CAST(gr.tpr_ppm AS BIGINT) AS tpr_ppm,
                CAST(gr.fpr_ppm AS BIGINT) AS fpr_ppm,
                CAST(gr.sel_ppm - g.g_sel AS BIGINT) AS parity_gap_ppm,
                CAST(gr.tpr_ppm - g.g_tpr AS BIGINT) AS tpr_gap_ppm,
                CAST(gr.fpr_ppm - g.g_fpr AS BIGINT) AS fpr_gap_ppm
              FROM gr, g ORDER BY gr.source"""))
  )
}
