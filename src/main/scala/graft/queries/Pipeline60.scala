package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, eighth batch — embedding-space drift: the
  * distribution-shift family (PSI q184, KS q250, chi² q292) gets its
  * vector-space member.
  */
object Pipeline60 {

  val entries: Seq[QEntry] = Seq(

    // Linear-kernel MMD² between two corpus slices (even vs odd
    // labels — the retrain-trigger readout for an embedding pipeline):
    // MMD²_linear = ‖μ_A − μ_B‖², computed exactly on the quantized
    // int64 grid — per-dimension sums from ONE posexplode scan
    // (map-side combined, 64-cell dimension), means by truncating
    // division, per-dim squared contribution and the total riding on
    // every row. The per-dim rows double as the drift ATTRIBUTION
    // (which dimensions moved) — what a monitor pages on. Σ d²
    // ≤ 64·(2e4)² — no overflow at any corpus size.
    QEntry("q346_embedding_drift",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select((col("label") % 2).as("slice"),
            posexplode(graft.pipeline.Similarity.quantize(col("embedding"))))
          .select(col("slice"), col("pos").as("dim"), col("col").as("v"))
        val sums = q.groupBy(col("dim"))
          .agg(
            sum(when(col("slice") === 0, col("v")).otherwise(0L)).as("sa"),
            sum(when(col("slice") === 0, 1L).otherwise(0L)).as("na"),
            sum(when(col("slice") === 1, col("v")).otherwise(0L)).as("sb"),
            sum(when(col("slice") === 1, 1L).otherwise(0L)).as("nb"))
          .select(col("dim").cast("long").as("dim"),
            expr("sa div greatest(1L, na)").as("mean_a_q"),
            expr("sb div greatest(1L, nb)").as("mean_b_q"))
          .withColumn("diff_q", col("mean_a_q") - col("mean_b_q"))
          .withColumn("contrib", col("diff_q") * col("diff_q"))
          .localCheckpoint() // 64-row dim: rows + the total
        val total = sums.agg(sum(col("contrib")).as("mmd2_q"))
        sums.crossJoin(broadcast(total))
          .select(col("dim"), col("mean_a_q"), col("mean_b_q"),
            col("diff_q"), col("contrib"), col("mmd2_q"))
          .orderBy(col("dim"))
      },
      Some("""WITH q AS (
                SELECT label % 2 AS slice, t.i AS dim,
                  CAST(round(CAST(embedding[t.i + 1] AS DOUBLE) * 10000.0)
                    AS BIGINT) AS v
                FROM embeddings,
                  (SELECT unnest(range(64)) AS i) t),
              sums AS (
                SELECT dim,
                  sum(CASE WHEN slice = 0 THEN v ELSE 0 END) AS sa,
                  sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS na,
                  sum(CASE WHEN slice = 1 THEN v ELSE 0 END) AS sb,
                  sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS nb
                FROM q GROUP BY dim),
              m AS (
                SELECT CAST(dim AS BIGINT) AS dim,
                  CAST(sa // greatest(1, na) AS BIGINT) AS mean_a_q,
                  CAST(sb // greatest(1, nb) AS BIGINT) AS mean_b_q
                FROM sums),
              c AS (
                SELECT dim, mean_a_q, mean_b_q,
                  mean_a_q - mean_b_q AS diff_q,
                  (mean_a_q - mean_b_q) * (mean_a_q - mean_b_q)
                    AS contrib
                FROM m),
              t AS (SELECT CAST(sum(contrib) AS BIGINT) AS mmd2_q FROM c)
              SELECT dim, mean_a_q, mean_b_q, diff_q,
                CAST(contrib AS BIGINT) AS contrib, mmd2_q
              FROM c, t
              ORDER BY dim"""))
  )
}
