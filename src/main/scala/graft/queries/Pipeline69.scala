package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, seventeenth batch — late-interaction retrieval
  * (MaxSim), seasonal forecast residuals, and the cohort-retention
  * triangle.
  */
object Pipeline69 {

  val entries: Seq[QEntry] = Seq(

    // Late-interaction (ColBERT-style MaxSim) scoring: each 64-dim
    // embedding splits into 4×16-dim sub-vectors (matryoshka slices
    // standing in for per-token vectors — the STUB convention: fake
    // granularity, real MaxSim plumbing); score(q, d) = Σᵢ maxⱼ
    // cos(qᵢ, dⱼ) with every cos rounded to integer micro BEFORE the
    // max/sum (the micro-nat discipline — order-independent, hash-
    // comparable). Scale-adaptive probe panel; top-5 docs per probe.
    // One (probe × corpus × 4) projection computes each query slice's
    // best-matching doc slice via in-row HOFs — no j-explosion.
    QEntry("q370_maxsim_late_interaction",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"),
            graft.pipeline.Similarity.quantize(col("embedding")).as("v"))
          // round 18 (guide §2.5, the q192 pattern): the 1-partition scan
          // checkpoint serialized every maxsim stage; one tiny (id, vec)
          // exchange parallelizes all of them
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .localCheckpoint()
        // md5-hashed panel draw (id-density-free; ADVICE/SCALE r13:
        // a raw `vec_id % stride` panel collapsed to 1 probe on the
        // sparse-id 100x replica and the SCALE row under-measured)
        val stride = math.max(1L, emb.count() / 30L)
        val panelHash =
          conv(substring(md5(col("vec_id").cast("string")), 1, 15),
            16, 10).cast("long")
        // Round 18 (guide §4 + §2.4): the per-vector norm transform, the
        // i-explode, the 16 interpreted subCos lambda cells per pair and
        // the (q_id, vec_id) re-aggregation SHUFFLE all collapse into ONE
        // codegen'd maxsim_micro kernel call per (probe, doc) pair —
        // bit-identical Σᵢ maxⱼ (slice norms re-derived in-kernel as the
        // same sqrt(CAST(Σe² AS DOUBLE)); VecSimSpec differential +
        // re-verified oracle pin it).
        val probes = emb.filter(panelHash % stride === 0)
          .select(col("vec_id").as("q_id"), col("v").as("qv"))
        val maxsim = emb.filter(panelHash % stride =!= 0)
          .join(broadcast(probes), lit(true))
          .select(col("q_id"), col("vec_id"),
            graft.expressions.functions.maxsim_micro(col("qv"), col("v"))
              .as("maxsim_micro"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("maxsim_micro").desc, col("vec_id").asc)
        maxsim.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("rank"), col("vec_id"),
            col("maxsim_micro"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some("""WITH ez AS (
                SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                    AS v
                FROM embeddings),
              st AS (
                SELECT greatest(1, count(*) // 30) AS stride FROM ez),
              px AS (SELECT vec_id AS q_id, v AS qv FROM ez, st
                     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % st.stride = 0),
              cx AS (SELECT vec_id, v FROM ez, st
                     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % st.stride <> 0),
              cells AS (
                SELECT q_id, vec_id, i.i,
                  list_max(list_transform(range(4), j ->
                    CAST(round(
                      CAST(list_sum(list_transform(range(16), t ->
                        qv[i.i * 16 + t + 1] * v[j * 16 + t + 1]))
                        AS DOUBLE) /
                      (sqrt(CAST(list_sum(list_transform(range(16),
                        t -> qv[i.i * 16 + t + 1]
                          * qv[i.i * 16 + t + 1])) AS DOUBLE)) *
                       sqrt(CAST(list_sum(list_transform(range(16),
                        t -> v[j * 16 + t + 1]
                          * v[j * 16 + t + 1])) AS DOUBLE)))
                      * 1000000.0) AS BIGINT))) AS best_micro
                FROM px, cx, (SELECT unnest(range(4)) AS i) i),
              ms AS (
                SELECT q_id, vec_id, sum(best_micro) AS maxsim_micro
                FROM cells GROUP BY q_id, vec_id),
              rk AS (
                SELECT q_id, vec_id, maxsim_micro,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY maxsim_micro DESC, vec_id) AS rank
                FROM ms QUALIFY rank <= 5)
              SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id,
                CAST(maxsim_micro AS BIGINT) AS maxsim_micro
              FROM rk
              ORDER BY q_id, rank""")),

    // Seasonal-naive forecast residuals: per (type, day) the same-
    // weekday-last-week count is the forecast (gap-safe lag-7 equi-
    // join on the day dimension, q298's discipline); residual + APE
    // per day, per-type MAPE riding — the forecast-error member of
    // the monitoring family (CUSUM detects breaks, MAD flags spikes,
    // this scores the predictable-seasonality assumption itself).
    QEntry("q371_seasonal_residuals",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // (type, day) dim, both join sides
        val scored = daily
          .join(daily.select(col("event_type"),
            (col("day") + 7L).as("day"), col("cnt").as("fc")),
            Seq("event_type", "day"))
          .select(col("event_type"), col("day"), col("cnt"), col("fc"),
            (col("cnt") - col("fc")).as("resid"),
            expr("abs(cnt - fc) * 10000 div greatest(1L, fc)")
              .as("ape_bp"))
          .localCheckpoint()
        val mape = scored.groupBy(col("event_type"))
          .agg(expr("sum(ape_bp) div count(1)").as("mape_bp"),
            count(lit(1)).as("n_days"))
        scored.join(broadcast(mape), "event_type")
          .select(col("event_type"), col("day"), col("cnt"), col("fc"),
            col("resid"), col("ape_bp"), col("mape_bp"), col("n_days"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              scored AS (
                SELECT a.event_type, a.day, a.cnt, b.cnt AS fc,
                  a.cnt - b.cnt AS resid,
                  abs(a.cnt - b.cnt) * 10000 // greatest(1, b.cnt)
                    AS ape_bp
                FROM daily a JOIN daily b
                  ON b.event_type = a.event_type
                  AND b.day = a.day - 7),
              m AS (
                SELECT event_type, sum(ape_bp) // count(*) AS mape_bp,
                  count(*) AS n_days
                FROM scored GROUP BY event_type)
              SELECT s.event_type, s.day, s.cnt, s.fc, s.resid,
                CAST(s.ape_bp AS BIGINT) AS ape_bp,
                CAST(m.mape_bp AS BIGINT) AS mape_bp,
                CAST(m.n_days AS BIGINT) AS n_days
              FROM scored s JOIN m USING (event_type)
              ORDER BY s.event_type, s.day""")),

    // Cohort retention triangle: users grouped by first-activity week
    // (cohort), per (cohort, weeks-since) the share still active in
    // basis points of the cohort size — the product-analytics staple,
    // built from two keyed aggs on the (user, week) dimension; the
    // triangle itself is cohort² cells, never user-grain.
    QEntry("q372_cohort_retention",
      (s, d) => {
        val uw = Tables.events(s, d)
          .select(col("user_id"),
            expr("ts div 604800000000000").as("wk"))
          .distinct()
          .localCheckpoint() // (user, week) dim
        val first = uw.groupBy(col("user_id"))
          .agg(min(col("wk")).as("cw"))
        val cells = uw.join(first, "user_id")
          .select(col("cw"), (col("wk") - col("cw")).as("since"))
          .groupBy(col("cw"), col("since"))
          .agg(count(lit(1)).as("n_active")) // (user, week) is distinct
          .localCheckpoint()
        val base = cells.filter(col("since") === 0L)
          .select(col("cw"), col("n_active").as("cohort_size"))
        cells.join(broadcast(base), "cw")
          .select(col("cw"), col("since"), col("n_active"),
            col("cohort_size"),
            expr("n_active * 10000 div cohort_size").as("retention_bp"))
          .orderBy(col("cw"), col("since"))
      },
      Some("""WITH uw AS (
                SELECT DISTINCT user_id,
                  epoch_us(ts) * 1000 // 604800000000000 AS wk
                FROM events),
              f AS (
                SELECT user_id, min(wk) AS cw FROM uw GROUP BY user_id),
              cells AS (
                SELECT f.cw, uw.wk - f.cw AS since,
                  count(*) AS n_active
                FROM uw JOIN f USING (user_id)
                GROUP BY f.cw, uw.wk - f.cw),
              base AS (
                SELECT cw, n_active AS cohort_size FROM cells
                WHERE since = 0)
              SELECT c.cw, c.since, c.n_active, b.cohort_size,
                CAST(c.n_active * 10000 // b.cohort_size AS BIGINT)
                  AS retention_bp
              FROM cells c JOIN base b USING (cw)
              ORDER BY c.cw, c.since"""))
  )
}
