package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3, fifth pack: clip-level pooling over the
  * multimodal frame plumbing, MMR result diversification, histogram-
  * quantile accuracy, and session-level conversion features.
  * Conventions unchanged.
  */
object Pipeline17 {

  val entries: Seq[QEntry] = Seq(

    // Clip-level feature pooling over the multimodal frame stage: every
    // 2nd 64-byte frame of each payload yields a 4-dim integer
    // byte-stripe feature (the codec STUB — a real frame encoder plugs
    // into the same mapPartitions loop), mean-pooled per clip by
    // integer div — video → frame features → one clip vector, the
    // embedding-table prep for video retrieval. The fixture payloads
    // are ASCII text bytes, so the oracle replays the stripes via
    // ascii()/substr character arithmetic. Scale: the frame fan-out is
    // an iterator (one frame of memory per payload); pooling is one
    // media-keyed agg.
    QEntry("q213_clip_pooling",
      (s, d) => {
        import s.implicits._
        val cells = graft.pipeline.Multimodal
          .asMediaTable(Tables.documents(s, d))
          .as[graft.pipeline.Multimodal.MediaCell]
        graft.pipeline.Multimodal.frameFeatures(cells, 64, 2)
          .groupBy(col("media_id"))
          .agg(count(lit(1)).as("n_frames"),
            expr("sum(f0) div count(1)").as("p0"),
            expr("sum(f1) div count(1)").as("p1"),
            expr("sum(f2) div count(1)").as("p2"),
            expr("sum(f3) div count(1)").as("p3"))
          .orderBy(col("media_id"))
      },
      Some("""WITH m AS (
                SELECT doc_id AS media_id, text FROM documents),
              fr AS (
                SELECT media_id,
                  unnest([i FOR i IN
                    range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))
                    IF i % 2 = 0]) AS frame_idx,
                  text
                FROM m),
              ch AS (
                SELECT media_id, frame_idx,
                  substr(text, CAST(frame_idx * 64 + 1 AS INT), 64) AS chunk
                FROM fr),
              f AS (
                SELECT media_id, frame_idx,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1) IF (p-1) % 4 = 0],
                    p -> ascii(substr(chunk, p, 1)))) AS f0,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1) IF (p-1) % 4 = 1],
                    p -> ascii(substr(chunk, p, 1)))) AS f1,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1) IF (p-1) % 4 = 2],
                    p -> ascii(substr(chunk, p, 1)))) AS f2,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1) IF (p-1) % 4 = 3],
                    p -> ascii(substr(chunk, p, 1)))) AS f3
                FROM (SELECT media_id, frame_idx, chunk FROM ch
                      WHERE len(chunk) > 0) _)
              SELECT media_id, count(*) AS n_frames,
                CAST(sum(coalesce(f0, 0)) // count(*) AS BIGINT) AS p0,
                CAST(sum(coalesce(f1, 0)) // count(*) AS BIGINT) AS p1,
                CAST(sum(coalesce(f2, 0)) // count(*) AS BIGINT) AS p2,
                CAST(sum(coalesce(f3, 0)) // count(*) AS BIGINT) AS p3
              FROM f GROUP BY media_id ORDER BY media_id""")),

    // MMR diversification: the q36 cosine top-8 per query re-ranked by
    // Maximal Marginal Relevance — 3 greedy picks with λ = 0.7, rank-
    // based relevance rel_bp = (9 − rn)·1250 and candidate-candidate
    // redundancy sim_bp = dot·10⁴ div isqrt(na·nb) (exact integer
    // sqrt, ±1-corrected) — so the whole greedy trajectory is integer-
    // deterministic and the oracle replays each unrolled step. The
    // pairwise stage is 8×8 per query on the top-k frame, never the
    // corpus; each greedy step is one join against the ≤2-row selected
    // set + one per-query argmax window.
    QEntry("q214_mmr_diversify",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val top = graft.pipeline.Similarity.cosineTopK(
            emb.filter(col("vec_id") % 100 === 0)
              .select(col("vec_id").as("q_id"), col("embedding")),
            emb, 8)
          .select(col("q_id"), col("vec_id").as("id"),
            col("rn").cast("long").as("rn"),
            ((lit(9L) - col("rn")) * 1250L).as("rel_bp"))
          .localCheckpoint() // candidates feed vectors, pairs, 3 steps
        val vz = emb.select(col("vec_id").as("id"),
            graft.expressions.functions.quantize_vec(col("embedding"),
              10000.0).as("ce"))
          .withColumn("nb",
            graft.expressions.functions.dot_long(col("ce"), col("ce")))
        val cand = top.join(vz, "id")
        // pairwise candidate sims within each query's top-8
        val pairs = cand.select(col("q_id"), col("id").as("ia"),
            col("ce").as("ca"), col("nb").as("na"))
          .join(cand.select(col("q_id"), col("id").as("ib"),
            col("ce").as("cb"), col("nb").as("nb")), Seq("q_id"))
          .filter(col("ia") =!= col("ib"))
          .select(col("q_id"), col("ia"), col("ib"),
            graft.expressions.functions.dot_long(col("ca"), col("cb"))
              .as("dot"),
            (col("na") * col("nb")).as("prod"))
          .withColumn("s0",
            expr("CAST(floor(sqrt(CAST(prod AS DOUBLE))) AS BIGINT)"))
          .withColumn("rt", expr(
            "CASE WHEN (s0+1)*(s0+1) <= prod THEN s0+1 " +
            "WHEN s0*s0 > prod THEN s0-1 ELSE s0 END"))
          .select(col("q_id"), col("ia"), col("ib"),
            expr("(dot * 10000) div rt").as("sim_bp"))
          .localCheckpoint() // re-read by steps 2 and 3
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("mmr").desc, col("id"))
        val s1 = top.filter(col("rn") === 1)
          .select(col("q_id"), col("id"), col("rn"), lit(0L).as("red_bp"),
            (lit(7L) * col("rel_bp")).as("mmr"), lit(1L).as("pick"))
        def step(sel: org.apache.spark.sql.DataFrame, pick: Long) = {
          val selIds = sel.select(col("q_id"), col("id").as("sid"))
          val red = pairs.join(selIds,
              pairs("q_id") === selIds("q_id") && col("ib") === col("sid"))
            .groupBy(pairs("q_id").as("q_id"), col("ia").as("id"))
            .agg(max(col("sim_bp")).as("red_bp"))
          top.join(sel.select(col("q_id"), col("id").as("taken"))
              .groupBy(col("q_id"))
              .agg(collect_set(col("taken")).as("taken")), "q_id")
            .filter(!array_contains(col("taken"), col("id")))
            .join(red, Seq("q_id", "id"))
            .select(col("q_id"), col("id"), col("rn"), col("red_bp"),
              (lit(7L) * col("rel_bp") - lit(3L) * col("red_bp")).as("mmr"))
            .withColumn("r", row_number().over(w))
            .filter(col("r") === 1)
            .select(col("q_id"), col("id"), col("rn"), col("red_bp"),
              col("mmr"), lit(pick).as("pick"))
        }
        val s2 = step(s1, 2).localCheckpoint()
        val s3 = step(s1.unionByName(s2), 3)
        s1.unionByName(s2).unionByName(s3)
          .orderBy(col("q_id"), col("pick"))
      },
      Some("""WITH qz AS (
                SELECT vec_id AS q_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings WHERE vec_id % 100 = 0),
              cz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS ce
                FROM embeddings),
              scored AS (
                SELECT q_id, vec_id,
                  CAST(list_sum(list_transform(range(len(qe)),
                       i -> qe[i+1] * ce[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(ce, x -> x*x)) AS BIGINT) AS nb
                FROM qz, cz),
              top AS (
                SELECT q_id, vec_id AS id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id)
                    AS BIGINT) AS rn
                FROM scored
                QUALIFY rn <= 8),
              tops AS (
                SELECT q_id, id, rn, (9 - rn) * 1250 AS rel_bp FROM top),
              pr0 AS (
                SELECT a.q_id, a.id AS ia, b.id AS ib,
                  CAST(list_sum(list_transform(range(len(va.ce)),
                    i -> va.ce[i+1] * vb.ce[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(va.ce, x -> x*x)) AS BIGINT)
                    * CAST(list_sum(list_transform(vb.ce, x -> x*x))
                      AS BIGINT) AS prod
                FROM tops a JOIN tops b
                  ON b.q_id = a.q_id AND b.id != a.id
                JOIN cz va ON va.vec_id = a.id
                JOIN cz vb ON vb.vec_id = b.id),
              pr1 AS (
                SELECT q_id, ia, ib, dot, prod,
                  CAST(floor(sqrt(CAST(prod AS DOUBLE))) AS BIGINT) AS s0
                FROM pr0),
              pairs AS (
                SELECT q_id, ia, ib,
                  (dot * 10000) // (CASE WHEN (s0+1)*(s0+1) <= prod
                    THEN s0+1 WHEN s0*s0 > prod THEN s0-1 ELSE s0 END)
                    AS sim_bp
                FROM pr1),
              s1 AS (
                SELECT q_id, id, rn, 0 AS red_bp, 7 * rel_bp AS mmr,
                  1 AS pick
                FROM tops WHERE rn = 1),
              red2 AS (
                SELECT p.q_id, p.ia AS id, max(p.sim_bp) AS red_bp
                FROM pairs p JOIN s1 ON s1.q_id = p.q_id AND s1.id = p.ib
                GROUP BY 1, 2),
              c2 AS (
                SELECT t.q_id, t.id, t.rn, r.red_bp,
                  7 * t.rel_bp - 3 * r.red_bp AS mmr
                FROM tops t JOIN red2 r ON r.q_id = t.q_id AND r.id = t.id
                WHERE t.rn != 1),
              s2 AS (
                SELECT q_id, id, rn, red_bp, mmr, 2 AS pick FROM c2
                QUALIFY row_number() OVER (PARTITION BY q_id
                  ORDER BY mmr DESC, id) = 1),
              sel12 AS (
                SELECT q_id, id FROM s1 UNION ALL SELECT q_id, id FROM s2),
              red3 AS (
                SELECT p.q_id, p.ia AS id, max(p.sim_bp) AS red_bp
                FROM pairs p JOIN sel12 s ON s.q_id = p.q_id AND s.id = p.ib
                GROUP BY 1, 2),
              c3 AS (
                SELECT t.q_id, t.id, t.rn, r.red_bp,
                  7 * t.rel_bp - 3 * r.red_bp AS mmr
                FROM tops t JOIN red3 r ON r.q_id = t.q_id AND r.id = t.id
                WHERE NOT EXISTS (SELECT 1 FROM sel12 s
                  WHERE s.q_id = t.q_id AND s.id = t.id)),
              s3 AS (
                SELECT q_id, id, rn, red_bp, mmr, 3 AS pick FROM c3
                QUALIFY row_number() OVER (PARTITION BY q_id
                  ORDER BY mmr DESC, id) = 1),
              allp AS (
                SELECT * FROM s1 UNION ALL SELECT * FROM s2
                UNION ALL SELECT * FROM s3)
              SELECT q_id, id, rn, CAST(red_bp AS BIGINT) AS red_bp,
                CAST(mmr AS BIGINT) AS mmr, CAST(pick AS BIGINT) AS pick
              FROM allp ORDER BY q_id, pick""")),

    // Histogram-quantile accuracy: the 32-bucket eq-width sketch
    // estimate of p50/p90 order value vs the EXACT quantile, per order
    // priority, with the signed error — the "can I trust the cheap
    // histogram" audit before replacing exact quantiles in a dashboard.
    // Exact side: the (priority, cents) VALUE-dimension pre-aggregation
    // (bounded by the price range, not the corpus) + one dimension
    // window. Estimate side: bucket counts + the same window over 32
    // rows. No corpus-sized window anywhere.
    QEntry("q215_histogram_quantile",
      (s, d) => {
        val o = Tables.load(s, d, "orders")
          .select(col("o_orderpriority").as("prio"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
        val vd = o.groupBy(col("prio"), col("cents"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // value dim: feeds exact + histogram sides
        val tot = vd.groupBy(col("prio")).agg(sum(col("c")).as("n"),
          max(col("cents")).as("mx"))
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prio")).orderBy(col("cents"))
        val exact = vd.withColumn("cum", sum(col("c")).over(wv))
          .join(tot, "prio")
          .select(col("prio"), col("cents"), col("cum"), col("n"))
        def exactQ(q: Int) = exact
          .filter(col("cum") * 100 >= col("n") * q)
          .groupBy(col("prio")).agg(min(col("cents")).as(s"exact_p$q"))
        val bw = tot.select(col("prio"), col("n"), col("mx"),
          expr("(mx div 32) + 1").as("bw"))
        val hist = vd.join(bw, "prio")
          .groupBy(col("prio"), expr("cents div bw").as("b"))
          .agg(sum(col("c")).as("c"), max(col("bw")).as("bw"))
        val wb = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prio")).orderBy(col("b"))
        val hcum = hist.withColumn("cum", sum(col("c")).over(wb))
          .join(tot.select(col("prio"), col("n")), "prio")
        def estQ(q: Int) = hcum
          .filter(col("cum") * 100 >= col("n") * q)
          .groupBy(col("prio"))
          .agg(min(expr("b * bw")).as(s"est_p$q")) // bucket lower edge
        exactQ(50).join(estQ(50), "prio")
          .join(exactQ(90), "prio").join(estQ(90), "prio")
          .select(col("prio"), col("exact_p50"), col("est_p50"),
            (col("est_p50") - col("exact_p50")).as("err_p50"),
            col("exact_p90"), col("est_p90"),
            (col("est_p90") - col("exact_p90")).as("err_p90"))
          .orderBy(col("prio"))
      },
      Some("""WITH o AS (
                SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
              vd AS (
                SELECT prio, cents, count(*) AS c FROM o GROUP BY 1, 2),
              tot AS (
                SELECT prio, sum(c) AS n, max(cents) AS mx,
                  (max(cents) // 32) + 1 AS bw
                FROM vd GROUP BY prio),
              ex AS (
                SELECT prio, cents,
                  sum(c) OVER (PARTITION BY prio ORDER BY cents) AS cum
                FROM vd),
              e50 AS (
                SELECT ex.prio, min(cents) AS exact_p50
                FROM ex JOIN tot ON tot.prio = ex.prio
                WHERE cum * 100 >= n * 50 GROUP BY ex.prio),
              e90 AS (
                SELECT ex.prio, min(cents) AS exact_p90
                FROM ex JOIN tot ON tot.prio = ex.prio
                WHERE cum * 100 >= n * 90 GROUP BY ex.prio),
              hist AS (
                SELECT vd.prio, vd.cents // tot.bw AS b, sum(vd.c) AS c,
                  max(tot.bw) AS bw
                FROM vd JOIN tot ON tot.prio = vd.prio
                GROUP BY 1, 2),
              hc AS (
                SELECT prio, b, bw,
                  sum(c) OVER (PARTITION BY prio ORDER BY b) AS cum
                FROM hist),
              h50 AS (
                SELECT hc.prio, min(b * hc.bw) AS est_p50
                FROM hc JOIN tot ON tot.prio = hc.prio
                WHERE cum * 100 >= n * 50 GROUP BY hc.prio),
              h90 AS (
                SELECT hc.prio, min(b * hc.bw) AS est_p90
                FROM hc JOIN tot ON tot.prio = hc.prio
                WHERE cum * 100 >= n * 90 GROUP BY hc.prio)
              SELECT e50.prio,
                CAST(exact_p50 AS BIGINT) AS exact_p50,
                CAST(est_p50 AS BIGINT) AS est_p50,
                CAST(est_p50 - exact_p50 AS BIGINT) AS err_p50,
                CAST(exact_p90 AS BIGINT) AS exact_p90,
                CAST(est_p90 AS BIGINT) AS est_p90,
                CAST(est_p90 - exact_p90 AS BIGINT) AS err_p90
              FROM e50 JOIN h50 ON h50.prio = e50.prio
              JOIN e90 ON e90.prio = e50.prio
              JOIN h90 ON h90.prio = e50.prio
              ORDER BY e50.prio""")),

    // Session-level conversion features: the q42 sessionization
    // re-derived with event types in tow — per (user, session): length,
    // duration, views/clicks, did it convert (purchase), then rolled to
    // the product-analytics table: conversion rate in bp per session-
    // depth bucket. User-keyed windows only (per-user event counts
    // bound the state — the q42 discipline); the rollup is
    // dimension-sized.
    QEntry("q216_session_conversion",
      (s, d) => {
        val gapUs = 30L * 60 * 1000 * 1000
        val byUser = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val sess = Tables.events(s, d)
          .select(col("user_id"), col("event_id"), col("event_type"),
            expr("ts div 1000").as("us"))
          .withColumn("new_s",
            when(col("us") - lag(col("us"), 1).over(byUser) > gapUs, 1L)
              .otherwise(0L))
          .withColumn("sid", sum(col("new_s")).over(byUser))
          .groupBy(col("user_id"), col("sid"))
          .agg(count(lit(1)).as("depth"),
            (max(col("us")) - min(col("us"))).as("dur_us"),
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("views"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("converted"))
        sess.groupBy(least(col("depth"), lit(5L)).as("depth_bucket"))
          .agg(count(lit(1)).as("n_sessions"),
            sum(col("converted")).as("n_converted"),
            expr("sum(dur_us) div count(1)").as("mean_dur_us"))
          .select(col("depth_bucket"), col("n_sessions"), col("n_converted"),
            expr("(n_converted * 10000) div n_sessions")
              .as("conversion_bp"),
            col("mean_dur_us"))
          .orderBy(col("depth_bucket"))
      },
      Some("""WITH e AS (
                SELECT user_id, event_id, event_type, epoch_us(ts) AS us
                FROM events),
              m AS (
                SELECT *, CASE WHEN us - lag(us) OVER
                    (PARTITION BY user_id ORDER BY us, event_id)
                    > 1800000000 THEN 1 ELSE 0 END AS new_s
                FROM e),
              sd AS (
                SELECT *, sum(new_s) OVER (PARTITION BY user_id
                  ORDER BY us, event_id ROWS UNBOUNDED PRECEDING) AS sid
                FROM m),
              sess AS (
                SELECT user_id, sid, count(*) AS depth,
                  max(us) - min(us) AS dur_us,
                  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS views,
                  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS converted
                FROM sd GROUP BY 1, 2)
              SELECT least(depth, 5) AS depth_bucket,
                count(*) AS n_sessions,
                CAST(sum(converted) AS BIGINT) AS n_converted,
                CAST((sum(converted) * 10000) // count(*) AS BIGINT)
                  AS conversion_bp,
                CAST(sum(dur_us) // count(*) AS BIGINT) AS mean_dur_us
              FROM sess GROUP BY 1 ORDER BY 1"""))
  )
}
