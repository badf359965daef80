package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, seventh pack: MRR (the last missing ranking
  * metric beside recall/NDCG/AP), K-fold leakage-safe target encoding
  * (the ML feature-engineering op behind categorical features), the
  * effective-sample-size diagnostic for importance weights, and
  * normalized mutual information between an unsupervised clustering
  * and ground-truth labels. Conventions unchanged.
  */
object Pipeline27 {

  val entries: Seq[QEntry] = Seq(

    // Mean reciprocal rank of label retrieval: exact cosine top-10
    // (self excluded) per query vector, reciprocal rank of the FIRST
    // same-label hit in integer micro (1e6 div rank, 0 when no hit in
    // the window), and the corpus MRR. The bounded-broadcast q36
    // search shape; the metric itself is a per-query min + one scalar
    // agg.
    QEntry("q255_label_mrr",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        val topk = graft.pipeline.Similarity
          .cosineTopK(queries,
            emb.select(col("vec_id"), col("embedding")), 11)
          .filter(col("vec_id") =!= col("q_id")) // drop self-hit
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("rn"))
        val reranked = topk
          .withColumn("rank", row_number().over(wq).cast("long"))
          .filter(col("rank") <= 10)
        val labels = emb.select(col("vec_id"), col("label"))
        val firstHit = reranked
          .join(labels.select(col("vec_id").as("q_id"),
            col("label").as("q_lab")), "q_id")
          .join(labels, "vec_id")
          .filter(col("label") === col("q_lab"))
          .groupBy(col("q_id")).agg(min(col("rank")).as("hit_rank"))
        val perQ = queries.select(col("q_id"))
          .join(firstHit, Seq("q_id"), "left")
          .select(col("q_id"),
            coalesce(col("hit_rank"), lit(0L)).as("hit_rank"))
          // ANSI mode: guard the div — hit_rank 0 means "no hit"
          .withColumn("rr_micro",
            when(col("hit_rank") > 0, expr("1000000 div hit_rank"))
              .otherwise(0L))
        val mrr = perQ.agg(
          expr("sum(rr_micro) div count(*)").as("mrr_micro"))
        perQ.crossJoin(broadcast(mrr))
          .orderBy(col("q_id"))
      },
      Some("""WITH qz AS (
                SELECT vec_id, label,
                  list_transform(embedding, v -> CAST(round(
                    CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              sc AS (
                SELECT q.vec_id AS q_id, q.label AS q_lab, c.vec_id,
                  c.label,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                    i -> q.qe[i+1] * c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x))
                    AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x))
                    AS BIGINT) AS nb
                FROM qz q CROSS JOIN qz c
                WHERE q.vec_id % 100 = 0),
              topk AS (
                SELECT q_id, q_lab, vec_id, label, rn FROM (
                  SELECT q_id, q_lab, vec_id, label, row_number() OVER (
                    PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id)
                    AS rn
                  FROM sc) WHERE rn <= 11),
              dropped AS (
                SELECT q_id, q_lab, vec_id, label, row_number() OVER (
                    PARTITION BY q_id ORDER BY rn) AS rank
                FROM topk WHERE vec_id <> q_id),
              fh AS (
                SELECT q_id, min(rank) AS hit_rank
                FROM dropped WHERE label = q_lab AND rank <= 10
                GROUP BY q_id),
              perq AS (
                SELECT q.q_id,
                  coalesce(fh.hit_rank, 0) AS hit_rank,
                  coalesce(1000000 // fh.hit_rank, 0) AS rr_micro
                FROM (SELECT DISTINCT q_id FROM dropped) q
                LEFT JOIN fh USING (q_id)),
              mrr AS (
                SELECT sum(rr_micro) // count(*) AS mrr_micro FROM perq)
              SELECT CAST(q_id AS BIGINT) AS q_id,
                CAST(hit_rank AS BIGINT) AS hit_rank,
                CAST(rr_micro AS BIGINT) AS rr_micro,
                CAST(mrr.mrr_micro AS BIGINT) AS mrr_micro
              FROM perq, mrr ORDER BY q_id""")),

    // K-fold leakage-safe target encoding of order priority: the
    // encoding for (category, fold) is the target mean computed on the
    // OTHER folds only — (sum_cat - sum_fold) div (n_cat - n_fold) —
    // so no row's own target leaks into its feature (the q205/q208
    // leakage discipline applied to feature engineering). Scale shape:
    // one corpus pass to the (cat, fold) partial frame (25 cells);
    // the exclusion arithmetic is pure dimension algebra.
    QEntry("q256_target_encoding",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select(col("o_orderpriority").as("cat"),
            (conv(substring(md5(col("o_orderkey").cast("string")), 1, 8),
              16, 10).cast("long") % 5).as("fold"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("t"))
          .groupBy(col("cat"), col("fold"))
          .agg(count(lit(1)).as("n_f"), sum(col("t")).as("s_f"))
          .localCheckpoint() // 25-cell frame feeds totals + exclusion
        val catTot = cells.groupBy(col("cat"))
          .agg(sum(col("n_f")).as("n_c"), sum(col("s_f")).as("s_c"))
        val prior = cells.agg(
          expr("sum(s_f) div sum(n_f)").as("prior_cents"))
        cells.join(catTot, "cat").crossJoin(broadcast(prior))
          .select(col("cat"), col("fold"), col("n_f"),
            (col("n_c") - col("n_f")).as("n_out"),
            expr("(s_c - s_f) div (n_c - n_f)").as("enc_cents"),
            col("prior_cents"))
          .orderBy(col("cat"), col("fold"))
      },
      Some("""WITH cells AS (
                SELECT o_orderpriority AS cat,
                  ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                    ::BIGINT % 5 AS fold,
                  count(*) AS n_f,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS s_f
                FROM orders GROUP BY 1, 2),
              ct AS (
                SELECT cat, sum(n_f) AS n_c, sum(s_f) AS s_c
                FROM cells GROUP BY cat),
              pr AS (SELECT sum(s_f) // sum(n_f) AS prior_cents
                FROM cells)
              SELECT cells.cat, CAST(cells.fold AS BIGINT) AS fold,
                CAST(cells.n_f AS BIGINT) AS n_f,
                CAST(ct.n_c - cells.n_f AS BIGINT) AS n_out,
                CAST((ct.s_c - cells.s_f) // (ct.n_c - cells.n_f)
                  AS BIGINT) AS enc_cents,
                CAST(pr.prior_cents AS BIGINT) AS prior_cents
              FROM cells JOIN ct USING (cat) CROSS JOIN pr
              ORDER BY cells.cat, cells.fold""")),

    // Effective sample size of importance weights — the diagnostic
    // that tells a rebalancing pipeline whether its weights destroyed
    // the sample (Kish's ESS = (sum w)² / sum w²). Weights here are
    // the uniform-target LANGUAGE-rebalance ratios in ppm (q96/q118's
    // family): w_l = N·1e6 div (k·n_l) — the lang mix is skewed
    // (en-heavy), so the diagnostic is non-trivial, unlike the
    // near-balanced source dim. The two
    // weighted sums are exact integers on the 5-row lang dimension;
    // the single ratio is one double multiply+divide (IEEE-identical
    // both engines) rounded once to micro.
    QEntry("q257_ess_weights",
      (s, d) => {
        val src = Tables.documents(s, d)
          .groupBy(col("lang")).agg(count(lit(1)).as("n_s"))
        val tot = src.agg(sum(col("n_s")).as("n"),
          count(lit(1)).as("k"))
        val w = src.crossJoin(broadcast(tot))
          .withColumn("w_ppm", expr("(n * 1000000) div (k * n_s)"))
        w.agg(max(col("n")).as("n_docs"), max(col("k")).as("n_langs"),
            sum(col("n_s") * col("w_ppm")).as("s1"),
            sum(col("n_s") * col("w_ppm") * col("w_ppm")).as("s2"))
          .select(col("n_docs"), col("n_langs"), col("s1"),
            expr("CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) " +
              "/ CAST(s2 AS DOUBLE) * 1e6) AS BIGINT)").as("ess_micro"),
            expr("CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) " +
              "/ CAST(s2 AS DOUBLE) / n_docs * 1e4) AS BIGINT)")
              .as("ess_bp"))
      },
      Some("""WITH src AS (
                SELECT lang, count(*) AS n_s
                FROM documents GROUP BY lang),
              tot AS (SELECT sum(n_s) AS n, count(*) AS k FROM src),
              w AS (
                SELECT n_s, (tot.n * 1000000) // (tot.k * n_s) AS w_ppm,
                  tot.n, tot.k
                FROM src, tot),
              agg AS (
                SELECT max(n) AS n_docs, max(k) AS n_langs,
                  sum(n_s * w_ppm) AS s1,
                  sum(n_s * w_ppm * w_ppm) AS s2
                FROM w)
              SELECT CAST(n_docs AS BIGINT) AS n_docs,
                CAST(n_langs AS BIGINT) AS n_langs,
                CAST(s1 AS BIGINT) AS s1,
                CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                  CAST(s2 AS DOUBLE) * 1e6) AS BIGINT) AS ess_micro,
                CAST(round(CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
                  CAST(s2 AS DOUBLE) / n_docs * 1e4) AS BIGINT) AS ess_bp
              FROM agg""")),

    // Normalized mutual information between the q47 IVF seed
    // clustering (16 seed centroids, argmax integer-dot assignment)
    // and the ground-truth labels — the unsupervised-clustering
    // quality eval (NMI = 2·MI/(H(C)+H(L)) in ppm), in the q228
    // micro-nat discipline: every log term rounded from exact integer
    // count ratios, every sum order-independent. Scale shape: the
    // assignment is the pinned q47 shape (centroid broadcast); the
    // NMI lives on the 16×10 contingency dimension.
    QEntry("q258_cluster_nmi",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        // the q47 assignment shape inlined: 16 seed centroids
        // broadcast, argmax dot/sqrt(|centroid|) with the same
        // (cscore, -cid) tie order the oracle's row_number replays
        val dotQ = (a: org.apache.spark.sql.Column,
            b: org.apache.spark.sql.Column) =>
          graft.expressions.functions.dot_long(a, b)
        val cent = emb.orderBy(col("vec_id")).limit(16)
          .select(col("vec_id").as("cid"),
            graft.pipeline.Similarity.quantize(col("embedding"))
              .as("cente"))
          .withColumn("nc", dotQ(col("cente"), col("cente")))
        val assigned = emb
          .select(col("vec_id"),
            graft.pipeline.Similarity.quantize(col("embedding"))
              .as("ce"))
          .join(broadcast(cent), lit(true))
          .withColumn("cscore",
            dotQ(col("ce"), col("cente")).cast("double") /
              sqrt(col("nc")))
          .groupBy(col("vec_id"))
          .agg(max_by(col("cid"),
            struct(col("cscore"), -col("cid"))).as("cluster"))
        val joint = assigned
          .join(emb.select(col("vec_id"), col("label")), "vec_id")
          .groupBy(col("cluster"), col("label"))
          .agg(count(lit(1)).as("cxy"))
          .localCheckpoint() // 16x10 contingency dim
        val mc = joint.groupBy(col("cluster")).agg(sum(col("cxy")).as("cx"))
        val ml = joint.groupBy(col("label")).agg(sum(col("cxy")).as("cy"))
        val tot = joint.agg(sum(col("cxy")).as("n"))
        val mi = joint.join(mc, "cluster").join(ml, "label")
          .crossJoin(broadcast(tot))
          .select(col("cxy"), col("n"),
            expr("CAST(round(ln(CAST(cxy AS DOUBLE) * n / " +
              "(CAST(cx AS DOUBLE) * cy)) * 1e6) AS BIGINT)")
              .as("lr"))
          .agg(max(col("n")).as("n"),
            expr("sum(cxy * lr)").as("num"))
          .select(col("n"), expr("num div n").as("mi_unats"))
        val hc = mc.crossJoin(broadcast(tot))
          .select((col("cx") * expr("CAST(round(ln(CAST(n AS DOUBLE) " +
            "/ cx) * 1e6) AS BIGINT)")).as("t"), col("n"))
          .agg(expr("sum(t) div max(n)").as("hc_unats"))
        val hl = ml.crossJoin(broadcast(tot))
          .select((col("cy") * expr("CAST(round(ln(CAST(n AS DOUBLE) " +
            "/ cy) * 1e6) AS BIGINT)")).as("t"), col("n"))
          .agg(expr("sum(t) div max(n)").as("hl_unats"))
        mi.crossJoin(broadcast(hc)).crossJoin(broadcast(hl))
          .select(col("n"), col("mi_unats"), col("hc_unats"),
            col("hl_unats"),
            expr("(2 * mi_unats * 1000000) div (hc_unats + hl_unats)")
              .as("nmi_ppm"))
      },
      Some("""WITH qz AS (
                SELECT vec_id, label,
                  list_transform(embedding, v -> CAST(round(
                    CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              cseeds AS (
                SELECT vec_id AS cid_src
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id
                  LIMIT 16)),
              cent AS (
                SELECT cs.cid_src AS cid, qz.qe AS cente,
                  CAST(list_sum(list_transform(qz.qe, x -> x*x))
                    AS BIGINT) AS nc
                FROM cseeds cs JOIN qz ON qz.vec_id = cs.cid_src),
              cfit AS (
                SELECT qz.vec_id, qz.label, cent.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                    i -> qz.qe[i+1] * cent.cente[i+1])) AS BIGINT)
                    / sqrt(cent.nc) AS cscore
                FROM qz CROSS JOIN cent),
              assigned AS (
                SELECT vec_id, label, cid AS cluster FROM (
                  SELECT vec_id, label, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS arn
                  FROM cfit) WHERE arn = 1),
              joint AS (
                SELECT cluster, label, count(*) AS cxy
                FROM assigned GROUP BY 1, 2),
              mc AS (SELECT cluster, sum(cxy) AS cx FROM joint
                GROUP BY 1),
              ml AS (SELECT label, sum(cxy) AS cy FROM joint
                GROUP BY 1),
              tot AS (SELECT sum(cxy) AS n FROM joint),
              mi AS (
                SELECT max(tot.n) AS n,
                  sum(cxy * CAST(round(ln(CAST(cxy AS DOUBLE) * tot.n /
                    (CAST(mc.cx AS DOUBLE) * ml.cy)) * 1e6) AS BIGINT))
                    // max(tot.n) AS mi_unats
                FROM joint JOIN mc USING (cluster) JOIN ml USING (label)
                CROSS JOIN tot),
              hc AS (
                SELECT sum(cx * CAST(round(ln(CAST(tot.n AS DOUBLE) /
                  cx) * 1e6) AS BIGINT)) // max(tot.n) AS hc_unats
                FROM mc, tot),
              hl AS (
                SELECT sum(cy * CAST(round(ln(CAST(tot.n AS DOUBLE) /
                  cy) * 1e6) AS BIGINT)) // max(tot.n) AS hl_unats
                FROM ml, tot)
              SELECT CAST(mi.n AS BIGINT) AS n,
                CAST(mi.mi_unats AS BIGINT) AS mi_unats,
                CAST(hc.hc_unats AS BIGINT) AS hc_unats,
                CAST(hl.hl_unats AS BIGINT) AS hl_unats,
                CAST((2 * mi.mi_unats * 1000000) //
                  (hc.hc_unats + hl.hl_unats) AS BIGINT) AS nmi_ppm
              FROM mi, hc, hl"""))
  )
}
