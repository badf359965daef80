package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, thirteenth batch — embedding-space decontamination
  * (the vector twin of q158's n-gram bloom path), behavioral burstiness,
  * and the Heaps-law vocabulary-growth forecast.
  */
object Pipeline65 {

  val entries: Seq[QEntry] = Seq(

    // Embedding decontamination: eval/benchmark vectors (the scale-
    // adaptive ~30-probe panel, q342 discipline) probed against the
    // rest of the corpus for near-identical embeddings — the vector
    // twin of 13-gram decontamination (q101/q158): paraphrases and
    // re-encodes that n-grams miss. The cos ≥ 0.999 test runs EXACTLY:
    // dot > 0 ∧ dot²·10⁶ ≥ 998001·na·nb in decimal(38,0) (dot² crosses
    // int64 at 64 dims × 1e4 grid — no doubles, no sqrt, bit-replayed).
    // Per probe: scored corpus size, hits, and the top match by signed
    // quantized cos² ppm.
    QEntry("q359_embedding_decontamination",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"))
        // md5-hashed panel draw — a raw `vec_id % stride` is id-density
        // dependent (1 probe instead of ~30 on the sparse-id 100×
        // replica; ADVICE/SCALE r13)
        val stride = math.max(1L, emb.count() / 30L)
        val panelHash =
          conv(substring(md5(col("vec_id").cast("string")), 1, 15),
            16, 10).cast("long")
        val panel = emb.filter(panelHash % stride === 0)
          .select(col("vec_id").as("probe_id"),
            graft.pipeline.Similarity.quantize(col("embedding")).as("qe"))
        val corpus = emb.filter(panelHash % stride =!= 0)
          .select(col("vec_id"),
            graft.pipeline.Similarity.quantize(col("embedding")).as("ce"))
        val scored = corpus.join(broadcast(panel), lit(true))
          .select(col("probe_id"), col("vec_id"),
            graft.expressions.functions.dot_long(col("qe"), col("ce"))
              .cast("decimal(38,0)").as("dot"),
            graft.expressions.functions.dot_long(col("qe"), col("qe"))
              .cast("decimal(38,0)").as("na"),
            graft.expressions.functions.dot_long(col("ce"), col("ce"))
              .cast("decimal(38,0)").as("nb"))
          .select(col("probe_id"), col("vec_id"),
            expr("CAST(CASE WHEN dot >= 0 THEN dot * dot * 1000000 " +
              "div (na * nb) ELSE -(dot * dot * 1000000 div (na * nb)) " +
              "END AS BIGINT)").as("cos2_ppm"),
            expr("CASE WHEN dot > 0 AND dot * dot * 1000000 >= " +
              "998001 * na * nb THEN 1L ELSE 0L END").as("hit"))
          .localCheckpoint() // feeds the census + the top-match ranking
        val census = scored.groupBy(col("probe_id"))
          .agg(count(lit(1)).as("n_scored"), sum(col("hit")).as("n_hits"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("cos2_ppm").desc, col("vec_id").asc)
        val top = scored.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("probe_id"), col("vec_id").as("top_id"),
            col("cos2_ppm").as("top_cos2_ppm"))
        census.join(top, Seq("probe_id"))
          .orderBy(col("probe_id"))
      },
      Some("""WITH st AS (
                SELECT greatest(1, count(*) // 30) AS stride
                FROM embeddings),
              pz AS (
                SELECT vec_id AS probe_id,
                  list_transform(embedding, v ->
                    CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS qe
                FROM embeddings, st WHERE
                  ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                    ::BIGINT % st.stride = 0),
              cz AS (
                SELECT vec_id,
                  list_transform(embedding, v ->
                    CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS ce
                FROM embeddings, st WHERE
                  ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                    ::BIGINT % st.stride <> 0),
              scored AS (
                SELECT probe_id, vec_id,
                  CAST(list_sum(list_transform(range(len(qe)),
                    i -> CAST(qe[i+1] AS HUGEINT) * ce[i+1]))
                    AS HUGEINT) AS dot,
                  CAST(list_sum(list_transform(qe,
                    x -> CAST(x AS HUGEINT) * x)) AS HUGEINT) AS na,
                  CAST(list_sum(list_transform(ce,
                    x -> CAST(x AS HUGEINT) * x)) AS HUGEINT) AS nb
                FROM pz, cz),
              m AS (
                SELECT probe_id, vec_id,
                  CAST(CASE WHEN dot >= 0
                    THEN dot * dot * 1000000 // (na * nb)
                    ELSE -(dot * dot * 1000000 // (na * nb)) END
                    AS BIGINT) AS cos2_ppm,
                  CASE WHEN dot > 0 AND dot * dot * 1000000 >=
                    998001 * na * nb THEN 1 ELSE 0 END AS hit
                FROM scored),
              census AS (
                SELECT probe_id, count(*) AS n_scored, sum(hit) AS n_hits
                FROM m GROUP BY probe_id),
              top AS (
                SELECT probe_id, vec_id AS top_id,
                  cos2_ppm AS top_cos2_ppm,
                  row_number() OVER (PARTITION BY probe_id
                    ORDER BY cos2_ppm DESC, vec_id) AS rn
                FROM m)
              SELECT c.probe_id, CAST(c.n_scored AS BIGINT) AS n_scored,
                CAST(c.n_hits AS BIGINT) AS n_hits, t.top_id,
                t.top_cos2_ppm
              FROM census c JOIN top t
                ON t.probe_id = c.probe_id AND t.rn = 1
              ORDER BY c.probe_id""")),

    // Behavioral burstiness: per-user inter-arrival gaps (user-keyed
    // lag window — bounded per key), pooled per user-activity band
    // into the index of dispersion VMR = var/mean in milli (VMR ≈ 1
    // ⇒ Poisson arrivals; ≫ 1 ⇒ bursty, the bot/incident signature).
    // Gap moments accumulate in decimal(38,0) — Σg² crosses int64 on
    // long horizons; everything else integer seconds. Completes the
    // stream-behavior family (ACF q298, EWMA q180, CUSUM q240, MAD
    // q351) with the dispersion readout.
    QEntry("q360_burstiness",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("ts"))
        val gaps = ev
          .withColumn("pts", lag(col("ts"), 1).over(w))
          .filter(col("pts").isNotNull)
          .select(col("user_id"),
            expr("(ts - pts) div 1000000000").as("g"))
          .localCheckpoint() // feeds the per-user census + the moments
        val bands = gaps.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_g"))
          .select(col("user_id"),
            expr("CASE WHEN n_g < 4 THEN '1:2-4' " +
              "WHEN n_g < 16 THEN '2:5-16' ELSE '3:17+' END").as("band"))
        gaps.join(bands, "user_id")
          .groupBy(col("band"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_gaps"),
            sum(col("g")).as("sg"),
            sum(col("g").cast("decimal(38,0)") * col("g")).as("qg"))
          .select(col("band"), col("n_users"), col("n_gaps"),
            expr("sg * 1000 div greatest(1L, n_gaps)")
              .as("mean_gap_milli_s"),
            expr("CAST((CAST(n_gaps AS DECIMAL(38,0)) * qg - " +
              "CAST(sg AS DECIMAL(38,0)) * sg) * 1000 div " +
              "greatest(CAST(n_gaps AS DECIMAL(38,0)) * sg, 1) " +
              "AS BIGINT)").as("vmr_milli"))
          .orderBy(col("band"))
      },
      Some("""WITH ev AS (
                SELECT user_id, epoch_us(ts) * 1000 AS tsn
                FROM events),
              gaps AS (
                SELECT user_id, (tsn - ptsn) // 1000000000 AS g
                FROM (
                  SELECT user_id, tsn,
                    lag(tsn) OVER (PARTITION BY user_id
                      ORDER BY tsn, tsn) AS ptsn
                  FROM ev)
                WHERE ptsn IS NOT NULL),
              bands AS (
                SELECT user_id,
                  CASE WHEN count(*) < 4 THEN '1:2-4'
                    WHEN count(*) < 16 THEN '2:5-16'
                    ELSE '3:17+' END AS band
                FROM gaps GROUP BY user_id),
              j AS (
                SELECT b.band, g.user_id, g.g
                FROM gaps g JOIN bands b USING (user_id))
              SELECT band,
                CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                CAST(count(*) AS BIGINT) AS n_gaps,
                CAST(sum(g) * 1000 // greatest(1, count(*)) AS BIGINT)
                  AS mean_gap_milli_s,
                CAST((count(*) * CAST(sum(CAST(g AS HUGEINT) * g)
                    AS HUGEINT) - CAST(sum(g) AS HUGEINT) * sum(g))
                  * 1000 // greatest(CAST(count(*) AS HUGEINT)
                    * sum(g), 1) AS BIGINT) AS vmr_milli
              FROM j GROUP BY band
              ORDER BY band""")),

    // Heaps-law vocabulary growth: distinct-word count V vs cumulative
    // token count T at 8 corpus-prefix checkpoints (doc_id order),
    // and the fitted growth exponent β from least squares on the
    // (ln T, ln V) grid — the "how big does the vocab get at 100 TB"
    // forecast. Corpus-grain plumbing is the two-pass GlobalRank /
    // GlobalCumSum (no single-task sort); vocabulary enters as word
    // first-occurrence postings (q306's min-doc discipline). The ln
    // values round to integer micro-nats PER POINT (q92 parity), so
    // the regression is exact integer arithmetic in decimal(38,0).
    QEntry("q361_heaps_law",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"))
        val ranked = graft.operators.GlobalCumSum.runningSum(
            graft.operators.GlobalRank.rowNumber(docs, "r", col("doc_id")),
            col("tok"), "cum_tok", col("doc_id"))
          .localCheckpoint()
        val n = ranked.agg(max(col("r")).as("n"))
        val grid = broadcast(n).crossJoin(
            org.apache.spark.sql.functions.broadcast(
              ranked.sparkSession.range(1, 9).select(col("id").as("k"))))
          .select(col("k"), expr("n * k div 8").as("r"))
        val cps = grid.join(ranked.select(col("r"), col("doc_id"),
            col("cum_tok")), Seq("r"))
          .select(col("k"), col("r").as("doc_rank"),
            col("doc_id").as("cp_doc"), col("cum_tok"))
          .localCheckpoint() // 8 rows
        val firsts = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(lower(col("text")), "\\s+")).as("w"))
          .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
        val vocab = firsts.crossJoin(broadcast(cps))
          .filter(col("fd") <= col("cp_doc"))
          .groupBy(col("k")).agg(count(lit(1)).as("vocab"))
        val pts = cps.join(vocab, Seq("k"))
          .select(col("k"), col("doc_rank"), col("cum_tok"), col("vocab"),
            expr("CAST(round(ln(CAST(cum_tok AS DOUBLE)) * 1000000.0) " +
              "AS BIGINT)").as("x"),
            expr("CAST(round(ln(CAST(vocab AS DOUBLE)) * 1000000.0) " +
              "AS BIGINT)").as("y"))
          .localCheckpoint() // 8 rows
        val beta = pts.select(col("x").cast("decimal(38,0)").as("x"),
            col("y").cast("decimal(38,0)").as("y"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("m"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .select(expr("CAST((m * sxy - sx * sy) * 1000000 div " +
            "(m * sxx - sx * sx) AS BIGINT)").as("beta_micro"))
        pts.crossJoin(broadcast(beta))
          .select(col("k"), col("doc_rank"), col("cum_tok"), col("vocab"),
            col("beta_micro"))
          .orderBy(col("k"))
      },
      Some("""WITH docs AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok
                FROM documents),
              ranked AS (
                SELECT doc_id, tok,
                  row_number() OVER (ORDER BY doc_id) AS r,
                  sum(tok) OVER (ORDER BY doc_id
                    ROWS UNBOUNDED PRECEDING) AS cum_tok
                FROM docs),
              n AS (SELECT max(r) AS n FROM ranked),
              grid AS (
                SELECT k.k, n.n * k.k // 8 AS r
                FROM (SELECT unnest(range(1, 9)) AS k) k, n),
              cps AS (
                SELECT g.k, g.r AS doc_rank, rk.doc_id AS cp_doc,
                  rk.cum_tok
                FROM grid g JOIN ranked rk ON rk.r = g.r),
              firsts AS (
                SELECT w, min(doc_id) AS fd FROM (
                  SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
                GROUP BY w),
              vocab AS (
                SELECT c.k, count(*) AS vocab
                FROM firsts f JOIN cps c ON f.fd <= c.cp_doc
                GROUP BY c.k),
              pts AS (
                SELECT c.k, c.doc_rank, c.cum_tok, v.vocab,
                  CAST(round(ln(CAST(c.cum_tok AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS x,
                  CAST(round(ln(CAST(v.vocab AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS y
                FROM cps c JOIN vocab v USING (k)),
              beta AS (
                SELECT CAST((count(*) * sum(CAST(x AS HUGEINT) * y)
                    - CAST(sum(x) AS HUGEINT) * sum(y)) * 1000000
                  // (count(*) * sum(CAST(x AS HUGEINT) * x)
                    - CAST(sum(x) AS HUGEINT) * sum(x)) AS BIGINT)
                  AS beta_micro
                FROM pts)
              SELECT p.k, CAST(p.doc_rank AS BIGINT) AS doc_rank,
                CAST(p.cum_tok AS BIGINT) AS cum_tok,
                CAST(p.vocab AS BIGINT) AS vocab, b.beta_micro
              FROM pts p, beta b
              ORDER BY p.k"""))
  )
}
