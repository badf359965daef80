package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, third batch — embedding-space corpus health: the
  * per-source dispersion census (mode-collapse detector) and the
  * content repetition-exposure census.
  */
object Pipeline82 {

  val entries: Seq[QEntry] = Seq(

    // Per-source embedding dispersion: mean squared distance to the
    // source centroid, computed CLOSED-FORM from two moments
    //   E||x − μ||² = (n·Σ||x||² − ||Σx||²) / n²
    // — one scan to per-source (n, Σ||x||², per-dim Σx), ZERO pairwise
    // work (the naive mean-pairwise-distance formulation squares; the
    // moment identity is the q388/q380 discipline on the embedding
    // axis). The question it answers: which source's embedding space
    // COLLAPSED — a dedup failure, an encoder bug, or a template farm
    // all show up as dispersion ~0 while every scalar census stays
    // normal. Quantized int64 components (q36's round(x·10⁴) grid)
    // keep both moments exact (DECIMAL(38,0) for the squares);
    // dispersion is reported in the quantized² unit and as
    // rel_disp_bp = msd·10⁴ / mean||x||². Plant: every doc of the
    // md5-rank-1 source carries its source's MIN-vec_id embedding
    // (the mode-collapse shape) → rel_disp_bp = 0, the unique
    // 'collapsed' verdict (threshold 500 bp; healthy fixture sources
    // read well above).
    QEntry("q401_embedding_dispersion",
      (s, d) => {
        val ranked = graft.pipeline.Stats.boundedDim(
            Tables.documents(s, d).select(col("source")).distinct(),
            "q401 source dim", 100000L)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(md5(col("source")), col("source"))))
        val vecs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .join(broadcast(ranked), "source")
          .join(Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"),
              graft.pipeline.Similarity.quantize(col("embedding"))
                .as("v")), "doc_id")
          .localCheckpoint() // collapse plant + both moment scans
        // the collapse plant: rank-1 source docs all carry the
        // source's min-vec_id embedding
        val minVec = vecs.filter(col("rn") === 1)
          .orderBy(col("doc_id")).limit(1)
          .select(col("v").as("mv"))
        val planted = vecs
          .crossJoin(broadcast(minVec))
          .select(col("doc_id"), col("source"),
            when(col("rn") === 1, col("mv")).otherwise(col("v"))
              .as("v"))
        val perDim = planted
          .select(col("source"),
            posexplode(col("v")).as(Seq("dim", "x")))
          .groupBy(col("source"), col("dim"))
          .agg(sum(col("x")).as("sx"))
          .groupBy(col("source"))
          .agg(sum(col("sx").cast("decimal(38,0)") * col("sx"))
            .as("cent2"))
        val norms = planted
          .select(col("source"),
            expr("aggregate(v, CAST(0 AS DECIMAL(38,0)), " +
              "(acc, e) -> acc + CAST(e AS DECIMAL(38,0)) * e)")
              .as("n2"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("n2")).as("sum_n2"))
        norms.join(perDim, "source")
          .select(col("source"), col("n_vecs"),
            expr("CAST(sum_n2 div n_vecs AS BIGINT)")
              .as("mean_norm2_q"),
            expr("CAST((n_vecs * sum_n2 - cent2) div " +
              "(n_vecs * n_vecs) AS BIGINT)").as("msd_q"))
          .withColumn("rel_disp_bp",
            expr("msd_q * 10000 div greatest(1L, mean_norm2_q)"))
          .withColumn("verdict",
            when(col("rel_disp_bp") < 500L, "collapsed")
              .otherwise(lit("ok")))
          .orderBy(col("source"))
      },
      Some("""WITH ranked AS (
                SELECT source,
                  row_number() OVER (ORDER BY md5(source), source) AS rn
                FROM (SELECT DISTINCT source FROM documents)),
              ez AS (
                SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                    AS v
                FROM embeddings),
              vecs AS (
                SELECT d.doc_id, d.source, r.rn, e.v
                FROM documents d
                JOIN ranked r USING (source)
                JOIN ez e ON e.vec_id = d.doc_id),
              mv AS (
                SELECT v AS mv FROM vecs WHERE rn = 1
                ORDER BY doc_id LIMIT 1),
              planted AS (
                SELECT doc_id, source,
                  CASE WHEN rn = 1 THEN mv.mv ELSE v END AS v
                FROM vecs, mv),
              pd AS (
                SELECT source, u.dim,
                  sum(v[u.dim + 1]) AS sx
                FROM planted,
                  (SELECT unnest(generate_series(0, 63)) AS dim) u
                GROUP BY source, u.dim),
              cent AS (
                SELECT source,
                  sum(CAST(sx AS HUGEINT) * sx) AS cent2
                FROM pd GROUP BY source),
              nrm AS (
                SELECT source, count(*) AS n_vecs,
                  sum(list_sum(list_transform(v,
                    e -> CAST(e AS HUGEINT) * e))) AS sum_n2
                FROM planted GROUP BY source),
              m AS (
                SELECT n.source, n.n_vecs,
                  CAST(n.sum_n2 // n.n_vecs AS BIGINT) AS mean_norm2_q,
                  CAST((n.n_vecs * n.sum_n2 - c.cent2) //
                    (n.n_vecs * n.n_vecs) AS BIGINT) AS msd_q
                FROM nrm n JOIN cent c USING (source))
              SELECT source, CAST(n_vecs AS BIGINT) AS n_vecs,
                mean_norm2_q, msd_q,
                msd_q * 10000 // greatest(1, mean_norm2_q)
                  AS rel_disp_bp,
                CASE WHEN msd_q * 10000 // greatest(1, mean_norm2_q)
                  < 500 THEN 'collapsed' ELSE 'ok' END AS verdict
              FROM m
              ORDER BY source""")),

    // Content repetition-exposure census: "how many times does the
    // model actually SEE this content" — the interaction the dedup
    // census (q389) and the epoch waterfill (q384) each miss alone.
    // An undeduped release trains every byte-identical copy, and a
    // multi-epoch source multiplies that again: exposure(content) =
    // n_copies × epochs(source). Repetition is the known quality
    // cliff (the "Scaling Data-Constrained LMs" regime), so the
    // census buckets content by exposure in milli-repeats and reads
    // off where the token mass sits: exposure ≤ ~4 is the useful
    // zone, the over_exposed tail is compute spent making the model
    // worse. Shape: one md5 collapse to cluster grain (k, rep
    // tokens, source), the factored ReleaseGate.waterfillAlloc on
    // the UNDEDUPED source masses (the naive run being audited), one
    // broadcast join, a bounded bucket census — nothing leaves
    // dimension grain after the collapse. The q389 dup plant (every
    // 20th doc +1 copy, every 25th +3) supplies the k>1 clusters.
    QEntry("q402_repetition_exposure",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"))
        val corpus = base
          .union(base.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              col("source"), col("text"), col("toks")))
          .union(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              col("source"), col("text"), col("toks")))
          .union(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 30000000L).as("doc_id"),
              col("source"), col("text"), col("toks")))
          .union(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 40000000L).as("doc_id"),
              col("source"), col("text"), col("toks")))
          .localCheckpoint() // masses + clusters
        val alloc = graft.pipeline.ReleaseGate.waterfillAlloc(
          corpus.groupBy(col("source")).agg(sum(col("toks")).as("t")),
          "q402 source dim")
        val clusters = corpus
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("k"), min(col("source")).as("source"),
            min(col("toks")).as("rep_toks"))
        val ex = clusters.join(broadcast(alloc), "source")
          .select(col("k"), col("rep_toks"),
            (col("k") * col("alloc_milli")).as("exposure_milli"))
          .withColumn("bucket", expr("exposure_milli div 500"))
        val census = ex.groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_clusters"), sum(col("k")).as("n_docs"),
            sum(col("exposure_milli") * col("rep_toks"))
              .as("tok_exposure_milli"))
          .localCheckpoint() // census + total
        val tot = census.agg(sum(col("tok_exposure_milli")).as("te"))
        census.crossJoin(broadcast(tot))
          .select(col("bucket"), col("n_clusters"), col("n_docs"),
            col("tok_exposure_milli"),
            expr("tok_exposure_milli * 10000 div te").as("share_bp"),
            when(col("bucket") * 500L >= 4000L, "over_exposed")
              .otherwise(lit("ok")).as("verdict"))
          .orderBy(col("bucket"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks
                FROM documents),
              corpus AS (
                SELECT doc_id, source, text, toks FROM base
                UNION ALL
                SELECT doc_id + 10000000, source, text, toks FROM base
                WHERE doc_id % 20 = 0
                UNION ALL
                SELECT doc_id + 20000000, source, text, toks FROM base
                WHERE doc_id % 25 = 0
                UNION ALL
                SELECT doc_id + 30000000, source, text, toks FROM base
                WHERE doc_id % 25 = 0
                UNION ALL
                SELECT doc_id + 40000000, source, text, toks FROM base
                WHERE doc_id % 25 = 0),
              tok AS (
                SELECT source, sum(toks) AS t,
                  1000 + 1000 * (('0x' || substr(md5(source), 1, 2))
                    ::BIGINT % 4) AS cap_milli
                FROM corpus GROUP BY source),
              tot0 AS (
                SELECT sum(t) AS total_t, 2000 * sum(t) AS budget
                FROM tok),
              r AS (
                SELECT source, t, cap_milli,
                  row_number() OVER (ORDER BY cap_milli, source) AS kk,
                  sum(cap_milli * t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumct,
                  sum(t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumt,
                  coalesce(lag(cap_milli, 1) OVER (ORDER BY cap_milli,
                    source), 0) AS prevcap
                FROM tok),
              cand AS (
                SELECT kk, prevcap, cap_milli,
                  (t0.budget - (cumct - cap_milli * t))
                    // (t0.total_t - (cumt - t)) AS lam
                FROM r, tot0 t0),
              lamf AS (
                SELECT coalesce(
                  (SELECT lam FROM cand
                   WHERE prevcap <= lam AND lam <= cap_milli
                   ORDER BY kk LIMIT 1),
                  (SELECT max(cap_milli) FROM tok)) AS lam),
              alloc AS (
                SELECT source,
                  CAST(least(cap_milli, lam) AS BIGINT) AS alloc_milli
                FROM tok, lamf),
              clusters AS (
                SELECT md5(text) AS h, count(*) AS k,
                  min(source) AS source, min(toks) AS rep_toks
                FROM corpus GROUP BY md5(text)),
              ex AS (
                SELECT c.k, c.rep_toks,
                  c.k * a.alloc_milli AS exposure_milli,
                  (c.k * a.alloc_milli) // 500 AS bucket
                FROM clusters c JOIN alloc a USING (source)),
              census AS (
                SELECT bucket, count(*) AS n_clusters,
                  sum(k) AS n_docs,
                  sum(exposure_milli * rep_toks) AS tok_exposure_milli
                FROM ex GROUP BY bucket),
              t2 AS (SELECT sum(tok_exposure_milli) AS te FROM census)
              SELECT CAST(bucket AS BIGINT) AS bucket,
                CAST(n_clusters AS BIGINT) AS n_clusters,
                CAST(n_docs AS BIGINT) AS n_docs,
                CAST(tok_exposure_milli AS BIGINT) AS tok_exposure_milli,
                CAST(tok_exposure_milli * 10000 // te AS BIGINT)
                  AS share_bp,
                CASE WHEN bucket * 500 >= 4000 THEN 'over_exposed'
                     ELSE 'ok' END AS verdict
              FROM census, t2
              ORDER BY bucket"""))
  )
}
