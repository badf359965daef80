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
              ORDER BY bucket""")),

    // Cross-split near-dup leakage: after a corpus is split
    // train/val/test, a test doc whose NEAR-duplicate sits in train is
    // a leaked eval item — exact-digest splitting (q93's axis) misses
    // it, and it quietly inflates every benchmark run on the split.
    // The audit: md5 split (8/1/1 per the last digit of the doc-id
    // hash), the q37 MinHash chain (capped bands, exact-Jaccard 4/5
    // verify) over the whole corpus, and every verified near-dup pair
    // that CROSSES from train into val/test flags the eval-side doc.
    // Output: one row per flagged eval doc with its evidence (how many
    // train near-dups, the worst Jaccard) plus per-split census rows
    // (doc_id = -1/-2 sentinels) so the headline rate rides the same
    // frame. Plant: the mild-edit copies (+10M) land in md5-random
    // splits, so a fraction of (base, copy) pairs straddles the
    // boundary at every SF — the leakage this audit exists to catch.
    QEntry("q403_split_neardup_leakage",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        def edit(m: Int, phaseMod: Int) = expr(
          s"""array_join(transform(split(lower(text), '\\\\s+'),
              (w, i) -> CASE WHEN i % $m = doc_id % $phaseMod
                THEN concat('zz', CAST(i AS STRING)) ELSE w END), ' ')""")
        val corpus = base
          .union(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              edit(12, 5).as("text")))
          .withColumn("__h",
            conv(substring(md5(col("doc_id").cast("string")), 1, 15),
              16, 10).cast("long") % 10)
          .withColumn("split",
            when(col("__h") <= 7, "train")
              .when(col("__h") === 8, "val").otherwise(lit("test")))
          .drop("__h")
          .localCheckpoint() // pairs + split joins + census
        val toks = graft.pipeline.Dedup
          .tokenArrays(corpus, "doc_id", "text")
        val splits = corpus.select(col("doc_id"), col("split"))
        // split-filter BEFORE the exact verify: only pairs touching an
        // eval doc can leak, and train x train is ~64% of all
        // candidates — the token-array verify (the expensive pass)
        // runs on the crossing third only
        val crossCands = Pipeline.minhashCandidatesOver(
            corpus.select(col("doc_id"), col("text")))
          .join(splits.select(col("doc_id").as("a_id"),
            col("split").as("sa")), "a_id")
          .join(splits.select(col("doc_id").as("b_id"),
            col("split").as("sb")), "b_id")
          .filter((col("sa") === "train" && col("sb") =!= "train") ||
            (col("sb") === "train" && col("sa") =!= "train"))
        val crossing = graft.pipeline.Dedup.verifyJaccard(
            crossCands, toks, 0.0)
          .filter(col("inter") * 5 >= col("uni") * 4)
          .withColumn("jbp", expr("inter * 10000 div uni"))
          .join(crossCands.select(col("a_id"), col("b_id"), col("sa"),
            col("sb")), Seq("a_id", "b_id"))
          .select(
            when(col("sa") === "train", col("b_id")).otherwise(col("a_id"))
              .as("doc_id"),
            when(col("sa") === "train", col("sb")).otherwise(col("sa"))
              .as("split"),
            col("jbp"))
        val flagged = crossing.groupBy(col("doc_id"), col("split"))
          .agg(count(lit(1)).as("n_train_neardups"),
            max(col("jbp")).as("max_jaccard_bp"))
          .localCheckpoint() // doc rows + the census
        val census = splits.filter(col("split") =!= "train")
          .groupBy(col("split")).agg(count(lit(1)).as("n_eval"))
          .join(flagged.groupBy(col("split"))
            .agg(count(lit(1)).as("n_leaked")), Seq("split"), "left")
          .select(
            when(col("split") === "val", lit(-1L)).otherwise(lit(-2L))
              .as("doc_id"),
            col("split"), col("n_eval").as("n_train_neardups"),
            expr("coalesce(n_leaked, 0L) * 10000 div n_eval")
              .as("max_jaccard_bp"))
        flagged.unionByName(census)
          .orderBy(col("doc_id"), col("split"))
      },
      Some {
        val P = 4294967311L
        val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
        }.mkString("[", ",\n                  ", "]")
        s"""WITH base AS (SELECT doc_id, text FROM documents),
            corpus AS (
              SELECT doc_id, text,
                CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 15))::BIGINT % 10 <= 7 THEN 'train'
                WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 15))::BIGINT % 10 = 8 THEN 'val'
                ELSE 'test' END AS split
              FROM (
                SELECT doc_id, text FROM base
                UNION ALL
                SELECT doc_id + 10000000,
                  array_to_string(list_transform(
                    string_split_regex(lower(text), '\\s+'),
                    (w, i) -> CASE WHEN (i - 1) % 12 = doc_id % 5
                      THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END),
                    ' ')
                FROM base WHERE doc_id % 10 = 0)),
            t AS (
              SELECT doc_id,
                string_split_regex(lower(text), '\\s+') AS toks
              FROM corpus),
            shl AS (
              SELECT doc_id,
                list_distinct(list_transform(range(1, len(toks) - 1),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingles
              FROM t),
            hh AS (
              SELECT doc_id, list_transform(shingles,
                s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM shl WHERE len(shingles) > 0),
            msig AS (
              SELECT doc_id, $sigList AS sig FROM hh),
            mbands AS (
              SELECT doc_id, band,
                array_to_string(list_transform(sig[band*4+1:band*4+4],
                  x -> CAST(x AS VARCHAR)), ',') AS bkey
              FROM msig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
            mok AS (
              SELECT band, bkey FROM mbands
              GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
            mcand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM mbands a
              JOIN mbands b ON b.band = a.band AND b.bkey = a.bkey
                AND b.doc_id > a.doc_id
              JOIN mok ON mok.band = a.band AND mok.bkey = a.bkey),
            tok AS (
              SELECT doc_id, unnest(list_distinct(
                string_split_regex(lower(text), '\\s+'))) AS tok
              FROM corpus),
            sizes AS (
              SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
            minter AS (
              SELECT c.a_id, c.b_id, count(*) AS inter
              FROM mcand c
              JOIN tok a ON a.doc_id = c.a_id
              JOIN tok b ON b.doc_id = c.b_id AND b.tok = a.tok
              GROUP BY c.a_id, c.b_id),
            near AS (
              SELECT i.a_id, i.b_id,
                i.inter * 10000 // (sa.ntok + sb.ntok - i.inter) AS jbp
              FROM minter i
              JOIN sizes sa ON sa.doc_id = i.a_id
              JOIN sizes sb ON sb.doc_id = i.b_id
              WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
            crossing AS (
              SELECT CASE WHEN ca.split = 'train' THEN n.b_id
                ELSE n.a_id END AS doc_id,
                CASE WHEN ca.split = 'train' THEN cb.split
                ELSE ca.split END AS split,
                n.jbp
              FROM near n
              JOIN corpus ca ON ca.doc_id = n.a_id
              JOIN corpus cb ON cb.doc_id = n.b_id
              WHERE (ca.split = 'train' AND cb.split != 'train')
                 OR (cb.split = 'train' AND ca.split != 'train')),
            flagged AS (
              SELECT doc_id, split, count(*) AS n_train_neardups,
                max(jbp) AS max_jaccard_bp
              FROM crossing GROUP BY doc_id, split),
            census AS (
              SELECT CASE WHEN c.split = 'val' THEN -1 ELSE -2 END
                  AS doc_id,
                c.split, count(*) AS n_eval,
                coalesce(f.n_leaked, 0) AS n_leaked
              FROM corpus c
              LEFT JOIN (SELECT split, count(*) AS n_leaked
                         FROM flagged GROUP BY split) f
                ON f.split = c.split
              WHERE c.split != 'train'
              GROUP BY c.split, f.n_leaked)
            SELECT doc_id, split,
              CAST(n_train_neardups AS BIGINT) AS n_train_neardups,
              CAST(max_jaccard_bp AS BIGINT) AS max_jaccard_bp
            FROM flagged
            UNION ALL
            SELECT CAST(doc_id AS BIGINT), split,
              CAST(n_eval AS BIGINT),
              CAST(n_leaked * 10000 // n_eval AS BIGINT)
            FROM census
            ORDER BY doc_id, split"""
      })
  )
}
