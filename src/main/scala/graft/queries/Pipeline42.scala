package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, sixth batch: corpus-health diagnostics — temporal
  * n-gram novelty (q306), embedding-space hubness (q307), and lexical
  * type-token/hapax profiles (q308). Novelty and hubness are the two
  * monitors a crawl owner reads weekly: is new data actually new, and
  * is the embedding space collapsing onto hub points.
  */
object Pipeline42 {

  def entries: Seq[QEntry] = Seq(

    // Temporal novelty rate: for each doc (in doc_id arrival order),
    // the share of its DISTINCT word 3-grams never seen in any earlier
    // doc (first-occurrence = min doc_id over the gram's postings).
    // One explode → two keyed aggs. Grams travel as their 60-bit md5
    // prefix (the q164 portable-hash discipline — both engines build
    // the identical int64, and the distinct/agg shuffle carries two
    // longs instead of a ~40-char string; measured 18 s → 6 s at
    // sf0.1). Docs with <3 tokens have no grams: novelty 0 over 0.
    QEntry("q306_novelty_rate",
      (s, d) => {
        // Shingling runs in the fused codegen'd NgramShingles loop (the
        // q50 production path — an element_at(w, i) lambda here would
        // re-run the regex split per element after CollapseProject,
        // measured O(words²)); the md5-prefix hash is a plain post-
        // explode projection, so it codegens too.
        val dg = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 3, distinct = true))
              .as("sh"))
          .select(col("doc_id"),
            conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
              .as("g"))
          .distinct()
          .localCheckpoint() // (doc, gram-hash) postings, feeds both aggs
        val first = dg.groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
        val per = dg.join(first, "g")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"),
            sum(when(col("fd") === col("doc_id"), 1L).otherwise(0L))
              .as("n_novel"))
        Tables.documents(s, d).select(col("doc_id"))
          .join(per, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_grams"), lit(0L)).as("n_grams"),
            coalesce(col("n_novel"), lit(0L)).as("n_novel"))
          .withColumn("novelty_ppm",
            when(col("n_grams") > 0,
              expr("n_novel * 1000000 div n_grams")).otherwise(lit(0L)))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                FROM documents),
              dg AS (
                SELECT DISTINCT doc_id, g FROM (
                  SELECT doc_id,
                    unnest(list_transform(range(1, len(w) - 1),
                      i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1]
                        || ' ' || w[i+2]), 1, 15))::BIGINT)) AS g
                  FROM t WHERE len(w) >= 3)),
              f AS (SELECT g, min(doc_id) AS fd FROM dg GROUP BY g),
              per AS (
                SELECT dg.doc_id, count(*) AS n_grams,
                  sum(CASE WHEN f.fd = dg.doc_id THEN 1 ELSE 0 END)
                    AS n_novel
                FROM dg JOIN f USING (g) GROUP BY dg.doc_id)
              SELECT d.doc_id,
                CAST(coalesce(per.n_grams, 0) AS BIGINT) AS n_grams,
                CAST(coalesce(per.n_novel, 0) AS BIGINT) AS n_novel,
                CAST(CASE WHEN coalesce(per.n_grams, 0) > 0
                  THEN per.n_novel * 1000000 // per.n_grams
                  ELSE 0 END AS BIGINT) AS novelty_ppm
              FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id
              ORDER BY d.doc_id""")),

    // Embedding-space hubness: the in-degree (k-occurrence) histogram
    // of the directed kNN graph (k=4) over the COLLAPSED rep set (the
    // q288/q159 default contract — identical quantized vectors share
    // one rep, so duplicate mass can't fake hubs). A heavy right tail
    // (reps with in-degree ≫ k) is the classic high-dimensional
    // degeneracy sign; anti-hubs show as indeg 0. Integer-exact chain
    // ⇒ the oracle replays the buckets, the top-k and the census.
    QEntry("q307_knn_hubness",
      (s, d) => {
        val corpusQ = Tables.embeddings(s, d)
          .select(col("vec_id"),
            graft.expressions.functions.quantize_vec(col("embedding"),
              10000.0).as("qe"))
          .localCheckpoint()
        val keyed = corpusQ.withColumn("k",
          md5(concat_ws(",", col("qe").cast("array<string>"))))
        val grp = keyed.groupBy(col("k"))
          .agg(min(col("vec_id")).as("rep_id"))
        val reps = keyed.join(grp, "k")
          .filter(col("vec_id") === col("rep_id"))
          .select(col("vec_id"), col("qe"))
          .localCheckpoint() // feeds both sides of the kNN probe
        val knn = graft.pipeline.Similarity.cosineTopKBucketedQ(
            reps.select(col("vec_id").as("q_id"), col("qe")),
            reps.select(col("vec_id"), col("qe")), nBits = 4, k = 4,
            knownQueryCount = Some(Long.MaxValue))
          .filter(col("q_id") =!= col("vec_id"))
        val indeg = reps.select(col("vec_id"))
          .join(knn.groupBy(col("vec_id")).agg(count(lit(1)).as("indeg")),
            Seq("vec_id"), "left")
          .select(coalesce(col("indeg"), lit(0L)).as("indeg"))
        indeg.groupBy(col("indeg")).agg(count(lit(1)).as("n_reps"))
          .orderBy(col("indeg"))
      },
      Some(s"""WITH qz AS (
                SELECT vec_id,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS qe
                FROM embeddings),
              kq AS (
                SELECT vec_id, qe,
                  md5(list_aggregate(list_transform(qe,
                    x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS k
                FROM qz),
              grp AS (SELECT k, min(vec_id) AS rep_id FROM kq GROUP BY k),
              repv AS (
                SELECT g.rep_id AS vec_id, kq.qe
                FROM grp g JOIN kq ON kq.vec_id = g.rep_id),
              bk AS (SELECT vec_id, qe,
                       ${Pipeline2.duckBucketBits(4)} AS bucket
                     FROM repv),
              cand AS (
                SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                    i -> q.qe[i+1] * c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM bk q JOIN bk c ON q.bucket = c.bucket),
              ranked AS (
                SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM cand),
              knn AS (
                SELECT q_id, vec_id FROM ranked
                WHERE rn <= 4 AND q_id <> vec_id),
              indeg AS (
                SELECT r.vec_id, CAST(coalesce(k.c, 0) AS BIGINT) AS indeg
                FROM repv r LEFT JOIN (
                  SELECT vec_id, count(*) AS c FROM knn GROUP BY 1) k
                  ON k.vec_id = r.vec_id)
              SELECT indeg, count(*) AS n_reps
              FROM indeg GROUP BY indeg ORDER BY indeg""")),

    // Lexical profile per doc: token count, distinct types, type-token
    // ratio (ppm) and hapax share (tokens occurring exactly once in
    // the doc) — the cheap lexical-richness screens (template spam has
    // low TTR, gibberish has hapax ≈ 1). Pure higher-order array
    // expressions: per-row projection, zero shuffle, codegen'd.
    QEntry("q308_type_token_ratio",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"),
            filter(split(lower(col("text")), "\\s+"),
              t => length(t) > 0).as("w"))
          .select(col("doc_id"),
            size(col("w")).cast("long").as("n_tok"),
            size(array_distinct(col("w"))).cast("long").as("n_types"),
            expr("""CAST(size(filter(array_distinct(w),
                t -> size(filter(w, x -> x = t)) = 1)) AS BIGINT)""")
              .as("n_hapax"))
          .select(col("doc_id"), col("n_tok"), col("n_types"),
            col("n_hapax"),
            when(col("n_tok") > 0, expr("n_types * 1000000 div n_tok"))
              .otherwise(lit(0L)).as("ttr_ppm"),
            when(col("n_types") > 0,
              expr("n_hapax * 1000000 div n_types"))
              .otherwise(lit(0L)).as("hapax_ppm"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id,
                  list_filter(string_split_regex(lower(text), '\s+'),
                    x -> len(x) > 0) AS w
                FROM documents),
              m AS (
                SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tok,
                  CAST(len(list_distinct(w)) AS BIGINT) AS n_types,
                  CAST(len(list_filter(list_distinct(w),
                    t -> len(list_filter(w, x -> x = t)) = 1)) AS BIGINT)
                    AS n_hapax
                FROM t)
              SELECT doc_id, n_tok, n_types, n_hapax,
                CAST(CASE WHEN n_tok > 0
                  THEN n_types * 1000000 // n_tok ELSE 0 END AS BIGINT)
                  AS ttr_ppm,
                CAST(CASE WHEN n_types > 0
                  THEN n_hapax * 1000000 // n_types ELSE 0 END AS BIGINT)
                  AS hapax_ppm
              FROM m ORDER BY doc_id"""))
  )
}
