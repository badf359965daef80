package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, ninth batch — format mix, header stripping,
  * embedding-store sanity, chunk-policy cost.
  */
object Pipeline88 {

  val entries: Seq[QEntry] = Seq(

    // Format-mix census: code and prose want different mix weights,
    // tokenizers and quality filters — so the first question about an
    // unlabeled source is "how much of it is code". Classifier: code-
    // marker count ({};=<> chars, via translate-delete — a zero-regex
    // single scan) over an absolute >= 5 gate: marker DENSITY dilutes
    // with doc length (a one-line snippet in a long doc), while real
    // prose carries ~none of these characters at all. Plants: code-heavy sources (md5 % 4 = 0)
    // append a code line on ~1/3 of docs (~3300 bp code share), light
    // sources on ~1/20 (~500 bp); pure prose (the '.'-terminated
    // corpus convention) reads 0.
    QEntry("q424_format_mix",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(".")).as("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val heavy = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 4 === 0
        val codeLine = lit(" int main() { return n <= 0; } // x = 1;")
        val corpus = docs.withColumn("text",
          when(heavy && draw % 3 === 0, concat(col("text"), codeLine))
            .when(!heavy && draw % 20 === 0,
              concat(col("text"), codeLine))
            .otherwise(col("text")))
        corpus
          .withColumn("markers",
            expr("length(text) - length(translate(text, '{};=<>', ''))"))
          .withColumn("is_code", (col("markers") >= 5L).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("is_code")).as("code_docs"))
          .withColumn("code_bp", expr("code_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("code_bp") > 2000L, "code_heavy")
              .otherwise(lit("prose")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text || '.' AS text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 4 = 0
                    AS heavy
                FROM documents),
              corpus AS (
                SELECT source,
                  CASE
                    WHEN heavy AND draw % 3 = 0 THEN
                      text || ' int main() { return n <= 0; } // x = 1;'
                    WHEN NOT heavy AND draw % 20 = 0 THEN
                      text || ' int main() { return n <= 0; } // x = 1;'
                    ELSE text
                  END AS text
                FROM docs),
              c AS (
                SELECT source,
                  CASE WHEN len(text) - len(translate(text, '{};=<>',
                    '')) >= 5
                    THEN 1 ELSE 0 END AS is_code
                FROM corpus),
              g AS (
                SELECT source, count(*) AS n_docs, sum(is_code)
                  AS code_docs
                FROM c GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(code_docs AS BIGINT) AS code_docs,
                CAST(code_docs * 10000 // n_docs AS BIGINT) AS code_bp,
                CASE WHEN code_docs * 10000 // n_docs > 2000
                  THEN 'code_heavy' ELSE 'prose' END AS verdict
              FROM g
              ORDER BY source""")),

    // Common-header strip planner: extraction that leaves the same
    // site chrome ("NAV | Subscribe | …") at the head of EVERY doc in
    // a source both wastes tokens and teaches the template — and the
    // fix is a per-source strip rule, so the question is "how long is
    // the shared prefix and what does stripping buy". The shared
    // prefix of a SET of strings is LCP(min, max) under binary order
    // (any string between the extremes shares at least that prefix) —
    // so the corpus reduces to one (min, max) agg per source and the
    // LCP runs on two strings per source: prefix equality is monotone,
    // so counting equal-prefix positions IS the LCP length.
    QEntry("q425_header_strip_planner",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val header = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 9 === 1
        val corpus = docs.withColumn("text",
          when(header,
            concat(lit("SITE NAV | Subscribe | Login | "), col("text")))
            .otherwise(col("text")))
        corpus.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), min(col("text")).as("mn"),
            max(col("text")).as("mx"))
          .withColumn("lcp_len",
            expr("CAST(size(filter(sequence(1, least(length(mn), " +
              "length(mx))), i -> substring(mn, 1, i) = " +
              "substring(mx, 1, i))) AS BIGINT)"))
          .withColumn("strip_savings_bytes",
            col("lcp_len") * col("n_docs"))
          .withColumn("shared_prefix",
            substring(col("mn"), 1, 31))
          .select(col("source"), col("n_docs"), col("lcp_len"),
            col("strip_savings_bytes"),
            when(col("lcp_len") >= 8L, col("shared_prefix"))
              .otherwise(lit("")).as("shared_prefix"),
            when(col("lcp_len") >= 8L, "strip_candidate")
              .otherwise(lit("clean")).as("verdict"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                    % 9 = 1
                  THEN 'SITE NAV | Subscribe | Login | ' || text
                  ELSE text END AS text
                FROM documents),
              g AS (
                SELECT source, count(*) AS n_docs, min(text) AS mn,
                  max(text) AS mx
                FROM docs GROUP BY source),
              l AS (
                SELECT source, n_docs, mn,
                  len(list_filter(range(1, least(len(mn), len(mx)) + 1),
                    i -> substr(mn, 1, CAST(i AS INT)) =
                         substr(mx, 1, CAST(i AS INT)))) AS lcp_len
                FROM g)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(lcp_len AS BIGINT) AS lcp_len,
                CAST(lcp_len * n_docs AS BIGINT) AS strip_savings_bytes,
                CASE WHEN lcp_len >= 8 THEN substr(mn, 1, 31)
                  ELSE '' END AS shared_prefix,
                CASE WHEN lcp_len >= 8 THEN 'strip_candidate'
                  ELSE 'clean' END AS verdict
              FROM l
              ORDER BY source""")),

    // Embedding-store sanity gate: before any similarity math runs,
    // the store itself must be healthy — NaN components (a broken
    // encoder batch), zero vectors (a failed write), and off-norm
    // vectors (a missed normalization pass) each break downstream
    // cosine silently. NaN is detected BEFORE quantization (ANSI-safe
    // and cross-engine: isnan on the raw floats); norms run on the
    // q36 integer grid, healthy band [0.9e8, 1.1e8] around the
    // unit-norm fixture (~1.0e8). Broken stores (md5 % 6 = 3) plant
    // all three corruptions as re-embeds on disjoint draws; healthy
    // stores re-embed cleanly (the control — duplication is normal).
    QEntry("q426_embedding_sanity",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .join(Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"), col("embedding")),
            "doc_id")
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val broken = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 6 === 3
        val corrupted = base.filter(draw % 7 < 3)
          .select((col("doc_id") + 10000000L).as("doc_id"), col("source"),
            when(!broken, col("embedding"))
              .when(draw % 7 === 0,
                expr("transform(embedding, x -> CAST(0.0 AS FLOAT))"))
              .when(draw % 7 === 1,
                expr("transform(embedding, (x, i) -> " +
                  "IF(i = 0, CAST('NaN' AS FLOAT), x))"))
              .otherwise(expr(
                "transform(embedding, x -> CAST(x * 2.0 AS FLOAT))"))
              .as("embedding"))
        val corpus = base.union(corrupted)
        corpus
          .withColumn("has_nan",
            expr("exists(embedding, x -> isnan(x))").cast("long"))
          .withColumn("norm2",
            when(col("has_nan") === 1L, lit(null))
              .otherwise(graft.expressions.functions.dot_long(
                graft.pipeline.Similarity.quantize(col("embedding")),
                graft.pipeline.Similarity.quantize(col("embedding")))))
          .withColumn("is_zero", (col("norm2") === 0L).cast("long"))
          .withColumn("off_norm",
            (col("norm2").isNotNull && col("norm2") =!= 0L &&
              (col("norm2") < 90000000L || col("norm2") > 110000000L))
              .cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("has_nan")).as("nan_vecs"),
            sum(coalesce(col("is_zero"), lit(0L))).as("zero_vecs"),
            sum(col("off_norm")).as("off_norm_vecs"))
          .withColumn("healthy_bp",
            expr("(n_vecs - nan_vecs - zero_vecs - off_norm_vecs) " +
              "* 10000 div n_vecs"))
          .withColumn("verdict",
            when(col("nan_vecs") + col("zero_vecs") +
              col("off_norm_vecs") > 0L, "corrupt_store")
              .otherwise(lit("healthy")))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT d.doc_id, d.source, e.embedding
                FROM documents d JOIN (SELECT vec_id AS doc_id,
                  embedding FROM embeddings) e USING (doc_id)),
              dr AS (
                SELECT *, ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 6 = 3
                    AS broken
                FROM base),
              corrupted AS (
                SELECT doc_id + 10000000 AS doc_id, source,
                  CASE
                    WHEN NOT broken THEN embedding
                    WHEN draw % 7 = 0 THEN
                      list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                    WHEN draw % 7 = 1 THEN
                      list_transform(embedding, (x, i) ->
                        CASE WHEN i = 1 THEN 'NaN'::FLOAT ELSE x END)
                    ELSE list_transform(embedding, x ->
                      CAST(x * 2.0 AS FLOAT))
                  END AS embedding
                FROM dr WHERE draw % 7 < 3),
              corpus AS (
                SELECT doc_id, source, embedding FROM base
                UNION ALL
                SELECT doc_id, source, embedding FROM corrupted),
              f AS (
                SELECT source,
                  CASE WHEN len(list_filter(embedding, x -> isnan(x)))
                    > 0 THEN 1 ELSE 0 END AS has_nan,
                  CASE WHEN len(list_filter(embedding, x -> isnan(x)))
                    > 0 THEN NULL
                  ELSE list_sum(list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT) *
                    CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)))
                  END AS norm2
                FROM corpus),
              c AS (
                SELECT source, has_nan,
                  CASE WHEN norm2 = 0 THEN 1 ELSE 0 END AS is_zero,
                  CASE WHEN norm2 IS NOT NULL AND norm2 != 0
                    AND (norm2 < 90000000 OR norm2 > 110000000)
                    THEN 1 ELSE 0 END AS off_norm
                FROM f),
              g AS (
                SELECT source, count(*) AS n_vecs, sum(has_nan)
                  AS nan_vecs,
                  sum(coalesce(is_zero, 0)) AS zero_vecs,
                  sum(off_norm) AS off_norm_vecs
                FROM c GROUP BY source)
              SELECT source, CAST(n_vecs AS BIGINT) AS n_vecs,
                CAST(nan_vecs AS BIGINT) AS nan_vecs,
                CAST(zero_vecs AS BIGINT) AS zero_vecs,
                CAST(off_norm_vecs AS BIGINT) AS off_norm_vecs,
                CAST((n_vecs - nan_vecs - zero_vecs - off_norm_vecs)
                  * 10000 // n_vecs AS BIGINT) AS healthy_bp,
                CASE WHEN nan_vecs + zero_vecs + off_norm_vecs > 0
                  THEN 'corrupt_store' ELSE 'healthy' END AS verdict
              FROM g
              ORDER BY source""")),

    // Chunk-policy cost planner: docs over the context budget L either
    // TRUNCATE (lose tail tokens) or CHUNK (pay per-chunk template/
    // overlap overhead) — the right policy is a per-source cost
    // comparison, not a global default. L = 48 against the ~56-token
    // median fixture docs; chunking pays 8 overlap tokens per extra
    // chunk. Pure column arithmetic to the source dim: per source the
    // over-budget docs, tokens lost under truncate-at-L, chunks and
    // overhead under chunking, and the cheaper policy by lost-vs-
    // overhead token mass.
    QEntry("q427_chunk_policy_cost",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"),
            size(split(lower(col("text")), "\\s+")).cast("long")
              .as("n_tok"))
        docs
          .withColumn("over", (col("n_tok") > 48L).cast("long"))
          .withColumn("lost",
            when(col("n_tok") > 48L, col("n_tok") - 48L).otherwise(0L))
          .withColumn("chunks", expr("(n_tok + 47) div 48"))
          .withColumn("overhead", (col("chunks") - 1L) * 8L)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("tokens"),
            sum(col("over")).as("over_docs"),
            sum(col("lost")).as("lost_truncate"),
            sum(col("chunks")).as("chunks_total"),
            sum(col("overhead")).as("overhead_chunk"))
          .withColumn("loss_bp",
            expr("lost_truncate * 10000 div tokens"))
          .withColumn("policy",
            when(col("lost_truncate") > col("overhead_chunk"), "chunk")
              .otherwise(lit("truncate")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS n_tok
                FROM documents),
              f AS (
                SELECT source, n_tok,
                  CASE WHEN n_tok > 48 THEN 1 ELSE 0 END AS over,
                  CASE WHEN n_tok > 48 THEN n_tok - 48 ELSE 0 END
                    AS lost,
                  (n_tok + 47) // 48 AS chunks
                FROM docs),
              g AS (
                SELECT source, count(*) AS n_docs, sum(n_tok) AS tokens,
                  sum(over) AS over_docs, sum(lost) AS lost_truncate,
                  sum(chunks) AS chunks_total,
                  sum((chunks - 1) * 8) AS overhead_chunk
                FROM f GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(tokens AS BIGINT) AS tokens,
                CAST(over_docs AS BIGINT) AS over_docs,
                CAST(lost_truncate AS BIGINT) AS lost_truncate,
                CAST(chunks_total AS BIGINT) AS chunks_total,
                CAST(overhead_chunk AS BIGINT) AS overhead_chunk,
                CAST(lost_truncate * 10000 // tokens AS BIGINT)
                  AS loss_bp,
                CASE WHEN lost_truncate > overhead_chunk THEN 'chunk'
                  ELSE 'truncate' END AS policy
              FROM g
              ORDER BY source"""))
  )
}
