package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, fifteenth batch — content-defined chunking, source
  * Pareto, pool diversity.
  */
object Pipeline94 {

  val entries: Seq[QEntry] = Seq(

    // Content-defined chunking (CDC) dedup: fixed-size blocks lose all
    // sharing after ONE prefix edit (every boundary shifts); content-
    // defined boundaries — cut where a rolling window's hash meets a
    // mask — realign immediately, so an edited re-publication still
    // shares its tail chunks with the original. That property is the
    // storage-dedup workhorse (rsync/LBFS/backup dedup) and this query
    // pins it end-to-end: boundaries at 8-char-window md5 % 16 = 0
    // (avg ~16-char chunks), chunks derived in-row from the boundary
    // list, one digest-grain census. Plant: an ~1/6 draw re-publishes
    // docs with an edited intro — the corpus row's dup_bytes must
    // recover most of the re-published mass DESPITE the edit. Scopes:
    // per-source rows (within-source distincts) + one '__corpus__'
    // row (global distincts, the savings number).
    QEntry("q446_cdc_chunk_dedup",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 6 === 0)
            .select(col("doc_id") + 10000000L, col("source"),
              concat(lit("edited intro "), col("text"))))
        // one fused O(n) scan per doc (expressions.CdcChunks) — the
        // equivalent HOF formulation (filter(sequence…) with a
        // Catalyst md5 per window) runs interpreted and priced the
        // 100× replica in minutes
        val chunked = corpus
          .select(col("source"),
            explode(graft.expressions.functions.cdc_chunks(
              col("text"), 8, 16)).as("chunk"))
          .filter(length(col("chunk")) > 0)
          .select(col("source"), md5(col("chunk")).as("h"),
            length(col("chunk")).cast("long").as("b"))
          .localCheckpoint() // source rows + corpus row share it
        val perSource = chunked.groupBy(col("source"))
          .agg(count(lit(1)).as("n_chunks"),
            countDistinct(col("h")).as("n_distinct"),
            sum(col("b")).as("bytes"))
        val corpusRow = chunked
          .groupBy(col("h")).agg(count(lit(1)).as("k"),
            min(col("b")).as("rb"), sum(col("b")).as("tb"))
          .agg(sum(col("k")).as("n_chunks"),
            count(lit(1)).as("n_distinct"),
            sum(col("tb")).as("bytes"),
            sum(col("tb") - col("rb")).as("dup_bytes"))
          .select(lit("__corpus__").as("source"), col("n_chunks"),
            col("n_distinct"), col("bytes"), col("dup_bytes"))
        perSource
          .withColumn("dup_bytes", lit(0L))
          .unionByName(corpusRow)
          .withColumn("savings_bp",
            expr("dup_bytes * 10000 div greatest(1L, bytes)"))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              corpus AS (
                SELECT source, text FROM base
                UNION ALL
                SELECT source, 'edited intro ' || text FROM base
                WHERE draw % 6 = 0),
              st AS (
                SELECT source, text,
                  list_sort(list_distinct(list_prepend(CAST(1 AS BIGINT),
                    [i FOR i IN range(1, greatest(2, len(text) - 6))
                     IF ('0x' || substr(md5(substr(text,
                       CAST(i AS INT), 8)), 1, 2))::BIGINT % 16 = 0])))
                    AS starts
                FROM corpus),
              ch AS (
                SELECT source,
                  unnest(list_transform(range(1, len(starts) + 1),
                    j -> CASE WHEN j < len(starts)
                      THEN substr(text, CAST(starts[CAST(j AS INT)]
                        AS INT), CAST(starts[CAST(j AS INT) + 1] -
                        starts[CAST(j AS INT)] AS INT))
                      ELSE substr(text, CAST(starts[CAST(j AS INT)]
                        AS INT)) END)) AS chunk
                FROM st),
              f AS (
                SELECT source, md5(chunk) AS h,
                  CAST(len(chunk) AS BIGINT) AS b
                FROM ch WHERE len(chunk) > 0),
              per_source AS (
                SELECT source, count(*) AS n_chunks,
                  count(DISTINCT h) AS n_distinct, sum(b) AS bytes,
                  0 AS dup_bytes
                FROM f GROUP BY source),
              cg AS (
                SELECT h, count(*) AS k, min(b) AS rb, sum(b) AS tb
                FROM f GROUP BY h),
              corpus_row AS (
                SELECT '__corpus__' AS source, sum(k) AS n_chunks,
                  count(*) AS n_distinct, sum(tb) AS bytes,
                  sum(tb - rb) AS dup_bytes
                FROM cg),
              u AS (
                SELECT * FROM per_source
                UNION ALL SELECT * FROM corpus_row)
              SELECT source, CAST(n_chunks AS BIGINT) AS n_chunks,
                CAST(n_distinct AS BIGINT) AS n_distinct,
                CAST(bytes AS BIGINT) AS bytes,
                CAST(dup_bytes AS BIGINT) AS dup_bytes,
                CAST(dup_bytes * 10000 // greatest(1, bytes) AS BIGINT)
                  AS savings_bp
              FROM u
              ORDER BY source""")),

    // Source token Pareto: how concentrated is the corpus — the
    // "5 sources are 90% of the tokens" readout behind every mix and
    // crawl-budget decision. Token masses land on the 20-row source
    // dim; the cumulative share runs a window over that DIM (bounded
    // — never the corpus). Each source reports its rank, cumulative
    // share, and whether it sits in the 90% head.
    QEntry("q447_source_token_pareto",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val masses = Tables.documents(s, d)
          .select(col("source"),
            size(split(lower(col("text")), "\\s+")).cast("long")
              .as("n_tok"))
          .groupBy(col("source")).agg(sum(col("n_tok")).as("tokens"))
        val w = Window.orderBy(col("tokens").desc, col("source"))
        val tot = masses.agg(sum(col("tokens")).as("total"))
        masses.crossJoin(broadcast(tot))
          .withColumn("rank", row_number().over(w).cast("long"))
          .withColumn("cum_tokens",
            sum(col("tokens")).over(w.rowsBetween(
              Window.unboundedPreceding, Window.currentRow)))
          .withColumn("cum_share_bp",
            expr("cum_tokens * 10000 div total"))
          .withColumn("segment",
            when(col("cum_share_bp") <= 9000L, "head")
              .otherwise(lit("tail")))
          .select(col("source"), col("tokens"), col("rank"),
            col("cum_tokens"), col("cum_share_bp"), col("segment"))
          .orderBy(col("rank"))
      },
      Some("""WITH m AS (
                SELECT source,
                  sum(CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT)) AS tokens
                FROM documents GROUP BY source),
              r AS (
                SELECT source, tokens,
                  row_number() OVER (ORDER BY tokens DESC, source)
                    AS rank,
                  sum(tokens) OVER (ORDER BY tokens DESC, source
                    ROWS UNBOUNDED PRECEDING) AS cum_tokens,
                  (SELECT sum(tokens) FROM m) AS total
                FROM m)
              SELECT source, CAST(tokens AS BIGINT) AS tokens,
                CAST(rank AS BIGINT) AS rank,
                CAST(cum_tokens AS BIGINT) AS cum_tokens,
                CAST(cum_tokens * 10000 // total AS BIGINT)
                  AS cum_share_bp,
                CASE WHEN cum_tokens * 10000 // total <= 9000
                  THEN 'head' ELSE 'tail' END AS segment
              FROM r
              ORDER BY rank""")),

    // Prompt-pool response diversity: k samples per prompt are only
    // worth k when they DIFFER — a pool whose responses share most of
    // their trigrams is one response in k costumes (the self-BLEU
    // intuition at type grain, no pairwise work): per pool,
    // |union of response trigram types| ÷ Σ |per-response types| in
    // bp (1/k-ish = collapsed, ~10000 = fully diverse). Pools are the
    // q440 topology; its canned-response plant IS the collapse signal
    // (byte-identical members), organic members keep the ratio high.
    // Pool grain, pools with ≥ 3 responses.
    QEntry("q448_pool_response_diversity",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val rows = docs
          .filter(draw % 4 === 0)
          .withColumn("prompt", concat(lit("shared_p"), draw % 50))
          .withColumn("text",
            when(draw % 8 === 0, concat(lit("canned answer for "),
              col("prompt"))).otherwise(col("text")))
        // Both engines window the first 514 tokens (trigram starts
        // 1..512): the oracle's generate_series(0, 511) bounds its
        // start positions, so the Spark side slices to the same
        // window rather than shingling uncapped — a longer-doc
        // fixture upgrade keeps the two sides identical instead of
        // silently diverging past token 514 (ADVICE r15).
        val tg = rows.select(col("prompt"), col("doc_id"),
          explode(graft.expressions.functions.ngram_shingles(
            slice(split(lower(col("text")), "\\s+"), 1, 514),
            3, distinct = true))
            .as("g"))
          .select(col("prompt"), col("doc_id"),
            md5(col("g")).as("gh"))
        val perResp = tg.groupBy(col("prompt"), col("doc_id"))
          .agg(count(lit(1)).as("types"))
          .groupBy(col("prompt"))
          .agg(count(lit(1)).as("n_responses"),
            sum(col("types")).as("sum_types"))
        val perPool = tg.groupBy(col("prompt"))
          .agg(countDistinct(col("gh")).as("union_types"))
        perResp.join(perPool, "prompt")
          .filter(col("n_responses") >= 3L)
          .withColumn("diversity_bp",
            expr("union_types * 10000 div sum_types"))
          .withColumn("verdict",
            when(col("diversity_bp") < 5000L, "mode_collapsed")
              .otherwise(lit("diverse")))
          .orderBy(col("prompt"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              rows_ AS (
                SELECT doc_id,
                  'shared_p' || (draw % 50) AS prompt,
                  CASE WHEN draw % 8 = 0
                    THEN 'canned answer for shared_p' || (draw % 50)
                    ELSE text END AS text
                FROM docs WHERE draw % 4 = 0),
              t AS (
                SELECT prompt, doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM rows_),
              tg AS (
                SELECT DISTINCT prompt, doc_id,
                  md5(array_to_string(toks[p.p + 1:p.p + 3], ' '))
                    AS gh
                FROM t, (SELECT unnest(generate_series(0, 511)) AS p) p
                WHERE p.p <= len(toks) - 3),
              pr AS (
                SELECT prompt, doc_id, count(*) AS types
                FROM tg GROUP BY prompt, doc_id),
              pa AS (
                SELECT prompt, count(*) AS n_responses,
                  sum(types) AS sum_types
                FROM pr GROUP BY prompt),
              pu AS (
                SELECT prompt, count(DISTINCT gh) AS union_types
                FROM tg GROUP BY prompt)
              SELECT pa.prompt,
                CAST(pa.n_responses AS BIGINT) AS n_responses,
                CAST(pa.sum_types AS BIGINT) AS sum_types,
                CAST(pu.union_types AS BIGINT) AS union_types,
                CAST(pu.union_types * 10000 // pa.sum_types AS BIGINT)
                  AS diversity_bp,
                CASE WHEN pu.union_types * 10000 // pa.sum_types < 5000
                  THEN 'mode_collapsed' ELSE 'diverse' END AS verdict
              FROM pa JOIN pu USING (prompt)
              WHERE pa.n_responses >= 3
              ORDER BY pa.prompt"""))
  )
}
