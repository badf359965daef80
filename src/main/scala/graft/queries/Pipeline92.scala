package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, thirteenth batch — prompt-pool curation, code-corpus
  * hygiene, binary-blob and degenerate-generation scans.
  */
object Pipeline92 {

  val entries: Seq[QEntry] = Seq(

    // Prompt-pool response dedup: SFT corpora sampled from teachers
    // carry MANY responses per prompt — the pool wants exact-dup
    // responses collapsed first, then a quality-ranked cap (keep the
    // best k=2 DISTINCT responses; more adds compute, not signal).
    // Drops are attributed per source: dup_dropped (byte-identical
    // response in the same pool) vs overflow_dropped (rank > 2).
    // Shape: one (prompt, response-digest) dedup via min-id, one
    // rank window per prompt pool (pools are small by construction —
    // the window partition is the prompt, never the corpus), one
    // source census. Pools: ~1/4 of docs share 50 rotating prompts
    // (pools span sources); the rest are singleton prompts; pool
    // members on the nested ~1/8 draw all ship the pool's CANNED
    // response (byte-identical — the dup plant).
    QEntry("q440_prompt_pool_dedup",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val rows = docs
          .withColumn("prompt",
            when(draw % 4 === 0, concat(lit("shared_p"), draw % 50))
              .otherwise(concat(lit("p"), col("doc_id"))))
          .withColumn("text",
            when(draw % 8 === 0, concat(lit("canned answer for "),
              col("prompt"))).otherwise(col("text")))
          .withColumn("score", expr(
            "CAST(size(filter(split(lower(text), '\\\\s+'), " +
              "w -> w IN ('the','a','of','and','to','in','is','on'," +
              "'for','with'))) AS BIGINT)"))
          .withColumn("rh", md5(col("text")))
        // rank the distinct-response representatives only (a window
        // over raw rows would let duplicate copies consume rank slots)
        val reps = rows
          .groupBy(col("prompt"), col("rh"))
          .agg(min(col("doc_id")).as("rep_id"), max(col("score")).as("score"),
            count(lit(1)).as("copies"))
          .withColumn("rnk", row_number().over(
            Window.partitionBy(col("prompt"))
              .orderBy(col("score").desc, col("rh"))))
        val verdictPerDoc = rows
          .join(reps.select(col("prompt"), col("rh"), col("rep_id"),
            col("rnk")), Seq("prompt", "rh"))
          .withColumn("status",
            when(col("doc_id") =!= col("rep_id"), "dup_dropped")
              .when(col("rnk") > 2, "overflow_dropped")
              .otherwise(lit("kept")))
        verdictPerDoc.groupBy(col("source"))
          .agg(count(lit(1)).as("n_responses"),
            sum(when(col("status") === "kept", 1L).otherwise(0L))
              .as("kept"),
            sum(when(col("status") === "dup_dropped", 1L).otherwise(0L))
              .as("dup_dropped"),
            sum(when(col("status") === "overflow_dropped", 1L)
              .otherwise(0L)).as("overflow_dropped"))
          .withColumn("kept_bp", expr("kept * 10000 div n_responses"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              pr AS (
                SELECT doc_id, source, draw,
                  CASE WHEN draw % 4 = 0
                    THEN 'shared_p' || (draw % 50)
                    ELSE 'p' || doc_id END AS prompt,
                  text AS text0
                FROM docs),
              rows_ AS (
                SELECT doc_id, source, prompt,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT)
                    AS score,
                  md5(text) AS rh
                FROM (SELECT doc_id, source, prompt,
                  CASE WHEN draw % 8 = 0
                    THEN 'canned answer for ' || prompt
                    ELSE text0 END AS text
                  FROM pr)),
              reps AS (
                SELECT prompt, rh, min(doc_id) AS rep_id,
                  max(score) AS score
                FROM rows_ GROUP BY prompt, rh),
              ranked AS (
                SELECT prompt, rh, rep_id,
                  row_number() OVER (PARTITION BY prompt
                    ORDER BY score DESC, rh) AS rnk
                FROM reps),
              v AS (
                SELECT r.source,
                  CASE WHEN r.doc_id != k.rep_id THEN 'dup_dropped'
                       WHEN k.rnk > 2 THEN 'overflow_dropped'
                       ELSE 'kept' END AS status
                FROM rows_ r JOIN ranked k
                  ON k.prompt = r.prompt AND k.rh = r.rh),
              g AS (
                SELECT source, count(*) AS n_responses,
                  sum(CASE WHEN status = 'kept' THEN 1 ELSE 0 END)
                    AS kept,
                  sum(CASE WHEN status = 'dup_dropped' THEN 1 ELSE 0
                    END) AS dup_dropped,
                  sum(CASE WHEN status = 'overflow_dropped' THEN 1
                    ELSE 0 END) AS overflow_dropped
                FROM v GROUP BY source)
              SELECT source, CAST(n_responses AS BIGINT) AS n_responses,
                CAST(kept AS BIGINT) AS kept,
                CAST(dup_dropped AS BIGINT) AS dup_dropped,
                CAST(overflow_dropped AS BIGINT) AS overflow_dropped,
                CAST(kept * 10000 // n_responses AS BIGINT) AS kept_bp
              FROM g
              ORDER BY source""")),

    // Merge-conflict marker scan: code corpora routinely ingest files
    // with unresolved VCS conflicts — "<<<<<<<"/"======="/">>>>>>>"
    // blocks train the model to EMIT conflict markers; the scan counts
    // docs carrying a marker pair (open + close — a lone '=======' row
    // of punctuation is a false-positive divider, the reason the probe
    // requires both). Broken-checkout sources (md5 % 14 = 10) plant a
    // full conflict block on an ~1/7 draw, and ALL sources carry a
    // divider-only line on an ~1/23 draw (the control that must NOT
    // page).
    QEntry("q441_merge_conflict_scan",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val brokenSrc = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 14 === 10
        val corpus = docs.withColumn("text",
          concat(col("text"),
            when(brokenSrc && draw % 7 === 2,
              lit(" <<<<<<< HEAD ours ======= theirs >>>>>>> branch"))
              .otherwise(lit("")),
            when(draw % 23 === 9, lit(" ======= "))
              .otherwise(lit(""))))
        corpus
          .withColumn("has_open",
            (instr(col("text"), "<<<<<<<") > 0).cast("long"))
          .withColumn("has_close",
            (instr(col("text"), ">>>>>>>") > 0).cast("long"))
          .withColumn("conflict",
            col("has_open") * col("has_close"))
          .withColumn("divider_only",
            when(col("conflict") === 0L &&
              instr(col("text"), "=======") > 0, 1L).otherwise(0L))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("conflict")).as("conflict_docs"),
            sum(col("divider_only")).as("divider_only_docs"))
          .withColumn("conflict_bp",
            expr("conflict_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("conflict_docs") > 0L, "broken_checkout")
              .otherwise(lit("clean")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  text ||
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 14 = 10
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 4))::BIGINT % 7 = 2
                    THEN ' <<<<<<< HEAD ours ======= theirs >>>>>>> branch'
                    ELSE '' END ||
                  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    ), 1, 4))::BIGINT % 23 = 9
                    THEN ' ======= ' ELSE '' END AS text
                FROM documents),
              c AS (
                SELECT source,
                  CASE WHEN position('<<<<<<<' IN text) > 0
                    AND position('>>>>>>>' IN text) > 0
                    THEN 1 ELSE 0 END AS conflict,
                  CASE WHEN NOT (position('<<<<<<<' IN text) > 0
                    AND position('>>>>>>>' IN text) > 0)
                    AND position('=======' IN text) > 0
                    THEN 1 ELSE 0 END AS divider_only
                FROM docs),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(conflict) AS conflict_docs,
                  sum(divider_only) AS divider_only_docs
                FROM c GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(conflict_docs AS BIGINT) AS conflict_docs,
                CAST(divider_only_docs AS BIGINT) AS divider_only_docs,
                CAST(conflict_docs * 10000 // n_docs AS BIGINT)
                  AS conflict_bp,
                CASE WHEN conflict_docs > 0 THEN 'broken_checkout'
                  ELSE 'clean' END AS verdict
              FROM g
              ORDER BY source""")),

    // Base64-blob census: notebooks and JSON dumps smuggle binary
    // payloads (inline images, pickled state) as base64 runs — tokens
    // the model pays for and learns nothing from. Probe: any ≥48-char
    // run of the base64 alphabet (long enough that prose and ids never
    // trip it); census reports affected docs AND the blob byte mass
    // (sum of run lengths — what stripping buys). Dump-infested
    // sources (md5 % 15 = 12) plant one 96-char blob on an ~1/5 draw.
    QEntry("q442_base64_blob_census",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val infested = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 15 === 12
        val blob = concat(lit(" data:image/png;base64,"),
          substring(concat(md5(col("doc_id").cast("string")),
            md5(concat(col("doc_id").cast("string"), lit("x"))),
            md5(concat(col("doc_id").cast("string"), lit("y")))),
            1, 96))
        val corpus = docs.withColumn("text",
          when(infested && draw % 5 === 1, concat(col("text"), blob))
            .otherwise(col("text")))
        corpus
          .withColumn("runs", expr(
            "regexp_extract_all(text, '[A-Za-z0-9+/]{48,}', 0)"))
          .withColumn("blob_docs", (size(col("runs")) > 0).cast("long"))
          .withColumn("blob_bytes", expr(
            "aggregate(runs, 0L, (a, x) -> a + length(x))"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("blob_docs")).as("blob_docs"),
            sum(col("blob_bytes")).as("blob_bytes"))
          .withColumn("blob_bp", expr("blob_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("blob_docs") > 0L, "binary_in_text")
              .otherwise(lit("clean")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 15 = 12
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 4))::BIGINT % 5 = 1
                  THEN text || ' data:image/png;base64,' ||
                    substr(md5(CAST(doc_id AS VARCHAR)) ||
                      md5(CAST(doc_id AS VARCHAR) || 'x') ||
                      md5(CAST(doc_id AS VARCHAR) || 'y'), 1, 96)
                  ELSE text END AS text
                FROM documents),
              c AS (
                SELECT source,
                  regexp_extract_all(text, '[A-Za-z0-9+/]{48,}')
                    AS runs
                FROM docs),
              f AS (
                SELECT source,
                  CASE WHEN len(runs) > 0 THEN 1 ELSE 0 END
                    AS blob_docs,
                  coalesce(list_sum(list_transform(runs,
                    x -> CAST(length(x) AS BIGINT))), 0) AS blob_bytes
                FROM c),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(blob_docs) AS blob_docs,
                  sum(blob_bytes) AS blob_bytes
                FROM f GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(blob_docs AS BIGINT) AS blob_docs,
                CAST(blob_bytes AS BIGINT) AS blob_bytes,
                CAST(blob_docs * 10000 // n_docs AS BIGINT) AS blob_bp,
                CASE WHEN blob_docs > 0 THEN 'binary_in_text'
                  ELSE 'clean' END AS verdict
              FROM g
              ORDER BY source""")),

    // Degenerate-loop scan: the signature failure of synthetic text is
    // the LOOP — the same token emitted 3+ times in a row. Regex
    // backreferences would catch it but RE2 (the oracle's engine) has
    // none, so the probe is exact array arithmetic instead: a doc
    // loops iff some position i has tok[i] = tok[i+1] = tok[i+2]
    // (an indexed exists over the token array — one in-row pass, both
    // engines). The small-vocabulary fixture triples naturally (~3% of
    // docs) and even quadruples once in 500 — so triples/doubles are
    // REPORTED but the verdict keys on 4-run share past 600 bp, which
    // only the planted generator (md5 % 16 = 13, a 4-fold token on an
    // ~1/6 draw ≈ 1667 bp) crosses.
    QEntry("q443_degenerate_loop_scan",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val looping = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 16 === 13
        val corpus = docs.withColumn("text",
          when(looping && draw % 6 === 4,
            concat(col("text"), lit(" buffer buffer buffer buffer")))
            .otherwise(col("text")))
        corpus
          .withColumn("toks", split(lower(col("text")), "\\s+"))
          .withColumn("doubled", expr(
            "exists(sequence(1, greatest(1, size(toks) - 1)), " +
              "i -> toks[i - 1] = toks[i])").cast("long"))
          .withColumn("looped", expr(
            "exists(sequence(1, greatest(1, size(toks) - 2)), " +
              "i -> toks[i - 1] = toks[i] AND toks[i] = toks[i + 1])")
            .cast("long"))
          .withColumn("quad", expr(
            "exists(sequence(1, greatest(1, size(toks) - 3)), " +
              "i -> toks[i - 1] = toks[i] AND toks[i] = toks[i + 1] " +
              "AND toks[i + 1] = toks[i + 2])").cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("doubled")).as("doubled_docs"),
            sum(col("looped")).as("looped_docs"),
            sum(col("quad")).as("quad_docs"))
          .withColumn("quad_bp",
            expr("quad_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("quad_bp") > 600L, "degenerate_generator")
              .otherwise(lit("clean")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 16 = 13
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 4))::BIGINT % 6 = 4
                  THEN text || ' buffer buffer buffer buffer'
                  ELSE text END AS text
                FROM documents),
              t AS (
                SELECT source,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM docs),
              c AS (
                SELECT source,
                  CASE WHEN len(list_filter(range(1, greatest(2,
                      len(toks))), i ->
                      toks[CAST(i AS INT)] = toks[CAST(i + 1 AS INT)]))
                    > 0 THEN 1 ELSE 0 END AS doubled,
                  CASE WHEN len(list_filter(range(1, greatest(2,
                      len(toks) - 1)), i ->
                      toks[CAST(i AS INT)] = toks[CAST(i + 1 AS INT)]
                      AND toks[CAST(i + 1 AS INT)] =
                        toks[CAST(i + 2 AS INT)]))
                    > 0 THEN 1 ELSE 0 END AS looped,
                  CASE WHEN len(list_filter(range(1, greatest(2,
                      len(toks) - 2)), i ->
                      toks[CAST(i AS INT)] = toks[CAST(i + 1 AS INT)]
                      AND toks[CAST(i + 1 AS INT)] =
                        toks[CAST(i + 2 AS INT)]
                      AND toks[CAST(i + 2 AS INT)] =
                        toks[CAST(i + 3 AS INT)]))
                    > 0 THEN 1 ELSE 0 END AS quad
                FROM t),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(doubled) AS doubled_docs,
                  sum(looped) AS looped_docs,
                  sum(quad) AS quad_docs
                FROM c GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(doubled_docs AS BIGINT) AS doubled_docs,
                CAST(looped_docs AS BIGINT) AS looped_docs,
                CAST(quad_docs AS BIGINT) AS quad_docs,
                CAST(quad_docs * 10000 // n_docs AS BIGINT)
                  AS quad_bp,
                CASE WHEN quad_docs * 10000 // n_docs > 600
                  THEN 'degenerate_generator'
                  ELSE 'clean' END AS verdict
              FROM g
              ORDER BY source"""))
  )
}
