package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, seventh batch — tokenizer migration, license
  * propagation through dedup, SFT token yield, judge position bias.
  */
object Pipeline86 {

  val entries: Seq[QEntry] = Seq(

    // Tokenizer-migration impact: swapping tokenizers re-prices every
    // source's token budget, and the DANGER is heterogeneity — if the
    // corpus shrinks 5% on average but one source shrinks 1%, that
    // source's effective mix weight just grew ~4% without anyone
    // deciding it. Old vocab = the 4-merge house BPE (q141), new =
    // 8 merges; greedy BPE determinism makes the 4-merge state a
    // PREFIX of the 8-merge train, so the oracle runs ONE chain and
    // reads both s4 and s8. Per source: tokens under both vocabs
    // (Σ word_count × word_syms over the distinct-word grain — the
    // segment frames are vocabulary-sized, broadcast onto the
    // (source, word) census), shrink per-mille, deviation from the
    // corpus-wide shrink, 'skewed_impact' past 15 pm. All integer
    // (shrink is non-negative: more merges never lengthen a word).
    QEntry("q416_tokenizer_migration",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val segs = graft.pipeline.TextAnalysis
          .bpeSegmentAt(docs, "text", Seq(4, 8))
        val segA = segs(4).select(col("wd"), col("n_syms").as("na"))
        val segB = segs(8).select(col("wd"), col("n_syms").as("nb"))
        val ws = docs
          .select(col("source"),
            explode(split(lower(col("text")), "\\s+")).as("wd"))
          .filter(length(col("wd")) > 0)
          .groupBy(col("source"), col("wd"))
          .agg(count(lit(1)).as("c"))
        val g = ws.join(broadcast(segA), "wd")
          .join(broadcast(segB), "wd")
          .groupBy(col("source"))
          .agg(sum(col("c") * col("na")).as("tokens_old"),
            sum(col("c") * col("nb")).as("tokens_new"))
          .localCheckpoint() // corpus totals + per-source rows
        val tot = g.agg(sum(col("tokens_old")).as("cta"),
          sum(col("tokens_new")).as("ctb"))
        g.crossJoin(broadcast(tot))
          .withColumn("shrink_pm",
            expr("(tokens_old - tokens_new) * 1000 div tokens_old"))
          .withColumn("corpus_shrink_pm",
            expr("(cta - ctb) * 1000 div cta"))
          .withColumn("dev_pm",
            abs(col("shrink_pm") - col("corpus_shrink_pm")))
          .withColumn("verdict",
            when(col("dev_pm") > 15L, "skewed_impact")
              .otherwise(lit("uniform")))
          .select(col("source"), col("tokens_old"), col("tokens_new"),
            col("shrink_pm"), col("corpus_shrink_pm"), col("dev_pm"),
            col("verdict"))
          .orderBy(col("source"))
      },
      Some(Pipeline9.bpeChainSql(8,
        """, ws AS (
             SELECT source, w AS wd, count(*) AS c FROM (
               SELECT source,
                 unnest(string_split_regex(lower(text), '\s+')) AS w
               FROM documents)
             WHERE length(w) > 0 GROUP BY source, w),
           a AS (SELECT wd, count(*) AS na FROM s4 GROUP BY wd),
           b AS (SELECT wd, count(*) AS nb FROM s8 GROUP BY wd),
           g AS (
             SELECT ws.source, sum(ws.c * a.na) AS ta,
               sum(ws.c * b.nb) AS tb
             FROM ws JOIN a USING (wd) JOIN b USING (wd)
             GROUP BY ws.source),
           tot AS (SELECT sum(ta) AS cta, sum(tb) AS ctb FROM g)
           SELECT g.source, CAST(g.ta AS BIGINT) AS tokens_old,
             CAST(g.tb AS BIGINT) AS tokens_new,
             CAST((g.ta - g.tb) * 1000 // g.ta AS BIGINT) AS shrink_pm,
             CAST((tot.cta - tot.ctb) * 1000 // tot.cta AS BIGINT)
               AS corpus_shrink_pm,
             CAST(abs((g.ta - g.tb) * 1000 // g.ta -
               (tot.cta - tot.ctb) * 1000 // tot.cta) AS BIGINT)
               AS dev_pm,
             CASE WHEN abs((g.ta - g.tb) * 1000 // g.ta -
               (tot.cta - tot.ctb) * 1000 // tot.cta) > 15
               THEN 'skewed_impact' ELSE 'uniform' END AS verdict
           FROM g, tot ORDER BY g.source"""))),

    // License-aware dedup gate: a release filtered to permissive +
    // attribution licenses is still contaminated if an exact-dup
    // CLUSTER contains any restricted copy — the permissive label on
    // one copy doesn't launder content that also ships under a
    // restricted license (the conservative gate every compliance
    // review applies). Shape: license dim from an md5 draw (50/25/15/
    // 10 permissive/attribution/noncommercial/restricted), cluster =
    // text digest, one digest-grain poison census joined back, one
    // source census with drop-reason attribution. Plant: an ~1/9 doc
    // draw re-publishes through 'shadow_lib' with license FORCED
    // restricted — poisoning the base copies' clusters, which is
    // exactly what the cluster_poison column must read back.
    QEntry("q417_license_dedup_gate",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val lic = (draw % 20)
        val corpus = base
          .withColumn("license",
            when(lic < 10L, "permissive")
              .when(lic < 15L, "attribution")
              .when(lic < 18L, "noncommercial")
              .otherwise(lit("restricted")))
          .union(base.filter(draw % 9 === 2)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              lit("shadow_lib").as("source"), col("text"))
            .withColumn("license", lit("restricted")))
          .withColumn("h", md5(col("text")))
        val poison = corpus.groupBy(col("h"))
          .agg(max((col("license") === "restricted" ||
            col("license") === "noncommercial").cast("long"))
            .as("poisoned"))
        corpus.join(poison, "h")
          .withColumn("own_ok",
            (col("license") === "permissive" ||
              col("license") === "attribution").cast("long"))
          .withColumn("kept",
            (col("own_ok") === 1L && col("poisoned") === 0L)
              .cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("kept")).as("kept"),
            sum(when(col("own_ok") === 0L, 1L).otherwise(0L))
              .as("dropped_own_license"),
            sum(when(col("own_ok") === 1L && col("poisoned") === 1L,
              1L).otherwise(0L)).as("dropped_cluster_poison"))
          .withColumn("kept_bp", expr("kept * 10000 div n_docs"))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              corpus AS (
                SELECT doc_id, source, text,
                  CASE WHEN draw % 20 < 10 THEN 'permissive'
                       WHEN draw % 20 < 15 THEN 'attribution'
                       WHEN draw % 20 < 18 THEN 'noncommercial'
                       ELSE 'restricted' END AS license
                FROM base
                UNION ALL
                SELECT doc_id + 10000000, 'shadow_lib', text,
                  'restricted'
                FROM base WHERE draw % 9 = 2),
              cl AS (
                SELECT *, md5(text) AS h FROM corpus),
              poison AS (
                SELECT h, max(CASE WHEN license IN
                  ('restricted', 'noncommercial') THEN 1 ELSE 0 END)
                  AS poisoned
                FROM cl GROUP BY h),
              f AS (
                SELECT cl.source,
                  CASE WHEN cl.license IN ('permissive', 'attribution')
                    THEN 1 ELSE 0 END AS own_ok,
                  p.poisoned
                FROM cl JOIN poison p USING (h)),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(CASE WHEN own_ok = 1 AND poisoned = 0
                    THEN 1 ELSE 0 END) AS kept,
                  sum(CASE WHEN own_ok = 0 THEN 1 ELSE 0 END)
                    AS dropped_own_license,
                  sum(CASE WHEN own_ok = 1 AND poisoned = 1
                    THEN 1 ELSE 0 END) AS dropped_cluster_poison
                FROM f GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(kept AS BIGINT) AS kept,
                CAST(dropped_own_license AS BIGINT)
                  AS dropped_own_license,
                CAST(dropped_cluster_poison AS BIGINT)
                  AS dropped_cluster_poison,
                CAST(kept * 10000 // n_docs AS BIGINT) AS kept_bp
              FROM g
              ORDER BY source""")),

    // SFT token-yield census: in supervised fine-tuning only RESPONSE
    // tokens carry loss — prompt tokens and chat-template overhead are
    // paid for (storage, attention, wall-clock) but never trained on,
    // so a source whose examples are mostly prompt is compute-dilute
    // regardless of quality. Per doc: prompt = the first 4 + draw%5
    // tokens, response = the rest, template overhead = 6 tokens/turn
    // flat; per source: the three masses and trainable yield in bp.
    // Plant: verbose-prompt sources (md5 % 11 = 4) consume 4/5 of
    // each example's tokens as prompt — they page 'low_yield'
    // (< 4000 bp) while normal sources sit well above.
    QEntry("q418_sft_token_yield",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            size(split(lower(col("text")), "\\s+")).cast("long")
              .as("n_tok"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val verbose = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 11 === 4
        docs
          .withColumn("p_tok",
            when(verbose, expr("n_tok * 4 div 5"))
              .otherwise(least(col("n_tok") - 1L, lit(4L) + draw % 5)))
          .withColumn("r_tok", col("n_tok") - col("p_tok"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_examples"),
            sum(col("p_tok")).as("prompt_tokens"),
            sum(col("r_tok")).as("response_tokens"),
            (count(lit(1)) * 6L).as("overhead_tokens"))
          .withColumn("yield_bp",
            expr("response_tokens * 10000 div " +
              "(prompt_tokens + response_tokens + overhead_tokens)"))
          .withColumn("verdict",
            when(col("yield_bp") < 4000L, "low_yield")
              .otherwise(lit("ok")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS n_tok,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 11 = 4
                    AS is_verbose
                FROM documents),
              f AS (
                SELECT source, n_tok,
                  CASE WHEN is_verbose THEN n_tok * 4 // 5
                    ELSE least(n_tok - 1, 4 + draw % 5) END AS p_tok
                FROM docs),
              g AS (
                SELECT source, count(*) AS n_examples,
                  sum(p_tok) AS prompt_tokens,
                  sum(n_tok - p_tok) AS response_tokens,
                  count(*) * 6 AS overhead_tokens
                FROM f GROUP BY source)
              SELECT source, CAST(n_examples AS BIGINT) AS n_examples,
                CAST(prompt_tokens AS BIGINT) AS prompt_tokens,
                CAST(response_tokens AS BIGINT) AS response_tokens,
                CAST(overhead_tokens AS BIGINT) AS overhead_tokens,
                CAST(response_tokens * 10000 // (prompt_tokens +
                  response_tokens + overhead_tokens) AS BIGINT)
                  AS yield_bp,
                CASE WHEN response_tokens * 10000 // (prompt_tokens +
                  response_tokens + overhead_tokens) < 4000
                  THEN 'low_yield' ELSE 'ok' END AS verdict
              FROM g
              ORDER BY source""")),

    // Judge position-bias audit: pairwise preference evals are judged
    // by a panel, and a judge who systematically prefers the FIRST
    // position corrupts every downstream Elo/Bradley-Terry fit (q233)
    // no matter how good the responses are — the standard control is
    // an exact binomial test on first-position win rate. Judges =
    // doc_id % 6 panel; honest judges flip an md5 coin, biased judges
    // (md5(judge) % 4 = 0) prefer position A on ~9/10 draws. The flag
    // is integer-exact: (2·wins_a − n)² > 9·n is |z| > 3 with no
    // square root — tight enough that an honest judge's ~50% never
    // trips at fixture sizes, loose enough that 90% always does.
    QEntry("q419_judge_position_bias",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val judged = docs
          .withColumn("judge",
            concat(lit("j"), col("doc_id") % 6))
          .withColumn("biased",
            conv(substring(md5(col("judge")), 1, 2), 16, 10)
              .cast("long") % 4 === 0)
          .withColumn("wins_a",
            when(col("biased"), (draw % 10 =!= 7).cast("long"))
              .otherwise((draw % 2 === 0).cast("long")))
        judged.groupBy(col("judge"))
          .agg(count(lit(1)).as("n_judgments"),
            sum(col("wins_a")).as("wins_a"))
          .withColumn("prefer_a_bp",
            expr("wins_a * 10000 div n_judgments"))
          .withColumn("verdict",
            when(expr("(2 * wins_a - n_judgments) * " +
              "(2 * wins_a - n_judgments) > 9 * n_judgments"),
              "position_biased").otherwise(lit("ok")))
          .orderBy(col("judge"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, 'j' || (doc_id % 6) AS judge,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              j AS (
                SELECT judge,
                  CASE WHEN ('0x' || substr(md5(judge), 1, 2))::BIGINT
                      % 4 = 0
                    THEN CASE WHEN draw % 10 != 7 THEN 1 ELSE 0 END
                    ELSE CASE WHEN draw % 2 = 0 THEN 1 ELSE 0 END
                  END AS wins_a
                FROM docs),
              g AS (
                SELECT judge, count(*) AS n, sum(wins_a) AS wa
                FROM j GROUP BY judge)
              SELECT judge, CAST(n AS BIGINT) AS n_judgments,
                CAST(wa AS BIGINT) AS wins_a,
                CAST(wa * 10000 // n AS BIGINT) AS prefer_a_bp,
                CASE WHEN (2 * wa - n) * (2 * wa - n) > 9 * n
                  THEN 'position_biased' ELSE 'ok' END AS verdict
              FROM g
              ORDER BY judge"""))
  )
}
