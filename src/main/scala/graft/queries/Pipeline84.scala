package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, fifth batch — the post-training data surface:
  * normalization-ladder dedup, script spoofing, chat-structure and
  * preference-pair integrity. All four are per-source hygiene censuses
  * a 100 TB curation run executes between ingest and release; all four
  * are scan-linear with shuffles only on digests or the source dim.
  */
object Pipeline84 {

  val entries: Seq[QEntry] = Seq(

    // Dedup normalization ladder: exact dedup is only rung 0 — real
    // corpora hide duplicates behind case, punctuation/whitespace and
    // version digits (CCNet/RefinedWeb both dedup on a NORMALIZED
    // digest for exactly this reason). This census answers "what does
    // each extra normalization rung BUY" before anyone pays near-dup
    // prices: rung 0 raw bytes, rung 1 casefold, rung 2 punct+ws
    // collapse, rung 3 digit mask. Shape: ONE corpus scan computing
    // all four digests per doc, one multi-distinct agg (Spark expands
    // ×4 on 16-byte digests, never on text), a 4-row KV explode.
    // Plants (md5 doc draws, disjoint mods): ~1/7 re-published
    // SHOUTING (caught at rung 1), ~1/11 with padding + trailing
    // bangs (rung 2), ~1/13 as a "rev 1"/"rev 2" pair (collide with
    // each other at rung 3, never with the base).
    QEntry("q408_dedup_ladder",
      (s, d) => {
        val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 7 === 0)
            .select(col("doc_id") + 10000000L, upper(col("text"))))
          .union(base.filter(draw % 11 === 3)
            .select(col("doc_id") + 20000000L,
              concat(lit(" "), col("text"), lit(" !!"))))
          .union(base.filter(draw % 13 === 5)
            .select(col("doc_id") + 30000000L,
              concat(col("text"), lit(" rev 1"))))
          .union(base.filter(draw % 13 === 5)
            .select(col("doc_id") + 40000000L,
              concat(col("text"), lit(" rev 2"))))
        // rungs 2/3 run the fused byte-scan kernel (PunctWs) — the
        // regex formulation it replaces (and which the oracle runs)
        // was 95%+ of the query's wall at the 100× replica
        val ladder = corpus.select(
          md5(col("text")).as("h0"),
          md5(lower(col("text"))).as("h1"),
          md5(graft.expressions.functions.punct_ws_normalize(
            col("text"), maskDigits = false)).as("h2"),
          md5(graft.expressions.functions.punct_ws_normalize(
            col("text"), maskDigits = true)).as("h3"))
        ladder.agg(count(lit(1)).as("n"),
            countDistinct(col("h0")).as("d0"),
            countDistinct(col("h1")).as("d1"),
            countDistinct(col("h2")).as("d2"),
            countDistinct(col("h3")).as("d3"))
          .select(explode(array(
            struct(lit(0L).as("rung"), lit("raw").as("rung_name"),
              col("d0").as("distinct_texts"),
              (col("n") - col("d0")).as("dup_docs"),
              (col("n") - col("d0")).as("marginal_caught")),
            struct(lit(1L).as("rung"), lit("casefold").as("rung_name"),
              col("d1").as("distinct_texts"),
              (col("n") - col("d1")).as("dup_docs"),
              (col("d0") - col("d1")).as("marginal_caught")),
            struct(lit(2L).as("rung"), lit("punct_ws").as("rung_name"),
              col("d2").as("distinct_texts"),
              (col("n") - col("d2")).as("dup_docs"),
              (col("d1") - col("d2")).as("marginal_caught")),
            struct(lit(3L).as("rung"), lit("digit_mask").as("rung_name"),
              col("d3").as("distinct_texts"),
              (col("n") - col("d3")).as("dup_docs"),
              (col("d2") - col("d3")).as("marginal_caught"))))
            .as("r"))
          .select(col("r.rung"), col("r.rung_name"),
            col("r.distinct_texts"), col("r.dup_docs"),
            col("r.marginal_caught"))
          .orderBy(col("rung"))
      },
      Some("""WITH base AS (SELECT doc_id, text FROM documents),
              corpus AS (
                SELECT doc_id, text FROM base
                UNION ALL
                SELECT doc_id + 10000000, upper(text) FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 7 = 0
                UNION ALL
                SELECT doc_id + 20000000, ' ' || text || ' !!' FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 11 = 3
                UNION ALL
                SELECT doc_id + 30000000, text || ' rev 1' FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 13 = 5
                UNION ALL
                SELECT doc_id + 40000000, text || ' rev 2' FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 13 = 5),
              lad AS (
                SELECT md5(text) AS h0, md5(lower(text)) AS h1,
                  md5(trim(regexp_replace(regexp_replace(lower(text),
                    '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))) AS h2,
                  md5(regexp_replace(trim(regexp_replace(regexp_replace(
                    lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ',
                    'g')), '[0-9]', '#', 'g')) AS h3
                FROM corpus),
              a AS (
                SELECT count(*) AS n, count(DISTINCT h0) AS d0,
                  count(DISTINCT h1) AS d1, count(DISTINCT h2) AS d2,
                  count(DISTINCT h3) AS d3
                FROM lad)
              SELECT rung, rung_name,
                CAST(distinct_texts AS BIGINT) AS distinct_texts,
                CAST(dup_docs AS BIGINT) AS dup_docs,
                CAST(marginal_caught AS BIGINT) AS marginal_caught
              FROM (
                SELECT 0 AS rung, 'raw' AS rung_name, d0 AS distinct_texts,
                  n - d0 AS dup_docs, n - d0 AS marginal_caught FROM a
                UNION ALL
                SELECT 1, 'casefold', d1, n - d1, d0 - d1 FROM a
                UNION ALL
                SELECT 2, 'punct_ws', d2, n - d2, d1 - d2 FROM a
                UNION ALL
                SELECT 3, 'digit_mask', d3, n - d3, d2 - d3 FROM a)
              ORDER BY rung""")),

    // Mixed-script / homoglyph audit: Cyrillic letters INSIDE Latin
    // words are the classic spam/SEO-cloak signature (a "clоud" whose
    // o is U+043E defeats exact blocklists and poisons tokenizers),
    // while a genuinely multilingual source mixes scripts at WORD
    // grain — the census must tell them apart, because one gets
    // dropped and the other kept. Two regex probes per doc (adjacency
    // = homoglyph; co-presence = mixed), one source census — zero
    // shuffle before the source dim. Plants: spoofed sources
    // (md5 % 6 = 0) append a homoglyph token on an ~1/9 doc draw;
    // multilingual sources (md5 % 6 = 1) append a PURE Cyrillic word
    // on the same draw — flagged 'multilingual', never 'spoofed'.
    QEntry("q409_script_mix_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val srcMod = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 6
        val corpus = docs.withColumn("text",
          concat(col("text"),
            when(srcMod === 0 && draw % 9 === 0,
              lit(" clоud")).otherwise(lit("")),
            when(srcMod === 1 && draw % 9 === 0,
              lit(" привет"))
              .otherwise(lit(""))))
        corpus
          .withColumn("has_cyr",
            col("text").rlike("[а-я]").cast("long"))
          .withColumn("has_lat",
            col("text").rlike("[A-Za-z]").cast("long"))
          .withColumn("homoglyph",
            col("text").rlike(
              "([A-Za-z][а-я])|([а-я][A-Za-z])")
              .cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("has_cyr") * col("has_lat")).as("mixed_docs"),
            sum(col("homoglyph")).as("homoglyph_docs"))
          .withColumn("mixed_bp",
            expr("mixed_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("homoglyph_docs") > 0L, "spoofed")
              .when(col("mixed_docs") > 0L, "multilingual")
              .otherwise(lit("clean")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  text ||
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 6 = 0
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 4))::BIGINT % 9 = 0
                    THEN ' clоud' ELSE '' END ||
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 6 = 1
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                      1, 4))::BIGINT % 9 = 0
                    THEN ' привет'
                    ELSE '' END AS text
                FROM documents),
              c AS (
                SELECT source,
                  CASE WHEN regexp_matches(text, '[а-я]')
                    THEN 1 ELSE 0 END AS has_cyr,
                  CASE WHEN regexp_matches(text, '[A-Za-z]')
                    THEN 1 ELSE 0 END AS has_lat,
                  CASE WHEN regexp_matches(text,
                    '([A-Za-z][а-я])|([а-я][A-Za-z])')
                    THEN 1 ELSE 0 END AS hg
                FROM docs),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(has_cyr * has_lat) AS mixed_docs,
                  sum(hg) AS homoglyph_docs
                FROM c GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(mixed_docs AS BIGINT) AS mixed_docs,
                CAST(homoglyph_docs AS BIGINT) AS homoglyph_docs,
                CAST(mixed_docs * 10000 // n_docs AS BIGINT) AS mixed_bp,
                CASE WHEN homoglyph_docs > 0 THEN 'spoofed'
                     WHEN mixed_docs > 0 THEN 'multilingual'
                     ELSE 'clean' END AS verdict
              FROM g
              ORDER BY source""")),

    // Conversation-structure audit: post-training corpora are TURN
    // sequences, not flat text, and a malformed feed (two user turns
    // in a row, an empty assistant reply, a conversation that ends on
    // the user) silently teaches the template instead of the task —
    // every SFT ingest validates structure BEFORE tokenization. The
    // Spark side exercises the real plumbing: conversations are built
    // as typed turn arrays, serialized with to_json (the wire format),
    // parsed back with from_json, and validated with array lambdas
    // (exists/element_at) — per-conversation flags, one source census.
    // Plants: feed-broken sources (md5 % 7 = 0) emit, on disjoint
    // ~1/12 draws, a double-user conversation, an empty assistant
    // turn, and a user-terminated conversation; everyone else emits
    // valid 4-turn user/assistant alternations. The oracle rebuilds
    // the ROLE SEQUENCES and re-derives every flag from them with
    // list lambdas (not from the plant labels).
    QEntry("q410_conversation_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val bad = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 7 === 0
        def turn(role: String, p: Int) =
          struct(lit(role).as("role"),
            concat(lit("m"), col("doc_id"), lit("_" + p)).as("content"))
        def emptyTurn(role: String) =
          struct(lit(role).as("role"), lit("").as("content"))
        val m = draw % 12
        val wire = docs.withColumn("conv_json", to_json(
          when(bad && m === 1, array(turn("user", 0), turn("user", 1),
            turn("assistant", 2), turn("assistant", 3)))
            .when(bad && m === 2, array(turn("user", 0),
              emptyTurn("assistant"), turn("user", 2),
              turn("assistant", 3)))
            .when(bad && m === 3, array(turn("user", 0),
              turn("assistant", 1), turn("user", 2)))
            .otherwise(array(turn("user", 0), turn("assistant", 1),
              turn("user", 2), turn("assistant", 3)))))
        wire
          .withColumn("turns", from_json(col("conv_json"),
            lit("array<struct<role:string,content:string>>")))
          .withColumn("alt_bad", expr(
            "exists(sequence(0, size(turns) - 1), " +
              "i -> turns[i].role != IF(i % 2 = 0, 'user', 'assistant'))")
            .cast("long"))
          .withColumn("empty_bad",
            expr("exists(turns, t -> length(t.content) = 0)")
              .cast("long"))
          .withColumn("end_bad",
            (element_at(col("turns"), -1).getField("role")
              =!= "assistant").cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_convs"),
            sum(col("alt_bad")).as("alt_violations"),
            sum(col("empty_bad")).as("empty_turns"),
            sum(col("end_bad")).as("bad_endings"),
            sum(when(col("alt_bad") + col("empty_bad") + col("end_bad")
              === 0L, 1L).otherwise(0L)).as("valid_convs"))
          .withColumn("valid_bp",
            expr("valid_convs * 10000 div n_convs"))
          .withColumn("verdict",
            when(col("valid_bp") < 9000L, "malformed_feed")
              .otherwise(lit("well_formed")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 7 = 0
                    AS bad,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT % 12 AS m
                FROM documents),
              conv AS (
                SELECT source,
                  CASE WHEN bad AND m = 1
                    THEN ['user', 'user', 'assistant', 'assistant']
                  WHEN bad AND m = 3
                    THEN ['user', 'assistant', 'user']
                  ELSE ['user', 'assistant', 'user', 'assistant']
                  END AS roles,
                  CASE WHEN bad AND m = 2 THEN 1 ELSE 0 END AS has_empty
                FROM docs),
              f AS (
                SELECT source,
                  CASE WHEN len(list_filter(list_transform(roles,
                    (r, i) -> r != CASE WHEN (i - 1) % 2 = 0
                      THEN 'user' ELSE 'assistant' END), x -> x)) > 0
                    THEN 1 ELSE 0 END AS alt_bad,
                  has_empty AS empty_bad,
                  CASE WHEN roles[len(roles)] != 'assistant'
                    THEN 1 ELSE 0 END AS end_bad
                FROM conv),
              g AS (
                SELECT source, count(*) AS n_convs,
                  sum(alt_bad) AS alt_violations,
                  sum(empty_bad) AS empty_turns,
                  sum(end_bad) AS bad_endings,
                  sum(CASE WHEN alt_bad + empty_bad + end_bad = 0
                    THEN 1 ELSE 0 END) AS valid_convs
                FROM f GROUP BY source)
              SELECT source, CAST(n_convs AS BIGINT) AS n_convs,
                CAST(alt_violations AS BIGINT) AS alt_violations,
                CAST(empty_turns AS BIGINT) AS empty_turns,
                CAST(bad_endings AS BIGINT) AS bad_endings,
                CAST(valid_convs AS BIGINT) AS valid_convs,
                CAST(valid_convs * 10000 // n_convs AS BIGINT)
                  AS valid_bp,
                CASE WHEN valid_convs * 10000 // n_convs < 9000
                     THEN 'malformed_feed' ELSE 'well_formed' END
                  AS verdict
              FROM g
              ORDER BY source""")),

    // Preference-pair integrity audit: RLHF/DPO data fails in three
    // quiet ways — degenerate pairs (chosen == rejected teach
    // nothing), duplicated prompts (one prompt over-weighted and a
    // train/eval leak vector), and LENGTH BIAS (when 'chosen' is
    // simply the longer answer, the reward model learns verbosity) —
    // and all three are per-source census questions, not model
    // questions. Shape: synthesize (prompt, chosen, rejected) per doc,
    // group once to (source, prompt) grain — which yields dup-prompt
    // mass for free — then roll up to the source dim. Plants: biased
    // sources (md5 % 5 = 1) always choose the longer response
    // (10000 bp vs ~5000 unbiased); ~1/17 pairs are degenerate;
    // ~1/19 share one literal prompt (plus any natural first-6-word
    // collisions — exact-dup texts exist in the fixture by design).
    QEntry("q411_preference_pair_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val biased = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 5 === 1
        val longResp = concat(lit("ans "), col("doc_id"),
          lit(" detailed response with many extra tokens appended"))
        val shortResp = concat(lit("ans "), col("doc_id"), lit(" brief"))
        val pairs = docs
          .withColumn("prompt",
            when(draw % 19 === 6, lit("shared onboarding prompt"))
              .otherwise(array_join(
                slice(split(lower(col("text")), "\\s+"), 1, 6), " ")))
          .withColumn("chosen",
            when(biased || draw % 2 === 0, longResp)
              .otherwise(shortResp))
          .withColumn("rejected",
            when(draw % 17 === 4,
              when(biased || draw % 2 === 0, longResp)
                .otherwise(shortResp))
              .otherwise(when(biased || draw % 2 === 0, shortResp)
                .otherwise(longResp)))
        val gp = pairs
          .withColumn("degen",
            (col("chosen") === col("rejected")).cast("long"))
          .withColumn("longer",
            when(col("degen") === 1L, 0L)
              .otherwise((length(col("chosen")) >
                length(col("rejected"))).cast("long")))
          .groupBy(col("source"), md5(col("prompt")).as("p"))
          .agg(count(lit(1)).as("k"), sum(col("degen")).as("dg"),
            sum(col("longer")).as("lg"))
        gp.groupBy(col("source"))
          .agg(sum(col("k")).as("n_pairs"),
            sum(col("dg")).as("degenerate_pairs"),
            sum(when(col("k") > 1L, col("k")).otherwise(0L))
              .as("dup_prompt_pairs"),
            sum(col("lg")).as("longer_chosen"))
          .withColumn("longer_chosen_bp",
            expr("longer_chosen * 10000 div " +
              "greatest(1L, n_pairs - degenerate_pairs)"))
          .withColumn("verdict",
            when(col("longer_chosen_bp") >= 9000L, "length_biased")
              .otherwise(lit("ok")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 5 = 1
                    AS biased
                FROM documents),
              pairs AS (
                SELECT source,
                  CASE WHEN draw % 19 = 6 THEN 'shared onboarding prompt'
                    ELSE array_to_string(string_split_regex(lower(text),
                      '\s+')[1:6], ' ') END AS prompt,
                  CASE WHEN biased OR draw % 2 = 0
                    THEN 'ans ' || doc_id ||
                      ' detailed response with many extra tokens appended'
                    ELSE 'ans ' || doc_id || ' brief' END AS chosen,
                  CASE WHEN draw % 17 = 4 THEN
                    CASE WHEN biased OR draw % 2 = 0
                      THEN 'ans ' || doc_id ||
                        ' detailed response with many extra tokens appended'
                      ELSE 'ans ' || doc_id || ' brief' END
                  ELSE
                    CASE WHEN biased OR draw % 2 = 0
                      THEN 'ans ' || doc_id || ' brief'
                      ELSE 'ans ' || doc_id ||
                        ' detailed response with many extra tokens appended'
                      END
                  END AS rejected
                FROM docs),
              f AS (
                SELECT source, md5(prompt) AS p,
                  CASE WHEN chosen = rejected THEN 1 ELSE 0 END AS degen,
                  CASE WHEN chosen != rejected
                    AND len(chosen) > len(rejected)
                    THEN 1 ELSE 0 END AS longer
                FROM pairs),
              gp AS (
                SELECT source, p, count(*) AS k, sum(degen) AS dg,
                  sum(longer) AS lg
                FROM f GROUP BY source, p),
              g AS (
                SELECT source, sum(k) AS n_pairs, sum(dg) AS degen,
                  sum(CASE WHEN k > 1 THEN k ELSE 0 END) AS dup_pairs,
                  sum(lg) AS longer_chosen
                FROM gp GROUP BY source)
              SELECT source, CAST(n_pairs AS BIGINT) AS n_pairs,
                CAST(degen AS BIGINT) AS degenerate_pairs,
                CAST(dup_pairs AS BIGINT) AS dup_prompt_pairs,
                CAST(longer_chosen AS BIGINT) AS longer_chosen,
                CAST(longer_chosen * 10000 //
                  greatest(1, n_pairs - degen) AS BIGINT)
                  AS longer_chosen_bp,
                CASE WHEN longer_chosen * 10000 //
                  greatest(1, n_pairs - degen) >= 9000
                  THEN 'length_biased' ELSE 'ok' END AS verdict
              FROM g
              ORDER BY source"""))
  )
}
