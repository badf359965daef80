package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, eighth batch — instruction diversity, tool-call
  * schema hygiene, truncation forensics, dup-cluster provenance.
  */
object Pipeline87 {

  val entries: Seq[QEntry] = Seq(

    // Instruction-verb diversity: an SFT mix where every prompt starts
    // "write …" teaches one task shape no matter how many rows it has
    // — the Self-Instruct-style control is the leading-verb
    // distribution per source: top-verb share plus Shannon entropy in
    // micro-nats (the q390 ln convention: shares as ppm integers, ln
    // rounded to 1e-6 — cross-engine-stable). Verbs are drawn from an
    // 8-verb panel (uniform ≈ 1250 bp top share, entropy ≈ ln 8 ≈
    // 2.079e6 micro-nats); template-farm sources (md5 % 10 = 6) force
    // 'write' on 2/3 of draws → top share ~6700 bp, entropy collapses,
    // verdict 'templated' past 5000 bp.
    QEntry("q420_instruction_diversity",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val templated = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 10 === 6
        val panel = array(lit("write"), lit("explain"), lit("summarize"),
          lit("translate"), lit("classify"), lit("extract"),
          lit("compare"), lit("rewrite"))
        val verbs = docs.withColumn("verb",
          when(templated && draw % 3 =!= 0, lit("write"))
            .otherwise(element_at(panel, (draw % 8 + 1).cast("int"))))
        val vc = verbs.groupBy(col("source"), col("verb"))
          .agg(count(lit(1)).as("c"))
        val tot = vc.groupBy(col("source")).agg(sum(col("c")).as("n"))
        vc.join(broadcast(tot), "source")
          .withColumn("p_ppm", expr("c * 1000000 div n"))
          // greatest(1, p_ppm) guards the log for a verb whose share
          // floors to 0 ppm (source with >1M prompts — not reachable
          // on the checked-in fixtures): the entropy term's limit is
          // 0 there anyway (p·ln(1/p) → 0), and without the clamp
          // ln(1e6/0) is infinite on both engines (ADVICE r15).
          .withColumn("term_micro",
            expr("p_ppm * CAST(round(ln(1000000.0 / " +
              "greatest(1, p_ppm)) * 1000000.0) AS BIGINT) " +
              "div 1000000"))
          .groupBy(col("source"))
          .agg(max(col("n")).as("n_prompts"),
            count(lit(1)).as("n_verbs"),
            expr("max(c) * 10000 div max(n)").as("top_verb_bp"),
            sum(col("term_micro")).as("entropy_micro"))
          .withColumn("verdict",
            when(col("top_verb_bp") > 5000L, "templated")
              .otherwise(lit("diverse")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 10 = 6
                    AS templated
                FROM documents),
              verbs AS (
                SELECT source,
                  CASE WHEN templated AND draw % 3 != 0 THEN 'write'
                    ELSE (['write', 'explain', 'summarize', 'translate',
                      'classify', 'extract', 'compare', 'rewrite'])
                      [draw % 8 + 1]
                  END AS verb
                FROM docs),
              vc AS (
                SELECT source, verb, count(*) AS c
                FROM verbs GROUP BY source, verb),
              tot AS (SELECT source, sum(c) AS n FROM vc GROUP BY source),
              terms AS (
                SELECT vc.source, vc.c, t.n,
                  c * 1000000 // n AS p_ppm,
                  (c * 1000000 // n) * CAST(round(ln(1000000.0 /
                    greatest(1, c * 1000000 // n)) * 1000000.0)
                    AS BIGINT)
                    // 1000000 AS term_micro
                FROM vc JOIN tot t USING (source)),
              g AS (
                SELECT source, max(n) AS n_prompts, count(*) AS n_verbs,
                  max(c) * 10000 // max(n) AS top_verb_bp,
                  sum(term_micro) AS entropy_micro
                FROM terms GROUP BY source)
              SELECT source, CAST(n_prompts AS BIGINT) AS n_prompts,
                CAST(n_verbs AS BIGINT) AS n_verbs,
                CAST(top_verb_bp AS BIGINT) AS top_verb_bp,
                CAST(entropy_micro AS BIGINT) AS entropy_micro,
                CASE WHEN top_verb_bp > 5000 THEN 'templated'
                  ELSE 'diverse' END AS verdict
              FROM g
              ORDER BY source""")),

    // Tool-call schema audit: agentic training data is function-call
    // JSON, and the three quiet corruptions — a required argument
    // missing, a wrong-typed argument, a function name outside the
    // registry — each poison the model differently (hallucinated
    // defaults, schema drift, phantom tools), so the census reports
    // them separately per source. Validation runs on the JSON wire
    // form with path extraction (get_json_object — the engine's JSON
    // surface, replayed by DuckDB's json_extract_string): registry
    // membership, arg presence, integer-typed k. Broken-feed sources
    // (md5 % 8 = 5) plant each corruption on disjoint ~1/12 draws.
    QEntry("q421_toolcall_schema_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val broken = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 8 === 5
        val m = draw % 12
        val q = col("doc_id").cast("string")
        val wire = docs.withColumn("call",
          when(broken && m === 1, concat(
            lit("""{"name":"search","args":{"query":"q"""), q,
            lit(""""}}""")))
            .when(broken && m === 2, concat(
              lit("""{"name":"search","args":{"query":"q"""), q,
              lit("""","k":"three"}}""")))
            .when(broken && m === 3, concat(
              lit("""{"name":"serach","args":{"query":"q"""), q,
              lit("""","k":3}}""")))
            .otherwise(concat(
              lit("""{"name":"search","args":{"query":"q"""), q,
              lit("""","k":3}}"""))))
        wire
          .withColumn("fn", get_json_object(col("call"), "$.name"))
          .withColumn("qry", get_json_object(col("call"), "$.args.query"))
          .withColumn("kraw", get_json_object(col("call"), "$.args.k"))
          .withColumn("unknown_fn",
            (!col("fn").isin("search", "fetch", "calc")).cast("long"))
          .withColumn("missing_arg",
            (col("qry").isNull || col("kraw").isNull).cast("long"))
          .withColumn("bad_type",
            (col("kraw").isNotNull &&
              !col("kraw").rlike("^[0-9]+$")).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_calls"),
            sum(col("unknown_fn")).as("unknown_fn"),
            sum(col("missing_arg")).as("missing_arg"),
            sum(col("bad_type")).as("bad_type"),
            sum(when(col("unknown_fn") + col("missing_arg") +
              col("bad_type") === 0L, 1L).otherwise(0L))
              .as("valid_calls"))
          .withColumn("valid_bp",
            expr("valid_calls * 10000 div n_calls"))
          .withColumn("verdict",
            when(col("valid_bp") < 9000L, "broken_feed")
              .otherwise(lit("well_formed")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT % 12 AS m,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 8 = 5
                    AS broken
                FROM documents),
              wire AS (
                SELECT source,
                  CASE
                    WHEN broken AND m = 1 THEN
                      '{"name":"search","args":{"query":"q' || doc_id
                        || '"}}'
                    WHEN broken AND m = 2 THEN
                      '{"name":"search","args":{"query":"q' || doc_id
                        || '","k":"three"}}'
                    WHEN broken AND m = 3 THEN
                      '{"name":"serach","args":{"query":"q' || doc_id
                        || '","k":3}}'
                    ELSE
                      '{"name":"search","args":{"query":"q' || doc_id
                        || '","k":3}}'
                  END AS call
                FROM docs),
              f AS (
                SELECT source,
                  CASE WHEN json_extract_string(call, '$.name') NOT IN
                    ('search', 'fetch', 'calc') THEN 1 ELSE 0 END
                    AS unknown_fn,
                  CASE WHEN json_extract_string(call, '$.args.query')
                      IS NULL
                    OR json_extract_string(call, '$.args.k') IS NULL
                    THEN 1 ELSE 0 END AS missing_arg,
                  CASE WHEN json_extract_string(call, '$.args.k')
                      IS NOT NULL
                    AND NOT regexp_matches(json_extract_string(call,
                      '$.args.k'), '^[0-9]+$')
                    THEN 1 ELSE 0 END AS bad_type
                FROM wire),
              g AS (
                SELECT source, count(*) AS n_calls,
                  sum(unknown_fn) AS unknown_fn,
                  sum(missing_arg) AS missing_arg,
                  sum(bad_type) AS bad_type,
                  sum(CASE WHEN unknown_fn + missing_arg + bad_type = 0
                    THEN 1 ELSE 0 END) AS valid_calls
                FROM f GROUP BY source)
              SELECT source, CAST(n_calls AS BIGINT) AS n_calls,
                CAST(unknown_fn AS BIGINT) AS unknown_fn,
                CAST(missing_arg AS BIGINT) AS missing_arg,
                CAST(bad_type AS BIGINT) AS bad_type,
                CAST(valid_calls AS BIGINT) AS valid_calls,
                CAST(valid_calls * 10000 // n_calls AS BIGINT)
                  AS valid_bp,
                CASE WHEN valid_calls * 10000 // n_calls < 9000
                  THEN 'broken_feed' ELSE 'well_formed' END AS verdict
              FROM g
              ORDER BY source""")),

    // Truncation audit: ingestion that chops documents at a byte cap
    // leaves two fingerprints — the terminal punctuation disappears
    // and lengths pile up AT the cap — and truncated text teaches the
    // model to stop mid-thought. The corpus convention: every doc
    // carries terminal punctuation ('.'), truncating sources
    // (md5 % 12 = 7) chop ~3/4 of their docs at the 80-char cap
    // (dropping the terminal mark). Two zero-shuffle probes per doc
    // (no terminal [.!?], length == cap) + one source census.
    QEntry("q422_truncation_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(".")).as("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val chopping = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 12 === 7
        val corpus = docs.withColumn("text",
          when(chopping && draw % 4 =!= 3,
            substring(col("text"), 1, 80)).otherwise(col("text")))
        corpus
          .withColumn("no_term",
            (!col("text").rlike("[.!?]$")).cast("long"))
          .withColumn("at_cap", (length(col("text")) === 80).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("no_term")).as("no_terminal_punct"),
            sum(col("at_cap")).as("at_cap_length"),
            sum(col("no_term") * col("at_cap")).as("both_signals"))
          .withColumn("truncated_bp",
            expr("no_terminal_punct * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("truncated_bp") > 2000L, "truncating_ingest")
              .otherwise(lit("intact")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text || '.' AS text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 12 = 7
                    AS chopping
                FROM documents),
              corpus AS (
                SELECT source,
                  CASE WHEN chopping AND draw % 4 != 3
                    THEN substr(text, 1, 80) ELSE text END AS text
                FROM docs),
              c AS (
                SELECT source,
                  CASE WHEN NOT regexp_matches(text, '[.!?]$')
                    THEN 1 ELSE 0 END AS no_term,
                  CASE WHEN len(text) = 80 THEN 1 ELSE 0 END AS at_cap
                FROM corpus),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(no_term) AS no_terminal_punct,
                  sum(at_cap) AS at_cap_length,
                  sum(no_term * at_cap) AS both_signals
                FROM c GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(no_terminal_punct AS BIGINT) AS no_terminal_punct,
                CAST(at_cap_length AS BIGINT) AS at_cap_length,
                CAST(both_signals AS BIGINT) AS both_signals,
                CAST(no_terminal_punct * 10000 // n_docs AS BIGINT)
                  AS truncated_bp,
                CASE WHEN no_terminal_punct * 10000 // n_docs > 2000
                  THEN 'truncating_ingest' ELSE 'intact' END AS verdict
              FROM g
              ORDER BY source""")),

    // Dup-cluster provenance: dedup tells you WHAT is duplicated;
    // provenance tells you WHO copies WHOM — per source, how much of
    // its corpus is copied from elsewhere (it joined a multi-copy
    // cluster it doesn't originate) vs how much of its ORIGINAL
    // content others re-publish (foreign members of clusters it
    // originates). Origin = min doc_id in the cluster (earliest
    // ingest, the standard proxy). Two digest-grain aggregates + one
    // join-back; the 'agg_feed' plant (an ~1/8 draw re-published
    // under one syndication source) must read all-copies/zero-origins
    // while its victims read copied_by_others > 0.
    QEntry("q423_dup_provenance",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 8 === 1)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              lit("agg_feed").as("source"), col("text")))
          .withColumn("h", md5(col("text")))
        val cl = corpus.groupBy(col("h"))
          .agg(count(lit(1)).as("k"), min(col("doc_id")).as("origin_id"))
          .filter(col("k") > 1L) // multi-copy clusters only
        val members = corpus.join(cl, "h")
        val originSrc = members
          .filter(col("doc_id") === col("origin_id"))
          .select(col("h"), col("source").as("origin_source"))
        val enriched = members.join(originSrc, "h")
          .localCheckpoint() // feeds both rollups
        val bySrc = enriched.groupBy(col("source"))
          .agg(sum(when(col("doc_id") === col("origin_id"), 1L)
            .otherwise(0L)).as("origin_docs"),
            sum(when(col("doc_id") =!= col("origin_id"), 1L)
              .otherwise(0L)).as("copied_docs"))
        val copiedBy = enriched
          .filter(col("source") =!= col("origin_source"))
          .groupBy(col("origin_source").as("source"))
          .agg(count(lit(1)).as("copied_by_others"))
        val all = corpus.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"))
        all.join(bySrc, Seq("source"), "left")
          .join(copiedBy, Seq("source"), "left")
          .select(col("source"), col("n_docs"),
            coalesce(col("origin_docs"), lit(0L)).as("origin_docs"),
            coalesce(col("copied_docs"), lit(0L)).as("copied_docs"),
            coalesce(col("copied_by_others"), lit(0L))
              .as("copied_by_others"))
          .withColumn("copier_bp",
            expr("copied_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("copier_bp") > 5000L, "mostly_copies")
              .otherwise(lit("mostly_original")))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              corpus AS (
                SELECT doc_id, source, md5(text) AS h FROM base
                UNION ALL
                SELECT doc_id + 10000000, 'agg_feed', md5(text)
                FROM base WHERE draw % 8 = 1),
              cl AS (
                SELECT h, count(*) AS k, min(doc_id) AS origin_id
                FROM corpus GROUP BY h HAVING count(*) > 1),
              members AS (
                SELECT c.*, cl.origin_id FROM corpus c JOIN cl USING (h)),
              osrc AS (
                SELECT h, source AS origin_source FROM members
                WHERE doc_id = origin_id),
              enriched AS (
                SELECT m.*, o.origin_source
                FROM members m JOIN osrc o USING (h)),
              by_src AS (
                SELECT source,
                  sum(CASE WHEN doc_id = origin_id THEN 1 ELSE 0 END)
                    AS origin_docs,
                  sum(CASE WHEN doc_id != origin_id THEN 1 ELSE 0 END)
                    AS copied_docs
                FROM enriched GROUP BY source),
              cb AS (
                SELECT origin_source AS source, count(*)
                  AS copied_by_others
                FROM enriched WHERE source != origin_source
                GROUP BY origin_source),
              alls AS (
                SELECT source, count(*) AS n_docs
                FROM corpus GROUP BY source)
              SELECT a.source, CAST(a.n_docs AS BIGINT) AS n_docs,
                CAST(coalesce(b.origin_docs, 0) AS BIGINT)
                  AS origin_docs,
                CAST(coalesce(b.copied_docs, 0) AS BIGINT)
                  AS copied_docs,
                CAST(coalesce(c.copied_by_others, 0) AS BIGINT)
                  AS copied_by_others,
                CAST(coalesce(b.copied_docs, 0) * 10000 // a.n_docs
                  AS BIGINT) AS copier_bp,
                CASE WHEN coalesce(b.copied_docs, 0) * 10000 //
                  a.n_docs > 5000 THEN 'mostly_copies'
                  ELSE 'mostly_original' END AS verdict
              FROM alls a LEFT JOIN by_src b USING (source)
              LEFT JOIN cb c ON c.source = a.source
              ORDER BY a.source"""))
  )
}
