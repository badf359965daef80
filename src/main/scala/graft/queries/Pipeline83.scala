package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, fourth batch — cross-table integrity for the
  * embedding axis.
  */
object Pipeline83 {

  val entries: Seq[QEntry] = Seq(

    // Embedding-consistency audit: the same CONTENT must embed to the
    // same vector — when a corpus re-embeds (a retry, a backfill, a
    // second pipeline) and rows of one text disagree, that is encoder
    // VERSION SKEW, and every similarity/dedup/decontam result built
    // on those vectors silently mixes two geometries (q382's centroid
    // drift catches it at source grain AFTER the fact; this catches it
    // at content grain, attributably). Shape: one (text-digest,
    // vector-digest) projection, one group to content grain (rows,
    // distinct vectors), one source census — the vector digest is
    // md5 of the comma-joined QUANTIZED components (q36's integer
    // grid), so float-noise below the grid is forgiven by design and
    // anything past it flags. Plant: an md5-drawn ~1/10 of the docs
    // re-embed (a hash draw, not id arithmetic — the fixture's
    // round-robin id↔source layout would pin an id-mod plant to 2 of
    // the 20 sources, the q386 lesson);
    // sources with md5(source) % 4 = 0 re-embed through a SKEWED
    // encoder (+5 quantized units on dim 0) — those contents read
    // n_vecs_distinct = 2 ('skewed'), the rest re-embed bit-identically
    // (consistent duplication, NOT flagged: re-embedding per se is
    // normal; disagreement is the bug).
    QEntry("q404_embedding_consistency",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .join(Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"),
              graft.pipeline.Similarity.quantize(col("embedding"))
                .as("v")), "doc_id")
        val skew = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 4 === 0
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 10 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              col("source"), col("text"),
              when(skew, expr(
                "transform(v, (x, i) -> IF(i = 0, x + 5L, x))"))
                .otherwise(col("v")).as("v")))
        val contents = corpus
          .select(col("source"), md5(col("text")).as("h"),
            md5(expr("array_join(transform(v, x -> CAST(x AS STRING)), " +
              "',')")).as("vd"))
          .groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("vd")).as("n_vecs"))
        contents.groupBy(col("source"))
          .agg(count(lit(1)).as("n_contents"),
            sum(when(col("n_rows") > 1L, 1L).otherwise(0L))
              .as("n_multi_embedded"),
            sum(when(col("n_vecs") > 1L, 1L).otherwise(0L))
              .as("n_inconsistent"))
          .withColumn("consistency_bp",
            expr("(n_contents - n_inconsistent) * 10000 div n_contents"))
          .withColumn("verdict",
            when(col("n_inconsistent") > 0L, "skewed")
              .otherwise(lit("consistent")))
          .orderBy(col("source"))
      },
      Some("""WITH ez AS (
                SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                    AS v
                FROM embeddings),
              base AS (
                SELECT d.doc_id, d.source, d.text, e.v
                FROM documents d JOIN ez e ON e.vec_id = d.doc_id),
              corpus AS (
                SELECT doc_id, source, text, v FROM base
                UNION ALL
                SELECT doc_id + 10000000, source, text,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                    % 4 = 0
                  THEN list_transform(v, (x, i) ->
                    CASE WHEN i = 1 THEN x + 5 ELSE x END)
                  ELSE v END
                FROM base WHERE ('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 = 0),
              contents AS (
                SELECT source, md5(text) AS h, count(*) AS n_rows,
                  count(DISTINCT md5(array_to_string(
                    list_transform(v, x -> CAST(x AS VARCHAR)), ',')))
                    AS n_vecs
                FROM corpus GROUP BY source, md5(text)),
              census AS (
                SELECT source, count(*) AS n_contents,
                  sum(CASE WHEN n_rows > 1 THEN 1 ELSE 0 END)
                    AS n_multi_embedded,
                  sum(CASE WHEN n_vecs > 1 THEN 1 ELSE 0 END)
                    AS n_inconsistent
                FROM contents GROUP BY source)
              SELECT source, CAST(n_contents AS BIGINT) AS n_contents,
                CAST(n_multi_embedded AS BIGINT) AS n_multi_embedded,
                CAST(n_inconsistent AS BIGINT) AS n_inconsistent,
                CAST((n_contents - n_inconsistent) * 10000
                  // n_contents AS BIGINT) AS consistency_bp,
                CASE WHEN n_inconsistent > 0 THEN 'skewed'
                     ELSE 'consistent' END AS verdict
              FROM census
              ORDER BY source""")),

    // Source novelty census: which source contributes content NOTHING
    // else has — the marginal-value question behind every mix/budget
    // decision (a source can be huge, clean, and still worthless if
    // its n-grams all exist elsewhere). Type-level: a source's novelty
    // = share of its distinct 8-gram types that occur in NO other
    // source. Shape: one positional-shingle projection to (gram, source)
    // type grain, one gram-grain census (n_sources per gram), one join
    // back at gram grain, one source rollup — two shuffles, both on
    // 8-byte gram digests, never on text. Corpus: the q386 mirror
    // topology (md5-drawn ~1/5 of each source re-published as
    // mirror_<source>, the nested ~1/25 syndicated into one agg feed)
    // — a MIRROR source's grams all exist in its original, so mirrors
    // read ~0 novelty ('redundant', the census's reason to exist)
    // while originals stay high; the agg feed sits at 0 twice over.
    QEntry("q405_source_novelty",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 5 === 0)
            .select(concat(lit("mirror_"), col("source")).as("source"),
              (col("doc_id") + 10000000L).as("doc_id"), col("text")))
          .union(base.filter(draw % 25 === 0)
            .select(lit("agg").as("source"),
              (col("doc_id") + 20000000L).as("doc_id"), col("text")))
        val st = corpus
          .select(col("source"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 8, distinct = true))
              .as("gram"))
          .select(col("source"),
            conv(substring(md5(col("gram")), 1, 15), 16, 10)
              .cast("long").as("g"))
          .distinct()
          .localCheckpoint() // gram census + join-back sides
        val gdim = st.groupBy(col("g"))
          .agg(count(lit(1)).as("n_sources"))
        st.join(gdim, "g")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("gram_types"),
            sum(when(col("n_sources") === 1L, 1L).otherwise(0L))
              .as("unique_types"))
          .withColumn("novelty_bp",
            expr("unique_types * 10000 div gram_types"))
          .withColumn("verdict",
            when(col("novelty_bp") < 500L, "redundant")
              .otherwise(lit("novel")))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT source, doc_id, text FROM documents),
              corpus AS (
                SELECT source, doc_id, text FROM base
                UNION ALL
                SELECT 'mirror_' || source, doc_id + 10000000, text
                FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 5 = 0
                UNION ALL
                SELECT 'agg', doc_id + 20000000, text FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 25 = 0),
              t AS (
                SELECT source, doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM corpus),
              st AS (
                SELECT DISTINCT source,
                  ('0x' || substr(md5(array_to_string(
                    toks[p.p + 1:p.p + 8], ' ')), 1, 15))::BIGINT AS g
                FROM t,
                  (SELECT unnest(generate_series(0, 511)) AS p) p
                WHERE p.p <= len(toks) - 8),
              gdim AS (
                SELECT g, count(*) AS n_sources FROM st GROUP BY g),
              census AS (
                SELECT st.source, count(*) AS gram_types,
                  sum(CASE WHEN gd.n_sources = 1 THEN 1 ELSE 0 END)
                    AS unique_types
                FROM st JOIN gdim gd USING (g)
                GROUP BY st.source)
              SELECT source, CAST(gram_types AS BIGINT) AS gram_types,
                CAST(unique_types AS BIGINT) AS unique_types,
                CAST(unique_types * 10000 // gram_types AS BIGINT)
                  AS novelty_bp,
                CASE WHEN unique_types * 10000 // gram_types < 500
                     THEN 'redundant' ELSE 'novel' END AS verdict
              FROM census
              ORDER BY source""")),

    // Release datasheet: the one-frame summary a dataset release ships
    // (the "Datasheets for Datasets" artifact, Gebru et al. 2018) —
    // every number a consumer asks first, computed from the corpus in
    // a handful of dimension-grain aggregates and emitted as a
    // (section, metric, value) KV frame so downstream tooling renders
    // it without schema churn. Sections: volume (docs/tokens/chars/
    // sources), dedup (distinct texts, exact-dup docs, savings bp),
    // quality (docs under the 500 bp stopword floor), decontamination
    // (exact-digest hits vs the doc_id % 10 benchmark slice), pii
    // (email/phone/IPv4 doc counts — honestly 0 on this fixture),
    // mix (source-concentration HHI in ppm — Σ share², the "is this
    // release one giant source in a trenchcoat" scalar), length
    // (min/mean-milli/max tokens). Every value is an exact integer;
    // every section reuses the suite's established metric convention
    // (q389 savings, q385 score, q392 decontam, q398 patterns).
    QEntry("q406_release_datasheet",
      (s, d) => {
        import s.implicits._
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"),
            col("n_chars"))
          .withColumn("toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"))
          .withColumn("score_bp",
            expr("CAST(" +
              "size(filter(split(lower(text), '\\\\s+'), w -> w IN (" +
              "'the','a','of','and','to','in','is','on','for','with'" +
              "))) AS BIGINT) * 10000 div greatest(1L, toks)"))
          .localCheckpoint() // every section reads this one frame
        def kv(section: String, metric: String, v: org.apache.spark.sql.Column) =
          docs.agg(v.as("value"))
            .select(lit(section).as("section"), lit(metric).as("metric"),
              col("value").cast("long"))
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val bench = docs.filter(col("doc_id") % 10 === 0)
          .select(md5(col("text")).as("h")).distinct()
        val nContam = docs.filter(col("doc_id") % 10 =!= 0)
          .withColumn("h", md5(col("text")))
          .join(broadcast(bench), Seq("h"), "left_semi")
          .agg(count(lit(1)).as("value"))
          .select(lit("decontam").as("section"),
            lit("exact_benchmark_hits").as("metric"), col("value"))
        val dedup = docs.groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("k"), min(col("n_chars")).as("rb"),
            sum(col("n_chars")).as("b"))
          .agg(count(lit(1)).as("nd"), sum(col("k") - 1).as("rd"),
            expr("sum(b - rb) * 10000 div sum(b)").as("sb"))
          .select(explode(array(
            struct(lit("dedup").as("section"),
              lit("distinct_texts").as("metric"), col("nd").as("value")),
            struct(lit("dedup").as("section"),
              lit("exact_dup_docs").as("metric"), col("rd").as("value")),
            struct(lit("dedup").as("section"),
              lit("savings_bp").as("metric"), col("sb").as("value"))))
            .as("r"))
          .select(col("r.section"), col("r.metric"), col("r.value"))
        val hhi = docs.groupBy(col("source")).agg(count(lit(1)).as("c"))
          .agg(expr("sum(c * c) * 1000000 div (sum(c) * sum(c))")
            .as("value"))
          .select(lit("mix").as("section"), lit("source_hhi_ppm")
            .as("metric"), col("value"))
        kv("volume", "n_docs", count(lit(1)))
          .unionByName(kv("volume", "n_tokens", sum(col("toks"))))
          .unionByName(kv("volume", "n_chars", sum(col("n_chars"))))
          .unionByName(kv("volume", "n_sources",
            countDistinct(col("source"))))
          .unionByName(kv("quality", "docs_below_floor",
            sum(when(col("score_bp") < 500L, 1L).otherwise(0L))))
          .unionByName(kv("pii", "email_docs",
            sum((size(regexp_extract_all(col("text"), lit(emailRe),
              lit(0))) > 0).cast("long"))))
          .unionByName(kv("pii", "phone_docs",
            sum((size(regexp_extract_all(col("text"), lit(phoneRe),
              lit(0))) > 0).cast("long"))))
          .unionByName(kv("pii", "ipv4_docs",
            sum((size(regexp_extract_all(col("text"), lit(ipRe),
              lit(0))) > 0).cast("long"))))
          .unionByName(kv("length", "min_tokens", min(col("toks"))))
          .unionByName(kv("length", "mean_tokens_milli",
            expr("sum(toks) * 1000 div count(1)")))
          .unionByName(kv("length", "max_tokens", max(col("toks"))))
          .unionByName(dedup)
          .unionByName(nContam)
          .unionByName(hhi)
          .orderBy(col("section"), col("metric"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text, n_chars,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) * 10000
                    // greatest(1, CAST(len(string_split_regex(
                      lower(text), '\s+')) AS BIGINT)) AS score_bp
                FROM documents),
              bench AS (
                SELECT DISTINCT md5(text) AS h FROM docs
                WHERE doc_id % 10 = 0),
              ded AS (
                SELECT count(*) AS nd, sum(k - 1) AS rd,
                  sum(b - rb) * 10000 // sum(b) AS sb
                FROM (SELECT md5(text) AS h, count(*) AS k,
                        min(n_chars) AS rb, sum(n_chars) AS b
                      FROM docs GROUP BY md5(text))),
              rows_ AS (
                SELECT 'volume' AS section, 'n_docs' AS metric,
                  count(*) AS value FROM docs
                UNION ALL
                SELECT 'volume', 'n_tokens', sum(toks) FROM docs
                UNION ALL
                SELECT 'volume', 'n_chars', sum(n_chars) FROM docs
                UNION ALL
                SELECT 'volume', 'n_sources', count(DISTINCT source)
                FROM docs
                UNION ALL
                SELECT 'quality', 'docs_below_floor',
                  sum(CASE WHEN score_bp < 500 THEN 1 ELSE 0 END)
                FROM docs
                UNION ALL
                SELECT 'pii', 'email_docs',
                  sum(CASE WHEN len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    > 0 THEN 1 ELSE 0 END) FROM docs
                UNION ALL
                SELECT 'pii', 'phone_docs',
                  sum(CASE WHEN len(regexp_extract_all(text,
                    '\d{3}-\d{3}-\d{4}')) > 0 THEN 1 ELSE 0 END)
                FROM docs
                UNION ALL
                SELECT 'pii', 'ipv4_docs',
                  sum(CASE WHEN len(regexp_extract_all(text,
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) > 0
                    THEN 1 ELSE 0 END) FROM docs
                UNION ALL
                SELECT 'length', 'min_tokens', min(toks) FROM docs
                UNION ALL
                SELECT 'length', 'mean_tokens_milli',
                  sum(toks) * 1000 // count(*) FROM docs
                UNION ALL
                SELECT 'length', 'max_tokens', max(toks) FROM docs
                UNION ALL
                SELECT 'dedup', 'distinct_texts', nd FROM ded
                UNION ALL
                SELECT 'dedup', 'exact_dup_docs', rd FROM ded
                UNION ALL
                SELECT 'dedup', 'savings_bp', sb FROM ded
                UNION ALL
                SELECT 'decontam', 'exact_benchmark_hits',
                  (SELECT count(*) FROM docs
                   WHERE doc_id % 10 != 0
                     AND md5(text) IN (SELECT h FROM bench))
                UNION ALL
                SELECT 'mix', 'source_hhi_ppm',
                  (SELECT sum(c * c) * 1000000 // (sum(c) * sum(c))
                   FROM (SELECT count(*) AS c FROM docs
                         GROUP BY source)))
              SELECT section, metric, CAST(value AS BIGINT) AS value
              FROM rows_
              ORDER BY section, metric""")),

    // Mojibake / encoding-damage audit: the hygiene pass every web
    // corpus runs — UTF-8 double-encoding artifacts (the 'A-tilde'
    // prefix family: 'caf\u00c3\u00a9' for 'caf\u00e9') and U+FFFD
    // replacement characters (a decoder already gave up once) both
    // mean the text bytes lost information upstream; training on them
    // teaches the artifacts. One zero-shuffle projection (two contains
    // probes per doc), one source census. The fixture is ASCII-only
    // (pinned by the q381 guard), so the signal is PLANTED in-query:
    // the md5-conditional ingestion-broken sources (md5(source) % 5 =
    // 0) get an ~1/12 double-encode draw and a disjoint ~1/17
    // replacement-char draw — the census must read those rates back
    // on exactly those sources; everyone else stays 'clean'. Verdict
    // per source at > 300 bp damaged.
    QEntry("q407_mojibake_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val badSrc = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 5 === 0
        val corpus = docs
          .withColumn("text",
            concat(col("text"),
              when(badSrc && draw % 12 === 0,
                lit(" caf\u00c3\u00a9 menu")).otherwise(lit("")),
              when(badSrc && draw % 17 === 3,
                lit(" lost\ufffdchar")).otherwise(lit(""))))
        corpus
          .withColumn("has_double",
            (instr(col("text"), "\u00c3") > 0).cast("long"))
          .withColumn("has_repl",
            (instr(col("text"), "\ufffd") > 0).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("has_double")).as("double_encoded_docs"),
            sum(col("has_repl")).as("replacement_docs"),
            sum(greatest(col("has_double"), col("has_repl")))
              .as("damaged_docs"))
          .withColumn("damaged_bp",
            expr("damaged_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("damaged_bp") > 300L, "dirty_encoding")
              .otherwise(lit("clean")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source,
                  text ||
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 5 = 0
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    ), 1, 4))::BIGINT % 12 = 0
                    THEN ' caf\u00c3\u00a9 menu' ELSE '' END ||
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 5 = 0
                    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    ), 1, 4))::BIGINT % 17 = 3
                    THEN ' lost\ufffdchar' ELSE '' END AS text
                FROM documents),
              c AS (
                SELECT source,
                  CASE WHEN position('\u00c3' IN text) > 0
                    THEN 1 ELSE 0 END AS hd,
                  CASE WHEN position('\ufffd' IN text) > 0
                    THEN 1 ELSE 0 END AS hr
                FROM docs),
              g AS (
                SELECT source, count(*) AS n_docs, sum(hd) AS ded,
                  sum(hr) AS rd, sum(greatest(hd, hr)) AS dd
                FROM c GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(ded AS BIGINT) AS double_encoded_docs,
                CAST(rd AS BIGINT) AS replacement_docs,
                CAST(dd AS BIGINT) AS damaged_docs,
                CAST(dd * 10000 // n_docs AS BIGINT) AS damaged_bp,
                CASE WHEN dd * 10000 // n_docs > 300
                     THEN 'dirty_encoding' ELSE 'clean' END AS verdict
              FROM g
              ORDER BY source"""))
  )
}
