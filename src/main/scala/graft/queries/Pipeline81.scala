package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, second batch — the n-gram-overlap decontaminator and
  * corpus-hygiene companions: the third member of the decontamination
  * family (q392 exact-digest, q359 embedding-cosine, and now the
  * verbatim-passage detector every released benchmark suite specifies).
  */
object Pipeline81 {

  val entries: Seq[QEntry] = Seq(

    // N-gram-overlap decontamination: flag corpus documents sharing
    // VERBATIM 8-token passages with a benchmark slice — the standard
    // "dirty document" definition (GPT-3-style n-gram collision), the
    // member of the decontam family that catches quoted test items
    // which exact digests miss (the doc isn't byte-equal) and
    // embeddings blur (the quote is a fraction of the doc). Shape:
    //  - the benchmark slice (doc_id % 10 = 0) shingles ONCE into a
    //    distinct 8-gram md5-digest dim — benchmarks are small by
    //    definition, so the dim BROADCASTS and the corpus never
    //    shuffles (the only corpus-grain work is one shingle
    //    projection + one broadcast hash probe);
    //  - every corpus doc carries positional 8-gram digests; hits =
    //    grams in the benchmark dim; a gaps-and-islands pass per doc
    //    turns hit positions into the LONGEST CONSECUTIVE run — run r
    //    means r + 7 verbatim shared tokens, the evidence a removal
    //    decision cites;
    //  - verdict: 'dirty' at max_run >= 2 (>= 9 verbatim tokens),
    //    'suspect' on any isolated hit, else 'clean'.
    // Plant: every 13th non-benchmark doc quotes the first 12 tokens
    // of its bench-slice neighbor (doc_id rounded down to the
    // multiple of 10) — the quote-injection contamination this
    // operator exists to catch; Pipeline81Spec pins every planted doc
    // 'dirty' and hit_bp/table geometry.
    QEntry("q397_ngram_decontaminate",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .localCheckpoint() // bench dim + corpus + quote plant sides
        val bench = docs.filter(col("doc_id") % 10 === 0)
        val bdim = bench
          .select(explode(graft.expressions.functions.ngram_shingles(
            split(lower(col("text")), "\\s+"), 8, distinct = true))
            .as("gram"))
          .select(conv(substring(md5(col("gram")), 1, 15), 16, 10)
            .cast("long").as("g"))
          .distinct()
          .withColumn("hit", lit(1L))
        val corpus = docs.filter(col("doc_id") % 10 =!= 0)
          .join(bench.select((col("doc_id")).as("bid"),
            col("text").as("btext")),
            expr("bid = (doc_id div 10) * 10"), "left")
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 13 === 0 && col("btext").isNotNull,
              concat_ws(" ", col("text"),
                array_join(slice(split(col("btext"), "\\s+"), 1, 12),
                  " ")))
              .otherwise(col("text")).as("text"))
        val grams = corpus
          .select(col("doc_id"),
            posexplode_outer(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 8, distinct = false)))
          .select(col("doc_id"), col("pos"),
            conv(substring(md5(col("col")), 1, 15), 16, 10)
              .cast("long").as("g"))
          .join(broadcast(bdim), Seq("g"), "left")
          .localCheckpoint() // per-doc census + the islands pass
        val stats = grams.groupBy(col("doc_id"))
          .agg(count(col("pos")).as("n_grams"),
            sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        val wRun = org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id")).orderBy(col("pos"))
        val runs = grams.filter(col("hit").isNotNull)
          .withColumn("rn", row_number().over(wRun))
          .groupBy(col("doc_id"), (col("pos") - col("rn")).as("grp"))
          .agg(count(lit(1)).as("run"))
          .groupBy(col("doc_id"))
          .agg(max(col("run")).as("max_run"))
        stats.join(runs, Seq("doc_id"), "left")
          .select(col("doc_id"), col("n_grams"), col("n_hit"),
            expr("n_hit * 10000 div greatest(1L, n_grams)").as("hit_bp"),
            coalesce(col("max_run"), lit(0L)).as("max_run"))
          .withColumn("verdict",
            when(col("max_run") >= 2L, "dirty")
              .when(col("n_hit") > 0L, "suspect")
              .otherwise(lit("clean")))
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, text FROM documents),
              bench AS (
                SELECT doc_id, text FROM docs WHERE doc_id % 10 = 0),
              btoks AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM bench),
              bdim AS (
                SELECT DISTINCT
                  ('0x' || substr(md5(array_to_string(
                    toks[p.p + 1:p.p + 8], ' ')), 1, 15))::BIGINT AS g
                FROM btoks,
                  (SELECT unnest(generate_series(0, 511)) AS p) p
                WHERE p.p <= len(toks) - 8),
              corpus AS (
                SELECT w.doc_id,
                  CASE WHEN w.doc_id % 13 = 0 AND b.text IS NOT NULL
                    THEN w.text || ' ' || array_to_string(
                      string_split_regex(b.text, '\s+')[1:12], ' ')
                    ELSE w.text END AS text
                FROM docs w
                LEFT JOIN bench b ON b.doc_id = (w.doc_id // 10) * 10
                WHERE w.doc_id % 10 != 0),
              ctoks AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM corpus),
              grams AS (
                SELECT c.doc_id, p.p AS pos,
                  ('0x' || substr(md5(array_to_string(
                    c.toks[p.p + 1:p.p + 8], ' ')), 1, 15))::BIGINT AS g
                FROM ctoks c,
                  (SELECT unnest(generate_series(0, 511)) AS p) p
                WHERE p.p <= len(c.toks) - 8),
              hits AS (
                SELECT gr.doc_id, gr.pos,
                  CASE WHEN bd.g IS NOT NULL THEN 1 ELSE 0 END AS hit
                FROM grams gr LEFT JOIN bdim bd ON bd.g = gr.g),
              stats AS (
                SELECT doc_id, count(*) AS n_grams, sum(hit) AS n_hit
                FROM hits GROUP BY doc_id),
              runs AS (
                SELECT doc_id, max(run) AS max_run FROM (
                  SELECT doc_id, grp, count(*) AS run FROM (
                    SELECT doc_id, pos,
                      pos - row_number() OVER (PARTITION BY doc_id
                        ORDER BY pos) AS grp
                    FROM hits WHERE hit = 1)
                  GROUP BY doc_id, grp)
                GROUP BY doc_id),
              spine AS (
                SELECT c.doc_id,
                  coalesce(st.n_grams, 0) AS n_grams,
                  coalesce(st.n_hit, 0) AS n_hit,
                  coalesce(r.max_run, 0) AS max_run
                FROM corpus c
                LEFT JOIN stats st ON st.doc_id = c.doc_id
                LEFT JOIN runs r ON r.doc_id = c.doc_id)
              SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
                CAST(n_hit AS BIGINT) AS n_hit,
                CAST(n_hit * 10000 // greatest(1, n_grams) AS BIGINT)
                  AS hit_bp,
                CAST(max_run AS BIGINT) AS max_run,
                CASE WHEN max_run >= 2 THEN 'dirty'
                     WHEN n_hit > 0 THEN 'suspect'
                     ELSE 'clean' END AS verdict
              FROM spine
              ORDER BY doc_id""")),

    // PII scrub census: the redaction pass a released corpus runs
    // before training — per document, how many email / NANP-phone /
    // IPv4 literals it carries and what scrubbing them costs in
    // characters. The validator family (S1-S19, q148-q151) classifies
    // whole CELLS; this is the DOCUMENT-grain extraction twin: one
    // regexp_extract_all projection per type (codegen'd, zero
    // shuffle), one regexp_replace cascade for the scrub accounting,
    // an ordered doc-grain manifest — at 100 TB this is a pure map
    // over the corpus, the cheapest possible shape. Patterns are kept
    // in the Java-regex ∩ RE2 dialect so the DuckDB oracle replays
    // them byte-for-byte (the S2 phone-v0 convention). Plant: every
    // 9th doc gains an email, every 11th a phone, every 17th an IPv4
    // (md5-free id arithmetic: the plants overlap, e.g. doc 99 gets
    // email + phone, and the spec pins the overlap rows too).
    QEntry("q398_pii_scrub_census",
      (s, d) => {
        val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
        val phoneRe = "\\d{3}-\\d{3}-\\d{4}"
        val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            concat(col("text"),
              when(col("doc_id") % 9 === 0,
                lit(" contact bob@example.com")).otherwise(lit("")),
              when(col("doc_id") % 11 === 0,
                lit(" call 212-555-0198")).otherwise(lit("")),
              when(col("doc_id") % 17 === 0,
                lit(" from 192.168.1.7")).otherwise(lit("")))
              .as("text"))
        docs
          // function form with lit() patterns: the Scala string IS the
          // Java regex, no second unescaping through a SQL literal
          .withColumn("n_email",
            size(regexp_extract_all(col("text"), lit(emailRe), lit(0)))
              .cast("long"))
          .withColumn("n_phone",
            size(regexp_extract_all(col("text"), lit(phoneRe), lit(0)))
              .cast("long"))
          .withColumn("n_ipv4",
            size(regexp_extract_all(col("text"), lit(ipRe), lit(0)))
              .cast("long"))
          .withColumn("chars_before", length(col("text")).cast("long"))
          .withColumn("chars_after",
            length(regexp_replace(regexp_replace(regexp_replace(
              col("text"), emailRe, "[PII]"), phoneRe, "[PII]"),
              ipRe, "[PII]")).cast("long"))
          .select(col("doc_id"), col("source"), col("n_email"),
            col("n_phone"), col("n_ipv4"),
            (col("n_email") + col("n_phone") + col("n_ipv4"))
              .as("pii_total"),
            col("chars_before"), col("chars_after"),
            when(col("n_email") + col("n_phone") + col("n_ipv4") > 0L,
              "pii").otherwise(lit("clean")).as("verdict"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source,
                  text ||
                  CASE WHEN doc_id % 9 = 0
                    THEN ' contact bob@example.com' ELSE '' END ||
                  CASE WHEN doc_id % 11 = 0
                    THEN ' call 212-555-0198' ELSE '' END ||
                  CASE WHEN doc_id % 17 = 0
                    THEN ' from 192.168.1.7' ELSE '' END AS text
                FROM documents),
              c AS (
                SELECT doc_id, source,
                  CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                    AS BIGINT) AS n_email,
                  CAST(len(regexp_extract_all(text,
                    '\d{3}-\d{3}-\d{4}')) AS BIGINT) AS n_phone,
                  CAST(len(regexp_extract_all(text,
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b'))
                    AS BIGINT) AS n_ipv4,
                  CAST(length(text) AS BIGINT) AS chars_before,
                  CAST(length(regexp_replace(regexp_replace(
                    regexp_replace(text,
                      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                      '[PII]', 'g'),
                    '\d{3}-\d{3}-\d{4}', '[PII]', 'g'),
                    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                    '[PII]', 'g')) AS BIGINT) AS chars_after
                FROM docs)
              SELECT doc_id, source, n_email, n_phone, n_ipv4,
                n_email + n_phone + n_ipv4 AS pii_total,
                chars_before, chars_after,
                CASE WHEN n_email + n_phone + n_ipv4 > 0 THEN 'pii'
                     ELSE 'clean' END AS verdict
              FROM c
              ORDER BY doc_id""")),

    // Measured MinHash-LSH S-curve: the EMPIRICAL catch probability of
    // the house LSH config (16 perms, 4 bands x 4 rows, the q37 chain)
    // as a function of exact 3-GRAM-SHINGLE Jaccard — the quantity the
    // bands actually model (token-set Jaccard is the WRONG x-axis: the
    // fixture vocabulary is small, so random doc pairs share most
    // distinct tokens while sharing no trigram, and a token-J curve
    // reads as noise — the first cut of this query measured exactly
    // that). The calibration table a dedup rollout reads before
    // trusting a threshold, measured on real pairs instead of asserted
    // from 1-(1-J^r)^b. Shape: an ~30-probe md5 panel (the q355/q342
    // sample discipline) pairs against the whole corpus — LINEAR, never
    // pair-quadratic — and the three planted edit arms contribute their
    // (original, copy) pairs explicitly (the ground-truth bend points);
    // exact shingle Jaccard per pair via one array_intersect; 'caught'
    // = the docs share >= 1 of their 4 positional band keys, computed
    // IN the pair row (zip_with + exists — no band join at all).
    // Edit arms: ~1/25 tokens swapped (shingle-J ~0.75-0.85, the steep
    // part), ~1/12 (J ~0.55-0.7, the knee), ~1/5 (J ~0.2-0.4, the
    // floor). Output per 500-bp shingle-Jaccard band: pairs, caught,
    // catch_ppm.
    QEntry("q399_lsh_scurve",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        def edit(m: Int, phaseMod: Int) = expr(
          s"""array_join(transform(split(lower(text), '\\\\s+'),
              (w, i) -> CASE WHEN i % $m = doc_id % $phaseMod
                THEN concat('zz', CAST(i AS STRING)) ELSE w END), ' ')""")
        val corpus = base
          .union(base.filter(col("doc_id") % 12 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              edit(25, 7).as("text")))
          .union(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              edit(12, 5).as("text")))
          .union(base.filter(col("doc_id") % 15 === 0)
            .select((col("doc_id") + 30000000L).as("doc_id"),
              edit(5, 3).as("text")))
          .localCheckpoint() // panel + shingles + signatures
        val stride = math.max(1L, corpus.count() / 30L)
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 15), 16, 10).cast("long")
        val shingleArrs = corpus
          .select(col("doc_id"), graft.expressions.functions
            .ngram_shingles(split(lower(col("text")), "\\s+"), 3,
              distinct = true).as("toks"))
          .filter(size(col("toks")) > 0)
          .localCheckpoint() // both pair sides + signatures
        // positional band keys (4 x 4 of the 16 affine perms) — fused
        // md5-twin kernel (round 17, guide §4), bit-identical values
        val P = 4294967311L
        val perms = Pipeline.MinHashPerms
        val bkeys = array((0 until 4).map(b =>
          concat_ws(",", (0 until 4).map(r =>
            element_at(col("sigs"), b * 4 + r + 1)): _*)): _*)
        val sigd = shingleArrs
          .select(col("doc_id"), graft.expressions.functions
            .md5_minhash_sigs(col("toks"), perms, P).as("sigs"))
          .select(col("doc_id"), bkeys.as("bk"))
          .localCheckpoint() // both pair sides
        // the random floor needs MASS, not the whole corpus: the
        // panel's counter-side is a second ~3000-doc md5 draw (cstride
        // = 1 at gate SFs, so the gate output is unchanged) — without
        // it the 30 x corpus floor is 180M J~0 verifications at 100x
        // (measured 130 s) for evidence 90k pairs already give
        val cstride = math.max(1L, corpus.count() / 3000L)
        val cdraw = conv(substring(md5(concat(
          col("doc_id").cast("string"), lit("c"))), 1, 15), 16, 10)
          .cast("long")
        val panelPairs = corpus.filter(draw % stride === 0)
          .select(col("doc_id").as("p_id"))
          .crossJoin(corpus.filter(cdraw % cstride === 0)
            .select(col("doc_id").as("c_id")))
          .filter(col("p_id") =!= col("c_id"))
          .select(least(col("p_id"), col("c_id")).as("a_id"),
            greatest(col("p_id"), col("c_id")).as("b_id"))
        val plantedPairs = corpus.filter(col("doc_id") >= 10000000L)
          .select((col("doc_id") % 10000000L).as("a_id"),
            col("doc_id").as("b_id"))
        val pairs = panelPairs.union(plantedPairs).distinct()
          .join(shingleArrs.select(col("doc_id").as("a_id")), "a_id")
          .join(shingleArrs.select(col("doc_id").as("b_id")), "b_id")
        graft.pipeline.Dedup.verifyJaccard(pairs, shingleArrs, 0.0)
          .withColumn("j_band", expr("(inter * 10000 div uni) div 500"))
          .join(sigd.select(col("doc_id").as("a_id"),
            col("bk").as("ba")), Seq("a_id"))
          .join(sigd.select(col("doc_id").as("b_id"),
            col("bk").as("bb")), Seq("b_id"))
          .withColumn("caught",
            expr("exists(zip_with(ba, bb, (x, y) -> x = y), v -> v)"))
          .groupBy(col("j_band"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("caught").cast("long")).as("n_caught"))
          .withColumn("catch_ppm",
            expr("n_caught * 1000000 div n_pairs"))
          .orderBy(col("j_band"))
      },
      Some {
        val P = 4294967311L
        val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
        }.mkString("[", ",\n                  ", "]")
        s"""WITH base AS (SELECT doc_id, text FROM documents),
            corpus AS (
              SELECT doc_id, text FROM base
              UNION ALL
              SELECT doc_id + 10000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 25 = doc_id % 7
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 12 = 0
              UNION ALL
              SELECT doc_id + 20000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 12 = doc_id % 5
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id + 30000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 5 = doc_id % 3
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 15 = 0),
            st AS (SELECT greatest(1, count(*) // 30) AS stride
                   FROM corpus),
            t AS (
              SELECT doc_id,
                string_split_regex(lower(text), '\\s+') AS toks
              FROM corpus),
            shl AS (
              SELECT doc_id,
                list_distinct(list_transform(range(1, len(toks) - 1),
                  i -> array_to_string(toks[i:i+2], ' '))) AS shingles
              FROM t),
            sh2 AS (SELECT doc_id, shingles FROM shl
                    WHERE len(shingles) > 0),
            hh AS (
              SELECT doc_id, list_transform(shingles,
                s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM sh2),
            msig AS (
              SELECT doc_id, $sigList AS sig FROM hh),
            mb AS (
              SELECT doc_id,
                [array_to_string(list_transform(sig[b*4+1:b*4+4],
                   x -> CAST(x AS VARCHAR)), ',')
                 FOR b IN [0, 1, 2, 3]] AS bk
              FROM msig),
            cst AS (SELECT greatest(1, count(*) // 3000) AS cstride
                    FROM corpus),
            pairs AS (
              SELECT DISTINCT least(p.doc_id, c.doc_id) AS a_id,
                greatest(p.doc_id, c.doc_id) AS b_id
              FROM corpus p, corpus c, st, cst
              WHERE ('0x' || substr(md5(CAST(p.doc_id AS VARCHAR)),
                  1, 15))::BIGINT % st.stride = 0
                AND ('0x' || substr(md5(CAST(c.doc_id AS VARCHAR)
                  || 'c'), 1, 15))::BIGINT % cst.cstride = 0
                AND p.doc_id != c.doc_id
              UNION
              SELECT doc_id % 10000000, doc_id FROM corpus
              WHERE doc_id >= 10000000),
            prs AS (
              SELECT pr.a_id, pr.b_id
              FROM pairs pr
              JOIN sh2 a ON a.doc_id = pr.a_id
              JOIN sh2 b ON b.doc_id = pr.b_id),
            shx AS (
              SELECT doc_id, unnest(shingles) AS sh FROM sh2),
            sizes AS (
              SELECT doc_id, count(*) AS n FROM shx GROUP BY doc_id),
            inter AS (
              SELECT pr.a_id, pr.b_id, count(*) AS i
              FROM prs pr
              JOIN shx a ON a.doc_id = pr.a_id
              JOIN shx b ON b.doc_id = pr.b_id AND b.sh = a.sh
              GROUP BY pr.a_id, pr.b_id),
            jj AS (
              SELECT pr.a_id, pr.b_id,
                (coalesce(i.i, 0) * 10000 //
                 (sa.n + sb.n - coalesce(i.i, 0))) // 500 AS j_band,
                CASE WHEN len(list_filter(
                    list_transform(range(1, 5),
                      k -> ba.bk[k] = bb.bk[k]), v -> v)) > 0
                  THEN 1 ELSE 0 END AS caught
              FROM prs pr
              JOIN sizes sa ON sa.doc_id = pr.a_id
              JOIN sizes sb ON sb.doc_id = pr.b_id
              LEFT JOIN inter i ON i.a_id = pr.a_id AND i.b_id = pr.b_id
              JOIN mb ba ON ba.doc_id = pr.a_id
              JOIN mb bb ON bb.doc_id = pr.b_id)
            SELECT CAST(j_band AS BIGINT) AS j_band,
              CAST(count(*) AS BIGINT) AS n_pairs,
              CAST(sum(caught) AS BIGINT) AS n_caught,
              CAST(sum(caught) * 1000000 // count(*) AS BIGINT)
                AS catch_ppm
            FROM jj
            GROUP BY j_band
            ORDER BY j_band"""
      }),

    // Shuffle-quality audit of a training order: before a corpus ships
    // to trainers, "is the document order actually shuffled?" — a
    // source-clumped order trains on one distribution for hours, then
    // another (the classic curriculum-by-accident bug). Two candidate
    // orders are audited side by side: the md5-hash order (the
    // standard shuffle) and the pathological source-sorted order. Each
    // is cut into rank-range shards by the two-pass GlobalRank (the
    // q05/q302 recipe — no single-partition sort), shard count scaled
    // to the corpus (greatest(4, least(64, N/128)) so gate-SF shards
    // hold enough docs for the statistic to mean something); per shard
    // the source mix is compared to the corpus-wide mix by TOTAL
    // VARIATION distance in ppm (integer-exact — no chi-square
    // decimals), densified over the shard x source grid so absent
    // sources count. Verdict per ordering: any shard TV > 400000 ppm
    // -> 'clumped'. The spec pins hashed = 'mixed', sorted =
    // 'clumped' — the audit separates them at every SF.
    QEntry("q400_shuffle_quality_audit",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .localCheckpoint() // two rankings + the mix dims
        val n = docs.count()
        val nShards = math.max(4L, math.min(64L, n / 128L))
        val srcTot = docs.groupBy(col("source"))
          .agg(count(lit(1)).as("ns"))
        def arm(name: String, ranked: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame = {
          val sh = ranked.withColumn("shard",
            expr(s"CAST(rank - 1 AS BIGINT) * ${nShards}L div ${n}L"))
          val shardDocs = sh.groupBy(col("shard"))
            .agg(count(lit(1)).as("m"))
          val cnts = sh.groupBy(col("shard"), col("source"))
            .agg(count(lit(1)).as("c"))
          shardDocs.crossJoin(broadcast(srcTot))
            .join(cnts, Seq("shard", "source"), "left")
            .withColumn("obs",
              expr("coalesce(c, 0L) * 1000000 div m"))
            .withColumn("exp", expr(s"ns * 1000000 div ${n}L"))
            .groupBy(col("shard"))
            .agg(max(col("m")).as("n_docs"),
              sum(when(coalesce(col("c"), lit(0L)) > 0L, 1L)
                .otherwise(0L)).as("n_sources"),
              expr("sum(abs(obs - exp)) div 2").as("tv_ppm"))
            .withColumn("ordering", lit(name))
        }
        val hashed = arm("hashed", graft.operators.GlobalRank.rowNumber(
          docs.withColumn("k", md5(col("doc_id").cast("string"))),
          "rank", col("k")))
        val sorted = arm("source_sorted",
          graft.operators.GlobalRank.rowNumber(
            docs, "rank", col("source"), col("doc_id")))
        val both = hashed.unionByName(sorted).localCheckpoint()
        val vd = both.groupBy(col("ordering"))
          .agg(max(col("tv_ppm")).as("mx"))
          .select(col("ordering"),
            when(col("mx") > 400000L, "clumped").otherwise(lit("mixed"))
              .as("verdict"))
        both.join(broadcast(vd), "ordering")
          .select(col("ordering"), col("shard"), col("n_docs"),
            col("n_sources"), col("tv_ppm"), col("verdict"))
          .orderBy(col("ordering"), col("shard"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source FROM documents),
              nn AS (
                SELECT count(*) AS n,
                  greatest(4, least(64, count(*) // 128)) AS k
                FROM docs),
              srct AS (
                SELECT source, count(*) AS ns FROM docs
                GROUP BY source),
              h AS (
                SELECT source, row_number() OVER (
                  ORDER BY md5(CAST(doc_id AS VARCHAR))) AS rank
                FROM docs),
              so AS (
                SELECT source, row_number() OVER (
                  ORDER BY source, doc_id) AS rank
                FROM docs),
              arms AS (
                SELECT 'hashed' AS ordering, source,
                  CAST(rank - 1 AS BIGINT) * nn.k // nn.n AS shard
                FROM h, nn
                UNION ALL
                SELECT 'source_sorted', source,
                  CAST(rank - 1 AS BIGINT) * nn.k // nn.n
                FROM so, nn),
              sd AS (
                SELECT ordering, shard, count(*) AS m
                FROM arms GROUP BY 1, 2),
              cn AS (
                SELECT ordering, shard, source, count(*) AS c
                FROM arms GROUP BY 1, 2, 3),
              dens AS (
                SELECT sd.ordering, sd.shard, sd.m, st.source, st.ns,
                  coalesce(cn.c, 0) AS c, nn.n
                FROM sd CROSS JOIN srct st CROSS JOIN nn
                LEFT JOIN cn ON cn.ordering = sd.ordering
                  AND cn.shard = sd.shard AND cn.source = st.source),
              tv AS (
                SELECT ordering, shard, max(m) AS n_docs,
                  sum(CASE WHEN c > 0 THEN 1 ELSE 0 END) AS n_sources,
                  sum(abs(c * 1000000 // m - ns * 1000000 // n)) // 2
                    AS tv_ppm
                FROM dens GROUP BY 1, 2),
              vd AS (
                SELECT ordering,
                  CASE WHEN max(tv_ppm) > 400000 THEN 'clumped'
                       ELSE 'mixed' END AS verdict
                FROM tv GROUP BY 1)
              SELECT t.ordering, CAST(t.shard AS BIGINT) AS shard,
                CAST(t.n_docs AS BIGINT) AS n_docs,
                CAST(t.n_sources AS BIGINT) AS n_sources,
                CAST(t.tv_ppm AS BIGINT) AS tv_ppm, v.verdict
              FROM tv t JOIN vd v USING (ordering)
              ORDER BY t.ordering, t.shard"""))
  )
}
