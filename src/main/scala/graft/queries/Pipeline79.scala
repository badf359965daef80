package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 pack, sixth batch — the release-cut composition: the whole
  * training-data release pipeline (dedup → quality → decontamination →
  * budget → manifest) as ONE chained-oracle operator, the q136
  * (curation) / q332 (linkage) / q381 (multimodal) treatment for the
  * release axis.
  */
object Pipeline79 {

  val entries: Seq[QEntry] = Seq(

    // Release cut, end to end — one row per corpus doc, each stage
    // running only on the previous stage's survivors:
    //  1. DEDUP (q30's exact collapse): every 20th doc arrives twice
    //     (+10M re-upload); non-min-id members of an md5(text) group
    //     drop as 'duplicate';
    //  2. QUALITY (q385's scorer): stopword density < 500 bp drops as
    //     'low_quality' (the fluency floor);
    //  3. DECONTAMINATION (q359's family at exact grain): every 50th
    //     base doc is designated benchmark/eval content — surviving
    //     docs whose text digest appears in the benchmark set drop as
    //     'contaminated';
    //  4. BUDGET (q384's waterfill): 2·Σtokens milli-token budget over
    //     the SURVIVING per-source token masses under md5-derived
    //     per-source epoch caps ∈ {1..4} — every kept doc carries its
    //     source's alloc_milli (how many epochs this doc trains);
    //  5. MANIFEST (q352/q356's folds): kept docs hash into ≤256
    //     per-source buckets; each kept row carries its bucket and its
    //     source's release root — the integrity record the next
    //     release diffs against.
    // The oracle replays collapse → score → benchmark join → breakpoint
    // waterfill → folds on exactly the same survivor sets; verdict
    // variety (all four drop stages + kept) is pinned by the spec.
    QEntry("q392_release_pipeline",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val corpus = base
          .union(base.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              col("source"), col("text")))
          .localCheckpoint() // manifest spine + dedup groups
        // stage 1: exact collapse
        val reps = corpus.groupBy(md5(col("text")).as("h"))
          .agg(min(col("doc_id")).as("rep_id"))
        val s1 = corpus.join(reps,
            corpus("doc_id") === reps("rep_id"))
          .select(col("doc_id"), col("source"), col("text"), col("h"))
          .localCheckpoint() // dedup survivors feed stages 2-5
        // stage 2: quality floor
        val scored = s1
          .withColumn("toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"))
          .withColumn("score_bp",
            expr("CAST(" +
              "size(filter(split(lower(text), '\\\\s+'), w -> w IN (" +
              "'the','a','of','and','to','in','is','on','for','with'" +
              "))) AS BIGINT) * 10000 div greatest(1L, toks)"))
          .localCheckpoint() // scores ride into the manifest
        val s2 = scored.filter(col("score_bp") >= 500L)
        // stage 3: exact-grain decontamination
        val bench = base.filter(col("doc_id") % 50 === 0)
          .select(md5(col("text")).as("h")).distinct()
        val s3 = s2.join(broadcast(bench), Seq("h"), "left_anti")
          .localCheckpoint() // the release: budget + manifest inputs
        val contaminated = s2.join(broadcast(bench), Seq("h"))
          .select(col("doc_id"), lit("contaminated").as("st3"))
        // stage 4: waterfill over surviving source masses (q384)
        val tok = s3.groupBy(col("source"))
          .agg(sum(col("toks")).as("t"))
          .withColumn("cap_milli",
            lit(1000L) + lit(1000L) *
              (conv(substring(md5(col("source")), 1, 2), 16, 10)
                .cast("long") % 4))
        val cap = graft.pipeline.Stats
          .boundedDim(tok, "q392 source dim", 100000L)
          .localCheckpoint()
        val tot = cap.agg(sum(col("t")).as("total_t"),
          (sum(col("t")) * 2000L).as("budget"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cap_milli"), col("source"))
        val wcum = w.rowsBetween(org.apache.spark.sql.expressions
          .Window.unboundedPreceding, 0)
        val cand = cap
          .withColumn("k", row_number().over(w))
          .withColumn("cumct", sum(col("cap_milli") * col("t")).over(wcum))
          .withColumn("cumt", sum(col("t")).over(wcum))
          .withColumn("prevcap",
            coalesce(lag(col("cap_milli"), 1).over(w), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("lam",
            expr("(budget - (cumct - cap_milli * t)) div " +
              "(total_t - (cumt - t))"))
        val validLam = cand
          .filter(col("prevcap") <= col("lam") &&
            col("lam") <= col("cap_milli"))
          .orderBy(col("k")).limit(1)
          .select(col("lam"), lit(0L).as("pri"))
        val fallback = cap.agg(max(col("cap_milli")).as("lam"))
          .select(col("lam"), lit(1L).as("pri"))
        val lamf = validLam.union(fallback)
          .orderBy(col("pri")).limit(1).select(col("lam"))
        val alloc = cap.crossJoin(broadcast(lamf))
          .select(col("source"),
            least(col("cap_milli"), col("lam")).as("alloc_milli"))
        // stage 5: per-source bucket folds + release roots (q352/q356)
        val folds = graft.pipeline.Manifest.bucketFolds(
            s3.select(col("source"), col("doc_id"), col("text")))
        val roots = graft.pipeline.Manifest.roots(folds)
          .select(col("source"), col("root"))
        val kept = s3
          .select(col("doc_id"),
            pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), col("text"))), 1, 15), 16, 10).cast("long"),
              lit(256L)).as("bucket"),
            col("source").as("ksrc"))
          .join(broadcast(alloc),
            col("ksrc") === alloc("source"))
          .drop("source")
          .join(broadcast(roots), col("ksrc") === roots("source"))
          .select(col("doc_id"), col("bucket"), col("alloc_milli"),
            col("root"))
        corpus.select(col("doc_id"), col("source"))
          .join(s1.select(col("doc_id"), lit(1L).as("in1")),
            Seq("doc_id"), "left")
          .join(scored.select(col("doc_id"), col("score_bp")),
            Seq("doc_id"), "left")
          .join(contaminated, Seq("doc_id"), "left")
          .join(kept, Seq("doc_id"), "left")
          .withColumn("stage",
            when(col("in1").isNull, "duplicate")
              .when(col("score_bp") < 500L, "low_quality")
              .when(col("st3").isNotNull, col("st3"))
              .otherwise(lit("kept")))
          .withColumn("verdict",
            when(col("stage") === "kept", "keep").otherwise(lit("drop")))
          .select(col("doc_id"), col("source"), col("verdict"),
            col("stage"), col("score_bp"), col("alloc_milli"),
            col("bucket"), col("root"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text FROM documents),
              corpus AS (
                SELECT doc_id, source, text FROM base
                UNION ALL
                SELECT doc_id + 10000000, source, text FROM base
                WHERE doc_id % 20 = 0),
              grp AS (
                SELECT md5(text) AS h, min(doc_id) AS rep_id
                FROM corpus GROUP BY md5(text)),
              s1 AS (
                SELECT c.doc_id, c.source, c.text, g.h
                FROM corpus c JOIN grp g ON g.rep_id = c.doc_id),
              scored AS (
                SELECT doc_id, source, text, h,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) * 10000
                    // greatest(1, CAST(len(string_split_regex(
                      lower(text), '\s+')) AS BIGINT)) AS score_bp
                FROM s1),
              s2 AS (SELECT * FROM scored WHERE score_bp >= 500),
              bench AS (
                SELECT DISTINCT md5(text) AS h FROM base
                WHERE doc_id % 50 = 0),
              s3 AS (
                SELECT * FROM s2
                WHERE h NOT IN (SELECT h FROM bench)),
              tok AS (
                SELECT source, sum(toks) AS t,
                  1000 + 1000 * (('0x' || substr(md5(source), 1, 2))
                    ::BIGINT % 4) AS cap_milli
                FROM s3 GROUP BY source),
              tot AS (
                SELECT sum(t) AS total_t, 2000 * sum(t) AS budget
                FROM tok),
              r AS (
                SELECT source, t, cap_milli,
                  row_number() OVER (ORDER BY cap_milli, source) AS k,
                  sum(cap_milli * t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumct,
                  sum(t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumt,
                  coalesce(lag(cap_milli, 1) OVER (ORDER BY cap_milli,
                    source), 0) AS prevcap
                FROM tok),
              cand AS (
                SELECT k, prevcap, cap_milli,
                  (tot.budget - (cumct - cap_milli * t))
                    // (tot.total_t - (cumt - t)) AS lam
                FROM r, tot),
              lamf AS (
                SELECT coalesce(
                  (SELECT lam FROM cand
                   WHERE prevcap <= lam AND lam <= cap_milli
                   ORDER BY k LIMIT 1),
                  (SELECT max(cap_milli) FROM tok)) AS lam),
              alloc AS (
                SELECT source,
                  CAST(least(cap_milli, lam) AS BIGINT) AS alloc_milli
                FROM tok, lamf),
              rh AS (
                SELECT source, doc_id,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || text), 1, 15))::BIGINT AS h15
                FROM s3),
              folds AS (
                SELECT source, h15 % 256 AS b,
                  CAST(sum(CAST(h15 AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold
                FROM rh GROUP BY source, h15 % 256),
              roots AS (
                SELECT source,
                  md5(string_agg(lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                    || CAST(fold AS VARCHAR), '|'
                    ORDER BY lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                    || CAST(fold AS VARCHAR))) AS root
                FROM folds GROUP BY source),
              man AS (
                SELECT c.doc_id, c.source,
                  CASE WHEN s1.doc_id IS NULL THEN 'duplicate'
                       WHEN sc.score_bp < 500 THEN 'low_quality'
                       WHEN sc.h IN (SELECT h FROM bench)
                         THEN 'contaminated'
                       ELSE 'kept' END AS stage,
                  sc.score_bp,
                  CASE WHEN s3.doc_id IS NOT NULL
                    THEN rh.h15 % 256 END AS bucket,
                  CASE WHEN s3.doc_id IS NOT NULL
                    THEN a.alloc_milli END AS alloc_milli,
                  CASE WHEN s3.doc_id IS NOT NULL THEN rt.root END
                    AS root
                FROM corpus c
                LEFT JOIN s1 ON s1.doc_id = c.doc_id
                LEFT JOIN scored sc ON sc.doc_id = c.doc_id
                LEFT JOIN s3 ON s3.doc_id = c.doc_id
                LEFT JOIN rh ON rh.doc_id = c.doc_id
                LEFT JOIN alloc a ON a.source = c.source
                LEFT JOIN roots rt ON rt.source = c.source)
              SELECT doc_id, source,
                CASE WHEN stage = 'kept' THEN 'keep' ELSE 'drop' END
                  AS verdict,
                stage, CAST(score_bp AS BIGINT) AS score_bp,
                CAST(alloc_milli AS BIGINT) AS alloc_milli,
                CAST(bucket AS BIGINT) AS bucket, root
              FROM man
              ORDER BY doc_id""")),

    // Incremental release wave — q392's production shape: release 1
    // (doc_id % 7 ≠ 0) has SHIPPED (its gates already ran; its digest
    // set and manifest state are what remains), and the ~14% wave
    // arrives against that state, one manifest row per ARRIVAL (the
    // q331 convention: shipped-corpus structure is state, not output):
    //  - 'duplicate': the arrival's digest is already in the seen-set
    //    (every 21st wave doc arrives carrying the text of its seed
    //    neighbor doc_id−1 — the re-upload plant);
    //  - 'low_quality' / 'contaminated': q392's gates on the arrival
    //    (benchmark slice = doc_id % 10 = 0 here so the wave actually
    //    intersects it);
    //  - kept arrivals re-solve the epoch waterfill over the UNION
    //    masses (shipped survivors + wave keeps) and carry the
    //    per-source root AFTER the wave, computed by the REAL
    //    incremental-manifest operator (Manifest.IncrementalManifest,
    //    two processBatch calls) — equal to the batch fold over the
    //    union by the mergeability identity, which is exactly what the
    //    oracle replays.
    QEntry("q393_incremental_release",
      (s, d) => {
        import s.implicits._
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .localCheckpoint() // seed + wave + swap sides
        def withScore(df: org.apache.spark.sql.DataFrame) = df
          .withColumn("toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"))
          .withColumn("score_bp",
            expr("CAST(" +
              "size(filter(split(lower(text), '\\\\s+'), w -> w IN (" +
              "'the','a','of','and','to','in','is','on','for','with'" +
              "))) AS BIGINT) * 10000 div greatest(1L, toks)"))
        val bench = base.filter(col("doc_id") % 10 === 0)
          .select(md5(col("text")).as("h")).distinct()
          .localCheckpoint() // broadcast into seed + wave gates
        val seedSurv = withScore(base.filter(col("doc_id") % 7 =!= 0))
          .filter(col("score_bp") >= 500L)
          .withColumn("h", md5(col("text")))
          .join(broadcast(bench), Seq("h"), "left_anti")
          .localCheckpoint() // shipped release: digests, budget, state
        val seedDigests = base.filter(col("doc_id") % 7 =!= 0)
          .select(md5(col("text")).as("h")).distinct()
        val wave = withScore(base.filter(col("doc_id") % 7 === 0)
          .join(base.select((col("doc_id") + 1L).as("doc_id"),
            col("text").as("prev_text")), Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 21 === 0 && col("prev_text").isNotNull,
              col("prev_text")).otherwise(col("text")).as("text")))
          .withColumn("h", md5(col("text")))
          .join(broadcast(seedDigests.select(col("h"),
            lit(1L).as("seen"))), Seq("h"), "left")
          .join(broadcast(bench.select(col("h"), lit(1L).as("bm"))),
            Seq("h"), "left")
          .withColumn("stage",
            when(col("seen").isNotNull, "duplicate")
              .when(col("score_bp") < 500L, "low_quality")
              .when(col("bm").isNotNull, "contaminated")
              .otherwise(lit("kept")))
          .localCheckpoint() // manifest spine + kept arm
        val waveKept = wave.filter(col("stage") === "kept")
        // budget over the union masses (q384/q392 waterfill)
        val tok = seedSurv.select(col("source"), col("toks"))
          .union(waveKept.select(col("source"), col("toks")))
          .groupBy(col("source")).agg(sum(col("toks")).as("t"))
          .withColumn("cap_milli",
            lit(1000L) + lit(1000L) *
              (conv(substring(md5(col("source")), 1, 2), 16, 10)
                .cast("long") % 4))
        val cap = graft.pipeline.Stats
          .boundedDim(tok, "q393 source dim", 100000L)
          .localCheckpoint()
        val tot = cap.agg(sum(col("t")).as("total_t"),
          (sum(col("t")) * 2000L).as("budget"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cap_milli"), col("source"))
        val wcum = w.rowsBetween(org.apache.spark.sql.expressions
          .Window.unboundedPreceding, 0)
        val cand = cap
          .withColumn("k", row_number().over(w))
          .withColumn("cumct", sum(col("cap_milli") * col("t")).over(wcum))
          .withColumn("cumt", sum(col("t")).over(wcum))
          .withColumn("prevcap",
            coalesce(lag(col("cap_milli"), 1).over(w), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("lam",
            expr("(budget - (cumct - cap_milli * t)) div " +
              "(total_t - (cumt - t))"))
        val validLam = cand
          .filter(col("prevcap") <= col("lam") &&
            col("lam") <= col("cap_milli"))
          .orderBy(col("k")).limit(1)
          .select(col("lam"), lit(0L).as("pri"))
        val fallback = cap.agg(max(col("cap_milli")).as("lam"))
          .select(col("lam"), lit(1L).as("pri"))
        val lamf = validLam.union(fallback)
          .orderBy(col("pri")).limit(1).select(col("lam"))
        val alloc = cap.crossJoin(broadcast(lamf))
          .select(col("source"),
            least(col("cap_milli"), col("lam")).as("alloc_milli"))
        // roots AFTER the wave: the real incremental operator, seeded
        // with batch 0 (the shipped survivors), advanced by batch 1
        val inc = new graft.pipeline.Manifest.IncrementalManifest
        inc.processBatch(
          seedSurv.select(col("source"), col("doc_id"), col("text")), 0L)
        inc.processBatch(
          waveKept.select(col("source"), col("doc_id"), col("text")), 1L)
        val roots = inc.currentRoots()
          .map { case (src, _, root) => (src, root) }
          .toDF("rsrc", "root")
        val kept = waveKept
          .select(col("doc_id"),
            pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), col("text"))), 1, 15), 16, 10).cast("long"),
              lit(256L)).as("bucket"),
            col("source").as("ksrc"))
          .join(broadcast(alloc), col("ksrc") === alloc("source"))
          .drop("source")
          .join(broadcast(roots), col("ksrc") === col("rsrc"))
          .select(col("doc_id"), col("bucket"), col("alloc_milli"),
            col("root"))
        wave.select(col("doc_id"), col("source"), col("stage"),
            col("score_bp"))
          .join(kept, Seq("doc_id"), "left")
          .withColumn("verdict",
            when(col("stage") === "kept", "keep").otherwise(lit("drop")))
          .select(col("doc_id"), col("source"), col("verdict"),
            col("stage"), col("score_bp"), col("alloc_milli"),
            col("bucket"), col("root"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text FROM documents),
              bench AS (
                SELECT DISTINCT md5(text) AS h FROM base
                WHERE doc_id % 10 = 0),
              seedsc AS (
                SELECT doc_id, source, text,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) * 10000
                    // greatest(1, CAST(len(string_split_regex(
                      lower(text), '\s+')) AS BIGINT)) AS score_bp
                FROM base WHERE doc_id % 7 != 0),
              seedsurv AS (
                SELECT * FROM seedsc
                WHERE score_bp >= 500
                  AND md5(text) NOT IN (SELECT h FROM bench)),
              seeddig AS (
                SELECT DISTINCT md5(text) AS h FROM base
                WHERE doc_id % 7 != 0),
              wave0 AS (
                SELECT w.doc_id, w.source,
                  CASE WHEN w.doc_id % 21 = 0 AND p.text IS NOT NULL
                    THEN p.text ELSE w.text END AS text
                FROM base w LEFT JOIN base p ON p.doc_id = w.doc_id - 1
                WHERE w.doc_id % 7 = 0),
              wsc AS (
                SELECT doc_id, source, text,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) * 10000
                    // greatest(1, CAST(len(string_split_regex(
                      lower(text), '\s+')) AS BIGINT)) AS score_bp
                FROM wave0),
              man0 AS (
                SELECT doc_id, source, text, toks, score_bp,
                  CASE WHEN md5(text) IN (SELECT h FROM seeddig)
                         THEN 'duplicate'
                       WHEN score_bp < 500 THEN 'low_quality'
                       WHEN md5(text) IN (SELECT h FROM bench)
                         THEN 'contaminated'
                       ELSE 'kept' END AS stage
                FROM wsc),
              wkept AS (SELECT * FROM man0 WHERE stage = 'kept'),
              tok AS (
                SELECT source, sum(toks) AS t,
                  1000 + 1000 * (('0x' || substr(md5(source), 1, 2))
                    ::BIGINT % 4) AS cap_milli
                FROM (SELECT source, toks FROM seedsurv
                      UNION ALL SELECT source, toks FROM wkept)
                GROUP BY source),
              tot AS (
                SELECT sum(t) AS total_t, 2000 * sum(t) AS budget
                FROM tok),
              r AS (
                SELECT source, t, cap_milli,
                  row_number() OVER (ORDER BY cap_milli, source) AS k,
                  sum(cap_milli * t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumct,
                  sum(t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumt,
                  coalesce(lag(cap_milli, 1) OVER (ORDER BY cap_milli,
                    source), 0) AS prevcap
                FROM tok),
              cand AS (
                SELECT k, prevcap, cap_milli,
                  (tot.budget - (cumct - cap_milli * t))
                    // (tot.total_t - (cumt - t)) AS lam
                FROM r, tot),
              lamf AS (
                SELECT coalesce(
                  (SELECT lam FROM cand
                   WHERE prevcap <= lam AND lam <= cap_milli
                   ORDER BY k LIMIT 1),
                  (SELECT max(cap_milli) FROM tok)) AS lam),
              alloc AS (
                SELECT source,
                  CAST(least(cap_milli, lam) AS BIGINT) AS alloc_milli
                FROM tok, lamf),
              rh AS (
                SELECT source, doc_id,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || text), 1, 15))::BIGINT AS h15
                FROM (SELECT source, doc_id, text FROM seedsurv
                      UNION ALL SELECT source, doc_id, text FROM wkept)),
              folds AS (
                SELECT source, h15 % 256 AS b,
                  CAST(sum(CAST(h15 AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold
                FROM rh GROUP BY source, h15 % 256),
              roots AS (
                SELECT source,
                  md5(string_agg(lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                    || CAST(fold AS VARCHAR), '|'
                    ORDER BY lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                    || CAST(fold AS VARCHAR))) AS root
                FROM folds GROUP BY source)
              SELECT m.doc_id, m.source,
                CASE WHEN m.stage = 'kept' THEN 'keep' ELSE 'drop' END
                  AS verdict,
                m.stage, CAST(m.score_bp AS BIGINT) AS score_bp,
                CASE WHEN m.stage = 'kept' THEN a.alloc_milli END
                  AS alloc_milli,
                CASE WHEN m.stage = 'kept' THEN
                  ('0x' || substr(md5(CAST(m.doc_id AS VARCHAR) || ':'
                    || m.text), 1, 15))::BIGINT % 256 END AS bucket,
                CASE WHEN m.stage = 'kept' THEN rt.root END AS root
              FROM man0 m
              LEFT JOIN alloc a ON a.source = m.source
              LEFT JOIN roots rt ON rt.source = m.source
              ORDER BY m.doc_id"""))
  )
}
