package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, first batch — the detector-disagreement audit's
  * PRODUCTION arm (VERDICT r14 item 2): exact collapse first, both
  * detectors at rep grain, output at disagreement-CELL grain with
  * implied-pair accounting (the q321/q275 collapse contract), so the
  * audit's cost is bounded by distinct content and its output by the
  * calibration surface — never by raw duplicate mass. q387 stays the
  * pair-grain EVAL arm.
  */
object Pipeline80 {

  /** Collapse-first disagreement-cell census over an explicit
    * (doc_id, text) corpus — q394's body, callable by the scale
    * harness (tools.DisagreeScale) on synthetic dup-dense corpora:
    * exact md5 collapse to min-id reps, both detectors at rep grain,
    * one verify pass, cell-grain output with implied-pair expansion. */
  private[graft] def auditCells(corpus: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val (reps0, _) = graft.pipeline.Dedup
      .collapseExactDocs(corpus, "doc_id", "text")
    // round 18 note: a defaultParallelism key-hash repartition here was
    // MEASURED NET-NEGATIVE (q394 6.7 -> 8.1 s at 32c): the detector
    // stages already ran 5 tasks and the 32-way layout only multiplied
    // per-task overhead (see OPTIMIZATION_r18.md "measured and
    // reverted"). Kept at the collapse layout.
    val reps = reps0.localCheckpoint() // toks + both detectors + n_dups×2
    val toks = graft.pipeline.Dedup
      .tokenArrays(reps, "doc_id", "text")
      .localCheckpoint() // mh verify + simhash-only verify
    val mh = graft.pipeline.Dedup.verifyJaccard(
        Pipeline.minhashCandidatesOver(
          reps.select(col("doc_id"), col("text"))), toks, 0.0)
      .filter(col("inter") * 5 >= col("uni") * 4)
      .localCheckpoint() // audit left side + anti-join for sh-only
    val sig = Pipeline.portableSimhash32(
        reps.select(col("doc_id"), col("text")))
      .localCheckpoint() // bands + per-pair hamming evidence
    val width = Pipeline.SimBits / 4
    val mask = (1L << width) - 1
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * width)
          .bitwiseAND(lit(mask)).as("bval"))
    }
    val buckets = sig
      .select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
    val grouped = graft.pipeline.Dedup
      .dropOversizedBuckets(buckets, Seq("band", "bval"), 1000)
      .groupBy(col("band"), col("bval"))
      .agg(sort_array(collect_list(struct(col("doc_id"),
        col("simhash")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.getField("doc_id").as("a_id"),
          b.getField("doc_id").as("b_id"),
          a.getField("simhash").as("ha"),
          b.getField("simhash").as("hb")))))
    val sh = grouped.select(explode(combos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        expr("bit_count(p.ha ^ p.hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3L)
      .select(col("a_id"), col("b_id")).distinct()
      .localCheckpoint() // flaggedMh join + sh-only anti-join
    // jaccard evidence verified once: mh pairs carry theirs,
    // simhash_only pairs get the single extra verify pass
    val flaggedMh = mh
      .join(sh.withColumn("sm", lit(1L)), Seq("a_id", "b_id"), "left")
      .select(col("a_id"), col("b_id"),
        when(col("sm").isNotNull, "both").otherwise(lit("minhash_only"))
          .as("flagged_by"),
        col("inter"), col("uni"))
    val flaggedSh = graft.pipeline.Dedup.verifyJaccard(
        sh.join(mh.select(col("a_id"), col("b_id")),
          Seq("a_id", "b_id"), "left_anti"), toks, 0.0)
      .select(col("a_id"), col("b_id"),
        lit("simhash_only").as("flagged_by"), col("inter"), col("uni"))
    flaggedMh.unionByName(flaggedSh)
      .join(sig.select(col("doc_id").as("a_id"),
        col("simhash").as("ha")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"),
        col("simhash").as("hb")), "b_id")
      .join(reps.select(col("doc_id").as("a_id"),
        col("n_dups").as("na")), "a_id")
      .join(reps.select(col("doc_id").as("b_id"),
        col("n_dups").as("nb")), "b_id")
      .groupBy(col("flagged_by"),
        expr("(inter * 10000 div uni) div 500").as("j_band"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"))
      .agg(count(lit(1)).as("n_rep_pairs"),
        sum(col("na") * col("nb")).as("implied_pairs"))
      .orderBy(col("flagged_by"), col("j_band"), col("hamming"))
  }


  /** q395's oracle: q393's chain with the wave split into 3 batches by
    * (doc_id div 7) % 3, the dup gate extended to earlier arrivals
    * (state absorbs every seen digest), and the waterfill + manifest
    * roots replayed per BATCH PREFIX — each manifest row reads the
    * alloc/root as of its own batch, the q331 emission convention. */
  private def releaseGateSql: String = {
    val perBatch = (0 until 3).map { b =>
      s"""tok$b AS (
            SELECT source, sum(toks) AS t,
              1000 + 1000 * (('0x' || substr(md5(source), 1, 2))
                ::BIGINT % 4) AS cap_milli
            FROM (SELECT source, toks FROM seedsurv
                  UNION ALL SELECT source, toks FROM wkept
                  WHERE b <= $b)
            GROUP BY source),
          tot$b AS (
            SELECT sum(t) AS total_t, 2000 * sum(t) AS budget
            FROM tok$b),
          r$b AS (
            SELECT source, t, cap_milli,
              row_number() OVER (ORDER BY cap_milli, source) AS k,
              sum(cap_milli * t) OVER (ORDER BY cap_milli, source
                ROWS UNBOUNDED PRECEDING) AS cumct,
              sum(t) OVER (ORDER BY cap_milli, source
                ROWS UNBOUNDED PRECEDING) AS cumt,
              coalesce(lag(cap_milli, 1) OVER (ORDER BY cap_milli,
                source), 0) AS prevcap
            FROM tok$b),
          cand$b AS (
            SELECT k, prevcap, cap_milli,
              (t$b.budget - (cumct - cap_milli * t))
                // (t$b.total_t - (cumt - t)) AS lam
            FROM r$b, tot$b t$b),
          lamf$b AS (
            SELECT coalesce(
              (SELECT lam FROM cand$b
               WHERE prevcap <= lam AND lam <= cap_milli
               ORDER BY k LIMIT 1),
              (SELECT max(cap_milli) FROM tok$b)) AS lam),
          alloc$b AS (
            SELECT source,
              CAST(least(cap_milli, lam) AS BIGINT) AS alloc_milli
            FROM tok$b, lamf$b),
          rh$b AS (
            SELECT source, doc_id,
              ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                || text), 1, 15))::BIGINT AS h15
            FROM (SELECT source, doc_id, text FROM seedsurv
                  UNION ALL SELECT source, doc_id, text FROM wkept
                  WHERE b <= $b)),
          folds$b AS (
            SELECT source, h15 % 256 AS bk,
              CAST(sum(CAST(h15 AS HUGEINT))
                % 2305843009213693951 AS BIGINT) AS fold
            FROM rh$b GROUP BY source, h15 % 256),
          roots$b AS (
            SELECT source,
              md5(string_agg(lpad(CAST(bk AS VARCHAR), 3, '0') || ':'
                || CAST(fold AS VARCHAR), '|'
                ORDER BY lpad(CAST(bk AS VARCHAR), 3, '0') || ':'
                || CAST(fold AS VARCHAR))) AS root
            FROM folds$b GROUP BY source)"""
    }.mkString(",\n              ")
    s"""WITH base AS (
          SELECT doc_id, source, text FROM documents),
        bench AS (
          SELECT DISTINCT md5(text) AS h FROM base
          WHERE doc_id % 10 = 0),
        seedsc AS (
          SELECT doc_id, source, text,
            CAST(len(string_split_regex(lower(text), '\\s+'))
              AS BIGINT) AS toks,
            CAST(len([w FOR w IN
              string_split_regex(lower(text), '\\s+')
              IF list_contains(['the','a','of','and','to','in',
                'is','on','for','with'], w)]) AS BIGINT) * 10000
              // greatest(1, CAST(len(string_split_regex(
                lower(text), '\\s+')) AS BIGINT)) AS score_bp
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
              THEN p.text ELSE w.text END AS text,
            (w.doc_id // 7) % 3 AS b
          FROM base w LEFT JOIN base p ON p.doc_id = w.doc_id - 1
          WHERE w.doc_id % 7 = 0),
        wsc AS (
          SELECT doc_id, source, text, b,
            CAST(len(string_split_regex(lower(text), '\\s+'))
              AS BIGINT) AS toks,
            CAST(len([w FOR w IN
              string_split_regex(lower(text), '\\s+')
              IF list_contains(['the','a','of','and','to','in',
                'is','on','for','with'], w)]) AS BIGINT) * 10000
              // greatest(1, CAST(len(string_split_regex(
                lower(text), '\\s+')) AS BIGINT)) AS score_bp
          FROM wave0),
        man0 AS (
          SELECT w.doc_id, w.source, w.text, w.b, w.toks, w.score_bp,
            CASE WHEN md5(w.text) IN (SELECT h FROM seeddig)
                   OR EXISTS (SELECT 1 FROM wsc w2
                     WHERE md5(w2.text) = md5(w.text)
                       AND (w2.b < w.b
                            OR (w2.b = w.b AND w2.doc_id < w.doc_id)))
                   THEN 'duplicate'
                 WHEN w.score_bp < 500 THEN 'low_quality'
                 WHEN md5(w.text) IN (SELECT h FROM bench)
                   THEN 'contaminated'
                 ELSE 'kept' END AS stage
          FROM wsc w),
        wkept AS (SELECT * FROM man0 WHERE stage = 'kept'),
        $perBatch,
        allocs AS (
          SELECT 0 AS b, * FROM alloc0
          UNION ALL SELECT 1, * FROM alloc1
          UNION ALL SELECT 2, * FROM alloc2),
        rootsu AS (
          SELECT 0 AS b, * FROM roots0
          UNION ALL SELECT 1, * FROM roots1
          UNION ALL SELECT 2, * FROM roots2)
        SELECT m.doc_id, m.source,
          CASE WHEN m.stage = 'kept' THEN 'keep' ELSE 'drop' END
            AS verdict,
          m.stage, CAST(m.score_bp AS BIGINT) AS score_bp,
          CASE WHEN m.stage = 'kept' THEN a.alloc_milli END
            AS alloc_milli,
          CASE WHEN m.stage = 'kept' THEN
            ('0x' || substr(md5(CAST(m.doc_id AS VARCHAR) || ':'
              || m.text), 1, 15))::BIGINT % 256 END AS bucket,
          CASE WHEN m.stage = 'kept' THEN rt.root END AS root,
          CAST(m.b AS BIGINT) AS batch_id
        FROM man0 m
        LEFT JOIN allocs a ON a.b = m.b AND a.source = m.source
        LEFT JOIN rootsu rt ON rt.b = m.b AND rt.source = m.source
        ORDER BY m.doc_id"""
  }

  val entries: Seq[QEntry] = Seq(

    // Detector disagreement cells — the default, collapse-first arm of
    // q387's calibration audit. Where q387 answers "show me every
    // disagreeing pair with its evidence" (the eval readout: output
    // grows with TRUE duplicate mass, quadratically on dup-dense
    // corpora — SCALE.md adjudicates its 100× wall), this answers the
    // question a rollout actually asks — "WHERE on the (Jaccard,
    // Hamming) surface do the detectors disagree, and how much raw
    // mass does each region carry" — at a cost bounded by distinct
    // content:
    //  1. exact md5 collapse to min-id reps (Dedup.collapseExactDocs —
    //     byte-identical docs are an identity for BOTH detectors:
    //     equal texts ⇒ equal shingle sets ⇒ equal MinHash signature,
    //     and equal token multisets ⇒ equal SimHash, so every exact
    //     group contributes `both` pairs trivially; collapsing them
    //     keeps n-way dup groups from squaring inside every band of
    //     both detectors);
    //  2. MinHash+LSH (q37's chain) and banded SimHash (q53's chain)
    //     on REPS ONLY, both with capped band buckets;
    //  3. full-outer audit at rep grain; exact Jaccard verified ONCE
    //     per audit pair (the mh arm already verified its candidates —
    //     only simhash_only pairs need the second look, unlike q387's
    //     re-verify-everything enrichment);
    //  4. cells: flagged_by × 500-bp Jaccard band × signature Hamming
    //     → rep-pair count + implied RAW pair mass (n_dups(a)·
    //     n_dups(b) — the lossless expansion contract), ordered on the
    //     ≤ (3 × 21 × 33)-row calibration surface, not on pairs.
    // Corpus: q387's mild (~J .85) and strong (~J .67) planted edits,
    // PLUS exact-dup plants (every 8th doc once, every 16th twice) so
    // the collapse and the implied-pair expansion are exercised at
    // gate SFs: cells containing a planted-copy rep carry
    // implied_pairs > n_rep_pairs.
    QEntry("q394_detector_disagreement_cells",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        def edit(m: Int, phaseMod: Int) = expr(
          s"""array_join(transform(split(lower(text), '\\\\s+'),
              (w, i) -> CASE WHEN i % $m = doc_id % $phaseMod
                THEN concat('zz', CAST(i AS STRING)) ELSE w END), ' ')""")
        auditCells(base
          .union(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              edit(12, 5).as("text")))
          .union(base.filter(col("doc_id") % 15 === 0)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              edit(5, 3).as("text")))
          .union(base.filter(col("doc_id") % 8 === 0)
            .select((col("doc_id") + 30000000L).as("doc_id"), col("text")))
          .union(base.filter(col("doc_id") % 16 === 0)
            .select((col("doc_id") + 40000000L).as("doc_id"), col("text"))))
      },
      Some(
        s"""WITH base AS (SELECT doc_id, text FROM documents),
            corpus AS (
              SELECT doc_id, text FROM base
              UNION ALL
              SELECT doc_id + 10000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 12 = doc_id % 5
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id + 20000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 5 = doc_id % 3
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 15 = 0
              UNION ALL
              SELECT doc_id + 30000000, text FROM base
              WHERE doc_id % 8 = 0
              UNION ALL
              SELECT doc_id + 40000000, text FROM base
              WHERE doc_id % 16 = 0),
            creps AS (
              SELECT min(doc_id) AS doc_id, text,
                CAST(count(*) AS BIGINT) AS n_dups
              FROM corpus GROUP BY text),
            ${Pipeline77.detectorAuditSql("creps")},
            cells AS (
              SELECT au.flagged_by,
                (i.inter * 10000 // (sa.ntok + sb.ntok - i.inter)) // 500
                  AS j_band,
                CAST(bit_count(xor(ga.simhash, gb.simhash)) AS BIGINT)
                  AS hamming,
                count(*) AS n_rep_pairs,
                CAST(sum(na.n_dups * nb.n_dups) AS BIGINT)
                  AS implied_pairs
              FROM audit au
              JOIN ainter i ON i.a_id = au.a_id AND i.b_id = au.b_id
              JOIN sizes sa ON sa.doc_id = au.a_id
              JOIN sizes sb ON sb.doc_id = au.b_id
              JOIN ssig ga ON ga.doc_id = au.a_id
              JOIN ssig gb ON gb.doc_id = au.b_id
              JOIN creps na ON na.doc_id = au.a_id
              JOIN creps nb ON nb.doc_id = au.b_id
              GROUP BY 1, 2, 3)
            SELECT flagged_by, j_band, hamming, n_rep_pairs,
              implied_pairs
            FROM cells
            ORDER BY flagged_by, j_band, hamming"""
      )),

    // Streaming release gate (VERDICT r14 item 4): q393's wave gate run
    // as a REAL Structured Streaming foreachBatch loop over running
    // release state (graft.pipeline.ReleaseGate.StreamingReleaseGate)
    // — the shape a 100 TB pipeline actually runs between release
    // cuts. The shipped release (doc_id % 7 != 0: digests of
    // everything seen, survivors' masses + manifest folds) is STATE;
    // the wave (doc_id % 7 = 0, with q393's every-21st re-upload
    // plant) arrives as THREE deterministic micro-batches
    // ((doc_id div 7) % 3, written as three ordered files, streamed
    // with maxFilesPerTrigger=1 under Trigger.AvailableNow — the
    // PHashSpec forced-micro-batch convention). Per batch: dup-vs-
    // state -> quality floor -> decontamination, kept arrivals absorb
    // into state, the epoch waterfill re-solves over the union masses
    // and the post-batch roots come from the REAL IncrementalManifest
    // — every manifest row carries alloc/root AS OF its batch (the
    // q331 emission convention), which is exactly what the oracle
    // replays per batch prefix. Pipeline80Spec pins stream == direct
    // processBatch replay.
    QEntry("q395_stream_release_gate",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .localCheckpoint() // seed + wave + swap sides
        val bench = base.filter(col("doc_id") % 10 === 0)
          .select(md5(col("text")).as("h")).distinct()
          .localCheckpoint() // seed gate + the gate's decontam dim
        val seed = base.filter(col("doc_id") % 7 =!= 0)
        val seedSurv = graft.pipeline.ReleaseGate.scored(seed)
          .filter(col("score_bp") >= 500L)
          .withColumn("h", md5(col("text")))
          .join(broadcast(bench), Seq("h"), "left_anti")
          .select(col("doc_id"), col("source"), col("text"))
        val seedDigests = seed.select(md5(col("text")).as("h")).distinct()
        val wave = base.filter(col("doc_id") % 7 === 0)
          .join(base.select((col("doc_id") + 1L).as("doc_id"),
            col("text").as("prev_text")), Seq("doc_id"), "left")
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % 21 === 0 && col("prev_text").isNotNull,
              col("prev_text")).otherwise(col("text")).as("text"))
        // three ordered arrival files -> three micro-batches: subdir
        // per batch, written sequentially (file-source order = mtime)
        val inDir = Scratch.dir(s, "q395_wave")
        for (b <- 0 until 3) {
          wave.filter(expr(s"(doc_id div 7) % 3 = $b"))
            .coalesce(1).write.mode("overwrite").parquet(s"$inDir/b$b")
          Thread.sleep(15) // distinct mtimes pin the batch order
        }
        val emitted = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        val gate = new graft.pipeline.ReleaseGate.StreamingReleaseGate(
          seedSurv, seedDigests, bench,
          onManifest = df => emitted.synchronized { emitted += df })
        val stream = s.readStream.schema(wave.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$inDir/b*")
        val q = gate.start(stream)
        q.awaitTermination()
        emitted.reduce(_ union _).orderBy(col("doc_id"))
      },
      Some(releaseGateSql)),

    // Release-history trend monitoring (VERDICT r14 item 5): q382
    // scores ONE (old, new) release pair — a slow extraction rot that
    // never crosses a single-pair threshold stays invisible to it. This
    // derives FIVE successive synthetic releases and scores the
    // per-source metric TIME-SERIES with the one-sided CUSUM (q240's
    // Stats.cusum) next to the naive per-step detector:
    //  - the md5-rank-1 source ROTS: each release truncates its docs'
    //    texts another ~5% (real text truncation, re-tokenized — the
    //    extraction-rot shape: a parser regression shaving content a
    //    little more each cut). Per-step delta ~41-50 pm, UNDER the
    //    60 pm step threshold — the naive detector never pages — but
    //    the slack-20 CUSUM accumulates to 110 pm > the 100 pm trend
    //    threshold by release 4: the unique 'trend_alert';
    //  - the md5-rank-2 source BLIPS: release 2 only truncates ~8%
    //    (72 pm, over the step threshold) and fully recovers — the
    //    step detector pages ('step_warn'), the CUSUM correctly
    //    resets (max 52 pm, no trend alert): transients page once,
    //    they don't escalate;
    //  - every other source is release-stable: steps 0, verdict 'ok'.
    // Metric: per-(source, release) mean token count in milli (q388's
    // integer-moment discipline); deltas in per-mille of the source's
    // OWN release-0 baseline, so the thresholds are scale-free. One
    // (source x 5)-row evidence frame, all arithmetic at dimension
    // grain after one corpus scan per release variant.
    QEntry("q396_release_trend_monitor",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
        val ranked = graft.pipeline.Stats.boundedDim(
            docs.select(col("source")).distinct(),
            "q396 source dim", 100000L)
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(md5(col("source")), col("source"))))
        val rel = docs.join(broadcast(ranked), "source")
          .select(col("source"), col("rn"), col("text"),
            explode(sequence(lit(0), lit(4))).as("r"))
          .withColumn("toks0",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"))
          .withColumn("fr",
            when(col("rn") === 1, lit(1000L) - lit(50L) * col("r"))
              .when(col("rn") === 2 && col("r") === 2, lit(920L))
              .otherwise(lit(1000L)))
          .withColumn("keep",
            greatest(lit(1L), expr("(toks0 * fr + 999) div 1000")))
          .withColumn("toks",
            graft.pipeline.TextAnalysis.tokenCount(
              expr("array_join(slice(split(text, '\\\\s+'), 1, " +
                "CAST(keep AS INT)), ' ')")).cast("long"))
        val m = rel.groupBy(col("source"), col("r"))
          .agg(expr("sum(toks) * 1000 div count(1)").as("mean_milli"))
          .localCheckpoint() // (source x 5) dim: baseline + series
        val m0 = m.filter(col("r") === 0)
          .select(col("source"), col("mean_milli").as("mm0"))
        val wS = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("r"))
        val series = m.join(broadcast(m0), "source")
          .withColumn("delta_pm",
            expr("(mm0 - mean_milli) * 1000 div mm0"))
          .withColumn("step_pm", col("delta_pm") -
            coalesce(lag(col("delta_pm"), 1).over(wS), lit(0L)))
          .withColumn("dev", col("step_pm") - lit(20L))
        val cus = graft.pipeline.Stats
          .cusum(series, col("source"), col("r"), col("dev"), "cusum_pm")
          .localCheckpoint() // evidence rows + per-source maxima
        val verdicts = cus.groupBy(col("source"))
          .agg(max(col("cusum_pm")).as("mc"), max(col("step_pm")).as("ms"))
          .select(col("source"),
            when(col("mc") > 100L, "trend_alert")
              .when(col("ms") > 60L, "step_warn")
              .otherwise(lit("ok")).as("verdict"))
        cus.join(broadcast(verdicts), "source")
          .select(col("source"), col("r").cast("long").as("release"),
            col("mean_milli"), col("delta_pm"), col("step_pm"),
            col("cusum_pm"), col("verdict"))
          .orderBy(col("source"), col("release"))
      },
      Some("""WITH docs AS (
                SELECT source, doc_id, text FROM documents),
              ranked AS (
                SELECT source,
                  row_number() OVER (ORDER BY md5(source), source) AS rn
                FROM (SELECT DISTINCT source FROM docs)),
              rel AS (
                SELECT d.source, rk.rn, d.text, r.r,
                  CAST(len(string_split_regex(lower(d.text), '\s+'))
                    AS BIGINT) AS toks0
                FROM docs d JOIN ranked rk USING (source),
                  (SELECT unnest(range(5)) AS r) r),
              tk AS (
                SELECT source, r,
                  CAST(len(string_split_regex(lower(array_to_string(
                    string_split_regex(text, '\s+')[1:CAST(
                      greatest(1, (toks0 * (CASE
                        WHEN rn = 1 THEN 1000 - 50 * r
                        WHEN rn = 2 AND r = 2 THEN 920
                        ELSE 1000 END) + 999) // 1000) AS INT)],
                    ' ')), '\s+')) AS BIGINT) AS toks
                FROM rel),
              m AS (
                SELECT source, r,
                  sum(toks) * 1000 // count(*) AS mean_milli
                FROM tk GROUP BY 1, 2),
              m0 AS (
                SELECT source, mean_milli AS mm0 FROM m WHERE r = 0),
              ser AS (
                SELECT m.source, m.r, m.mean_milli,
                  (m0.mm0 - m.mean_milli) * 1000 // m0.mm0 AS delta_pm
                FROM m JOIN m0 USING (source)),
              stp AS (
                SELECT source, r, mean_milli, delta_pm,
                  delta_pm - coalesce(lag(delta_pm, 1)
                    OVER (PARTITION BY source ORDER BY r), 0) AS step_pm
                FROM ser),
              cus AS (
                SELECT source, r, mean_milli, delta_pm, step_pm,
                  p - least(0, min(p) OVER (PARTITION BY source
                    ORDER BY r ROWS UNBOUNDED PRECEDING)) AS cusum_pm
                FROM (
                  SELECT *, sum(step_pm - 20) OVER (PARTITION BY source
                    ORDER BY r ROWS UNBOUNDED PRECEDING) AS p
                  FROM stp)),
              vd AS (
                SELECT source,
                  CASE WHEN max(cusum_pm) > 100 THEN 'trend_alert'
                       WHEN max(step_pm) > 60 THEN 'step_warn'
                       ELSE 'ok' END AS verdict
                FROM cus GROUP BY source)
              SELECT c.source, CAST(c.r AS BIGINT) AS release,
                CAST(c.mean_milli AS BIGINT) AS mean_milli,
                CAST(c.delta_pm AS BIGINT) AS delta_pm,
                CAST(c.step_pm AS BIGINT) AS step_pm,
                CAST(c.cusum_pm AS BIGINT) AS cusum_pm,
                v.verdict
              FROM cus c JOIN vd v USING (source)
              ORDER BY c.source, c.r"""))
  )
}
