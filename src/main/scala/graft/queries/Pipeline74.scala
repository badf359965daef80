package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 pack, first batch — the multimodal composition (VERDICT r13
  * item 3): q213's decode/frame arithmetic, q339's shot segmentation,
  * q328's dHash dedup and q353's VAD chained into ONE per-media
  * keep/drop manifest, every stage running only on the survivors of the
  * previous one, the whole chain replayed by one oracle — the q136
  * (curation) / q332 (linkage) treatment for the media axis.
  */
object Pipeline74 {

  /** The media corpus of the composed pipeline: every doc as a payload,
    * every 20th doc re-uploaded brightness-shifted (+40 clamped — the
    * q328 near-dup plant), every 25th re-uploaded byte-identical (the
    * exact-dup plant). Copy ids preserve id mod 20 (both offsets are
    * ≡ 0 mod 20), so a copy always reaches the dedup stage together
    * with its original and the planted drops actually fire. */
  private def media(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    base.select(col("doc_id").as("id"), col("text"), lit(0L).as("sh"))
      .union(base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 10000000L).as("id"), col("text"),
          lit(40L).as("sh")))
      .union(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 20000000L).as("id"), col("text"),
          lit(0L).as("sh")))
  }

  /** q339's shot detector at media grain (id-keyed cuts, text-keyed
    * stub luminances): 16 frames × 16 md5 cells → 8-bin histograms →
    * adjacent-frame L1 over a per-media window → (n_shots, max_shot).
    * Every window is ≤ 16 rows per key. */
  private def shotStats(surv: DataFrame): DataFrame = {
    val frames = surv
      .select(col("id"), col("text"),
        expr("3 + id % 5").as("c1"), expr("9 + id % 4").as("c2"),
        explode(sequence(lit(0), lit(15))).as("f"))
      .select(col("id"), col("f"),
        expr("""CASE WHEN f >= c2 THEN 'S2' WHEN f >= c1 THEN 'S1'
                ELSE 'S0' END""").as("seed"),
        col("text"))
    val hists = frames
      .select(col("id"), col("f"),
        explode(expr("""transform(sequence(0, 15), c ->
          CAST(conv(substring(md5(concat(text, ':', seed, ':',
            CAST(c AS STRING))), 1, 2), 16, 10) AS BIGINT)
            div 32)""")).as("bin"))
      .groupBy(col("id"), col("f"))
      .agg(array((0 until 8).map(b =>
        sum(when(col("bin") === b, 1L).otherwise(0L))): _*).as("h"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("f"))
    hists
      .withColumn("ph", lag(col("h"), 1).over(w))
      .withColumn("l1", when(col("ph").isNull, lit(0L))
        .otherwise(expr(
          "aggregate(zip_with(h, ph, (a, b) -> abs(a - b)), " +
            "0L, (acc, x) -> acc + x)")))
      .withColumn("is_cut", (col("l1") > lit(0L)).cast("long"))
      .withColumn("shot_idx", sum(col("is_cut")).over(w))
      .groupBy(col("id"), col("shot_idx"))
      .agg(count(lit(1)).as("sn"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shots"), max(col("sn")).as("max_shot"))
  }

  /** q353's VAD at media grain: 32 md5 energy frames with two planted
    * speech runs + a trailing blip, gaps-and-islands runs → hangover
    * merge (gap ≤ 2) → min-length drop (≥ 2 voiced) → TOTAL voiced
    * frames across kept segments. */
  private def vadTotals(surv: DataFrame): DataFrame = {
    val frames = surv
      .select(col("id"), col("text"),
        expr("2 + id % 4").as("rs1"),
        expr("2 + id % 4 + 2 + id % 3").as("re1"),
        expr("14 + id % 6").as("rs2"),
        expr("14 + id % 6 + 3 + id % 4").as("re2"),
        expr("14 + id % 6 + 3 + id % 4 + 2 + id % 3").as("blip"),
        explode(sequence(lit(0), lit(31))).as("f"))
      .withColumn("speech",
        expr("(f BETWEEN rs1 AND re1) OR (f BETWEEN rs2 AND re2) " +
          "OR f = blip"))
      .withColumn("energy",
        expr("CASE WHEN speech THEN 50 + " +
          "CAST(conv(substring(md5(concat(text, ':', " +
          "CAST(f AS STRING))), 1, 4), 16, 10) AS BIGINT) % 206 " +
          "ELSE CAST(conv(substring(md5(concat(text, ':', " +
          "CAST(f AS STRING))), 1, 4), 16, 10) AS BIGINT) % 50 END"))
      .withColumn("voiced", col("energy") >= 50L)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("f"))
    val runs = frames.filter(col("voiced"))
      .withColumn("rn", row_number().over(w))
      .withColumn("run_id", col("f") - col("rn"))
      .groupBy(col("id"), col("run_id"))
      .agg(min(col("f")).as("rs"), max(col("f")).as("re"),
        count(lit(1)).as("nv"))
    val wr = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("rs"))
    runs
      .withColumn("pe", lag(col("re"), 1).over(wr))
      .withColumn("brk",
        when(col("pe").isNull, 1L)
          .when(col("rs") - col("pe") - 1L > 2L, 1L).otherwise(0L))
      .withColumn("seg", sum(col("brk")).over(wr))
      .groupBy(col("id"), col("seg"))
      .agg(sum(col("nv")).as("seg_nv"))
      .filter(col("seg_nv") >= 2L)
      .groupBy(col("id"))
      .agg(sum(col("seg_nv")).as("n_voiced"))
  }

  /** The stage-3 oracle prelude (q328's FpsSql) parameterized by the
    * survivor CTE feeding it: per-id 56-bit dHash fingerprints from the
    * 64-cell md5 luminance grid (+sh clamped), fp-grain min-id groups,
    * 4×14-bit band buckets of reps, verified candidates. The `bok`
    * bucket filter replays the Spark side's per-(band, value) cap
    * exactly (ADVICE r14 item 1 — [[graft.pipeline.Dedup
    * .dropOversizedBuckets]] drops > 1000-rep buckets before the band
    * self-join; size-1 buckets emit no pairs either way). */
  private def fpsSqlOn(src: String): String =
    s"""cells64 AS (SELECT unnest(generate_series(0, 63)) AS cell),
       lums AS (
         SELECT m.id, m.cell64 AS cell,
           least(255, ('0x' || substr(md5(m.text || ':' ||
             CAST(m.cell64 AS VARCHAR)), 1, 2))::BIGINT + m.sh) AS lum
         FROM (SELECT s.id, s.text, s.sh, c.cell AS cell64
               FROM $src s, cells64 c) m),
       grids AS (
         SELECT id, list(lum ORDER BY cell) AS l
         FROM lums GROUP BY id),
       ks AS (SELECT unnest(generate_series(0, 55)) AS k),
       fps AS (
         SELECT g.id,
           sum(CASE WHEN g.l[(k // 7) * 8 + k % 7 + 1] >
                        g.l[(k // 7) * 8 + k % 7 + 2]
               THEN (1::BIGINT << CAST(k AS INTEGER))
               ELSE 0 END) AS fp
         FROM grids g, ks GROUP BY g.id),
       fgroups AS (
         SELECT fp, min(id) AS rep_id FROM fps GROUP BY fp),
       bands AS (
         SELECT rep_id AS id, fp, b,
           (fp // (1::BIGINT << CAST(b * 14 AS INTEGER))) % 16384 AS bv
         FROM fgroups, (SELECT unnest(generate_series(0, 3)) AS b)),
       bok AS (
         SELECT b, bv FROM bands
         GROUP BY b, bv HAVING count(*) BETWEEN 2 AND 1000),
       cand AS (
         SELECT DISTINCT a.id AS a_id, b.id AS b_id,
           a.fp AS fa, b.fp AS fb
         FROM bands a
         JOIN bok ON bok.b = a.b AND bok.bv = a.bv
         JOIN bands b
           ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)"""

  val entries: Seq[QEntry] = Seq(

    // Multimodal curation pipeline, end to end: per media —
    //  1. DECODE gate (q213's frame arithmetic): sampled-frame count
    //     (every 2nd 64-byte frame) must be ≥ 2, i.e. the payload
    //     decodes to enough material to feature-ize → 'decode_short';
    //  2. SHOT gate (q339 on decode survivors): detected max static
    //     scene ≤ 7 frames — an all-one-shot clip is a still, not a
    //     video → 'static_scene';
    //  3. DEDUP gate (q328's dhashNearDup on shot survivors): members
    //     of an equal-fingerprint group drop as 'duplicate', reps with
    //     a smaller surviving rep within Hamming ≤ 6 drop as
    //     'near_duplicate' (the collapse-first, capped-band operator
    //     REUSED, not re-derived);
    //  4. VAD gate (q353 on dedup survivors): total voiced frames
    //     across hangover-merged speech segments ≥ 10 → 'no_speech';
    //  5. FEATURES (q213 clip pooling, keepers only): the 4-dim mean-
    //     pooled byte-stripe clip vector a retrieval index would store.
    // Emits ONE row per media: verdict, the stage that dropped it, and
    // each stage's stats as far as it got (NULL past its drop point —
    // the manifest records what was actually computed, and the oracle
    // replays the chain stage by stage on exactly the same survivors).
    QEntry("q381_multimodal_pipeline",
      (s, d) => {
        import s.implicits._
        val al = media(s, d).localCheckpoint() // 3-arm corpus, manifest spine
        val st1 = al.withColumn("n_sampled",
          expr("((length(text) + 63) div 64 + 1) div 2"))
        val surv1 = st1.filter(col("n_sampled") >= 2L)
        val shots = shotStats(surv1)
          .localCheckpoint() // feeds gate + manifest
        val surv2 = surv1.join(shots, "id")
          .filter(col("max_shot") <= 7L)
          .localCheckpoint() // feeds dedup grid + survivors
        val drops3 = graft.pipeline.PHash
          .dhashNearDup(surv2.select(col("id"), col("text"), col("sh")))
          .groupBy(col("b_id"))
          .agg(min(col("kind")).as("k3")) // 'dup' < 'near'; disjoint anyway
          .select(col("b_id").as("id"),
            when(col("k3") === "dup", lit("duplicate"))
              .otherwise(lit("near_duplicate")).as("stage3"))
          .localCheckpoint() // gate + manifest label
        val surv3 = surv2.join(drops3, Seq("id"), "left_anti")
        val vad = vadTotals(surv3).localCheckpoint() // gate + manifest
        val surv4 = surv3.join(vad, "id")
          .filter(col("n_voiced") >= 10L)
        val pooled = graft.pipeline.Multimodal.frameFeatures(
            surv4.select(col("id").as("media_id"),
              encode(col("text"), "UTF-8").as("payload"))
              .as[graft.pipeline.Multimodal.MediaCell], 64, 2)
          .groupBy(col("media_id"))
          .agg(expr("sum(f0) div count(1)").as("p0"),
            expr("sum(f1) div count(1)").as("p1"),
            expr("sum(f2) div count(1)").as("p2"),
            expr("sum(f3) div count(1)").as("p3"))
        st1.select(col("id").as("media_id"), col("n_sampled"))
          .join(shots.select(col("id").as("media_id"), col("n_shots"),
            col("max_shot")), Seq("media_id"), "left")
          .join(drops3.select(col("id").as("media_id"), col("stage3")),
            Seq("media_id"), "left")
          .join(vad.select(col("id").as("media_id"), col("n_voiced")),
            Seq("media_id"), "left")
          .join(pooled, Seq("media_id"), "left")
          .withColumn("stage",
            when(col("n_sampled") < 2L, "decode_short")
              .when(col("max_shot") > 7L, "static_scene")
              .when(col("stage3").isNotNull, col("stage3"))
              .when(col("n_voiced") < 10L, "no_speech")
              .otherwise(lit("kept")))
          .withColumn("verdict",
            when(col("stage") === "kept", "keep").otherwise(lit("drop")))
          .select(col("media_id"), col("verdict"), col("stage"),
            col("n_sampled"), col("n_shots"), col("max_shot"),
            col("n_voiced"), col("p0"), col("p1"), col("p2"), col("p3"))
          .orderBy(col("media_id"))
      },
      Some(s"""WITH base AS (SELECT doc_id, text FROM documents),
              al AS (
                SELECT doc_id AS id, text, 0 AS sh FROM base
                UNION ALL
                SELECT doc_id + 10000000, text, 40 FROM base
                WHERE doc_id % 20 = 0
                UNION ALL
                SELECT doc_id + 20000000, text, 0 FROM base
                WHERE doc_id % 25 = 0),
              st1 AS (
                SELECT id, text, sh,
                  ((length(text) + 63) // 64 + 1) // 2 AS n_sampled
                FROM al),
              surv1 AS (SELECT * FROM st1 WHERE n_sampled >= 2),
              sfr AS (
                SELECT id, text, f.f,
                  CASE WHEN f.f >= 9 + id % 4 THEN 'S2'
                       WHEN f.f >= 3 + id % 5 THEN 'S1'
                       ELSE 'S0' END AS seed
                FROM surv1, (SELECT unnest(generate_series(0, 15)) AS f)
                  f),
              scells AS (
                SELECT id, f,
                  ('0x' || substr(md5(text || ':' || seed || ':' ||
                    CAST(c.c AS VARCHAR)), 1, 2))::BIGINT // 32 AS bin
                FROM sfr, (SELECT unnest(generate_series(0, 15)) AS c)
                  c),
              shists AS (
                SELECT id, f, bin, count(*) AS n
                FROM scells GROUP BY id, f, bin),
              shb AS (
                SELECT d.id, d.f, b.b, coalesce(h.n, 0) AS n
                FROM (SELECT DISTINCT id, f FROM scells) d
                CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b
                LEFT JOIN shists h ON h.id = d.id AND h.f = d.f
                  AND h.bin = b.b),
              sl1 AS (
                SELECT id, f, sum(abs(n - pn)) AS l1
                FROM (
                  SELECT id, f, b, n,
                    lag(n, 1, n) OVER (PARTITION BY id, b ORDER BY f)
                      AS pn
                  FROM shb)
                GROUP BY id, f),
              scuts AS (
                SELECT id, f,
                  CASE WHEN f = 0 THEN 0
                       WHEN l1 > 0 THEN 1 ELSE 0 END AS is_cut
                FROM sl1),
              sshots AS (
                SELECT id, shot_idx, count(*) AS sn FROM (
                  SELECT id, f,
                    sum(is_cut) OVER (PARTITION BY id ORDER BY f)
                      AS shot_idx
                  FROM scuts)
                GROUP BY id, shot_idx),
              shotstats AS (
                SELECT id, count(*) AS n_shots, max(sn) AS max_shot
                FROM sshots GROUP BY id),
              surv2 AS (
                SELECT s.id, s.text, s.sh
                FROM surv1 s JOIN shotstats st ON st.id = s.id
                WHERE st.max_shot <= 7),
              ${fpsSqlOn("surv2")},
              dupdrop AS (
                SELECT f.id, 'duplicate' AS stage3
                FROM fps f JOIN fgroups g
                  ON g.fp = f.fp AND f.id <> g.rep_id),
              neardrop AS (
                SELECT DISTINCT c.b_id AS id, 'near_duplicate' AS stage3
                FROM cand c
                WHERE bit_count(xor(c.fa, c.fb)) <= 6),
              drops3 AS (
                SELECT id, stage3 FROM dupdrop
                UNION ALL SELECT id, stage3 FROM neardrop),
              surv3 AS (
                SELECT * FROM surv2
                WHERE id NOT IN (SELECT id FROM drops3)),
              vfr AS (
                SELECT id, text, f.f,
                  (f.f BETWEEN 2 + id % 4 AND 2 + id % 4 + 2 + id % 3)
                    OR (f.f BETWEEN 14 + id % 6
                        AND 14 + id % 6 + 3 + id % 4)
                    OR f.f = 14 + id % 6 + 3 + id % 4 + 2 + id % 3
                    AS speech
                FROM surv3, (SELECT unnest(generate_series(0, 31)) AS f)
                  f),
              ven AS (
                SELECT id, f,
                  CASE WHEN speech THEN 50 +
                    ('0x' || substr(md5(text || ':' ||
                      CAST(f AS VARCHAR)), 1, 4))::BIGINT % 206
                  ELSE ('0x' || substr(md5(text || ':' ||
                    CAST(f AS VARCHAR)), 1, 4))::BIGINT % 50 END
                    AS energy
                FROM vfr),
              vv AS (SELECT id, f FROM ven WHERE energy >= 50),
              vruns AS (
                SELECT id, min(f) AS rs, max(f) AS re, count(*) AS nv
                FROM (
                  SELECT id, f,
                    f - row_number() OVER (PARTITION BY id ORDER BY f)
                      AS run_id
                  FROM vv)
                GROUP BY id, run_id),
              vmerged AS (
                SELECT id, seg, sum(nv) AS seg_nv FROM (
                  SELECT id, nv,
                    sum(CASE WHEN pe IS NULL OR rs - pe - 1 > 2
                        THEN 1 ELSE 0 END)
                      OVER (PARTITION BY id ORDER BY rs) AS seg
                  FROM (
                    SELECT id, rs, re, nv,
                      lag(re, 1) OVER (PARTITION BY id ORDER BY rs)
                        AS pe
                    FROM vruns))
                GROUP BY id, seg),
              vad AS (
                SELECT id, sum(seg_nv) AS n_voiced
                FROM vmerged WHERE seg_nv >= 2 GROUP BY id),
              surv4 AS (
                SELECT s.id, s.text
                FROM surv3 s JOIN vad v ON v.id = s.id
                WHERE v.n_voiced >= 10),
              pfr AS (
                SELECT id AS media_id,
                  unnest([i FOR i IN
                    range(0, CAST(ceil(length(text) / 64.0) AS BIGINT))
                    IF i % 2 = 0]) AS frame_idx,
                  text
                FROM surv4),
              pch AS (
                SELECT media_id, frame_idx,
                  substr(text, CAST(frame_idx * 64 + 1 AS INT), 64)
                    AS chunk
                FROM pfr),
              pf AS (
                SELECT media_id, frame_idx,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1)
                     IF (p-1) % 4 = 0], p -> ascii(substr(chunk, p, 1))))
                    AS f0,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1)
                     IF (p-1) % 4 = 1], p -> ascii(substr(chunk, p, 1))))
                    AS f1,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1)
                     IF (p-1) % 4 = 2], p -> ascii(substr(chunk, p, 1))))
                    AS f2,
                  list_sum(list_transform(
                    [p FOR p IN range(1, len(chunk) + 1)
                     IF (p-1) % 4 = 3], p -> ascii(substr(chunk, p, 1))))
                    AS f3
                FROM (SELECT media_id, frame_idx, chunk FROM pch
                      WHERE len(chunk) > 0) _),
              pooled AS (
                SELECT media_id,
                  CAST(sum(coalesce(f0, 0)) // count(*) AS BIGINT) AS p0,
                  CAST(sum(coalesce(f1, 0)) // count(*) AS BIGINT) AS p1,
                  CAST(sum(coalesce(f2, 0)) // count(*) AS BIGINT) AS p2,
                  CAST(sum(coalesce(f3, 0)) // count(*) AS BIGINT) AS p3
                FROM pf GROUP BY media_id),
              man AS (
                SELECT st1.id AS media_id,
                  CAST(st1.n_sampled AS BIGINT) AS n_sampled,
                  CAST(ss.n_shots AS BIGINT) AS n_shots,
                  CAST(ss.max_shot AS BIGINT) AS max_shot,
                  CAST(v.n_voiced AS BIGINT) AS n_voiced,
                  p.p0, p.p1, p.p2, p.p3,
                  CASE WHEN st1.n_sampled < 2 THEN 'decode_short'
                       WHEN ss.max_shot > 7 THEN 'static_scene'
                       WHEN d.stage3 IS NOT NULL THEN d.stage3
                       WHEN v.n_voiced < 10 THEN 'no_speech'
                       ELSE 'kept' END AS stage
                FROM st1
                LEFT JOIN shotstats ss ON ss.id = st1.id
                LEFT JOIN drops3 d ON d.id = st1.id
                LEFT JOIN vad v ON v.id = st1.id
                LEFT JOIN pooled p ON p.media_id = st1.id)
              SELECT media_id,
                CASE WHEN stage = 'kept' THEN 'keep' ELSE 'drop' END
                  AS verdict,
                stage, n_sampled, n_shots, max_shot, n_voiced,
                p0, p1, p2, p3
              FROM man
              ORDER BY media_id""")),

    // Release health report (VERDICT r13 item 4): ONE (old, new)
    // release pair — old = doc_id % 7 ≠ 0 as ingested, new = old ∪ the
    // ~14% delta, which arrived through a per-source-SEVERITY planted
    // extraction regression (sev = md5(source) % 3: sev 0 sources'
    // delta is clean, sev 1 doubled text, sev 2 tripled — the release
    // gate must grade each source by how badly its ingestion broke) —
    // scored per source by the whole drift family on one frame:
    //  - manifest diff (q356): rows in each release + changed buckets;
    //  - 1-D Wasserstein of the capped token-length distribution —
    //    q357's CDF machinery upgraded to the EXACT integer-grid EMD
    //    (each observed gap weighted by its run length to the next
    //    observed value; per-source grids are sparse at gate SFs and
    //    the unweighted sum under-reads erratically);
    //  - PSI + KL of the Laplace-densified 16-cell length-bucket mix
    //    (q373's +1 densification, q358's micro-nat rounding) — noise-
    //    dominated at 25 docs/source, so their thresholds are set
    //    above small-sample noise and they serve as ATTRIBUTION at
    //    gate SFs, separating only at production source sizes;
    //  - embedding centroid drift ‖μ_old − μ_new‖² on the quantized
    //    grid (q346, per source via the doc_id = vec_id join) — the
    //    delta rows of broken sources additionally arrive with a
    //    planted ENCODER-VERSION bias (+4000·sev quantized on the
    //    first 16 dims), the re-embedding regression this axis exists
    //    to catch;
    //  - volume forecast residual (q371's seasonal-naive shape with
    //    forecast = old count × global growth ratio — flags sources
    //    whose volume moved AGAINST the release-wide trend).
    // Verdict per source: 'alert' if any metric crosses its hi
    // threshold, 'warn' on any lo crossing, else 'ok' — the one frame
    // a 100 TB pipeline's release cut pages on. Every metric is a
    // bounded-dimension agg (≤ 256 buckets, ≤ 513 grid cells, 16
    // length cells, 64 dims per source); the corpus is scanned twice
    // (text metrics, manifest hash) regardless of source count.
    QEntry("q382_release_health",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
        val sev = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 3
        val rel = docs.filter(col("doc_id") % 7 =!= 0)
          .select(col("source"), col("doc_id"), col("text"),
            lit(1L).as("in_a"))
          .union(docs.filter(col("doc_id") % 7 === 0)
            .select(col("source"), col("doc_id"),
              when(sev === 2L,
                concat_ws(" ", col("text"), col("text"), col("text")))
                .when(sev === 1L, concat_ws(" ", col("text"), col("text")))
                .otherwise(col("text")).as("text"),
              lit(0L).as("in_a")))
          .withColumn("toks",
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"))
          .localCheckpoint() // one release frame feeds every metric
        // manifest diff (q356)
        val fa = graft.pipeline.Manifest.bucketFolds(
            rel.filter(col("in_a") === 1L)
              .select(col("source"), col("doc_id"), col("text")))
          .select(col("source"), col("b"), col("n").as("n_a"),
            col("fold").as("fold_a"))
        val fb = graft.pipeline.Manifest.bucketFolds(
            rel.select(col("source"), col("doc_id"), col("text")))
          .select(col("source"), col("b"), col("n").as("n_b"),
            col("fold").as("fold_b"))
        val mdiff = fb.join(fa, Seq("source", "b"), "left")
          .groupBy(col("source"))
          .agg(sum(coalesce(col("n_a"), lit(0L))).as("rows_a"),
            sum(col("n_b")).as("rows_b"),
            sum(when(coalesce(col("fold_a"), lit(-1L)) =!= col("fold_b"),
              1L).otherwise(0L)).as("buckets_changed"))
          .localCheckpoint() // source dim; feeds totals + verdict
        // W1 per source (q357 convention: observed-grid gaps)
        val wc = rel.groupBy(col("source"),
            least(col("toks"), lit(512L)).as("v"))
          .agg(sum(col("in_a")).as("n_a"), count(lit(1)).as("n_b"))
        val wt = wc.groupBy(col("source"))
          .agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
        val wWin = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val wLead = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("v"))
        val w1 = wc.join(broadcast(wt), "source")
          .withColumn("cum_a", sum(col("n_a")).over(wWin))
          .withColumn("cum_b", sum(col("n_b")).over(wWin))
          .withColumn("run",
            coalesce(lead(col("v"), 1).over(wLead) - col("v"), lit(0L)))
          .select(col("source"),
            (abs(expr("cum_a * 1000000 div greatest(1L, ta)") -
              expr("cum_b * 1000000 div greatest(1L, tb)")) *
              col("run")).as("gap"))
          .groupBy(col("source")).agg(sum(col("gap")).as("w1_ppm"))
        // PSI + KL on Laplace-densified length cells (q373/q358)
        val lcnt = rel.select(col("source"),
            least(lit(16L), lit(1L) + expr("toks div 8")).as("cell"),
            col("in_a"))
          .groupBy(col("source"), col("cell"))
          .agg(sum(col("in_a")).as("c_a0"), count(lit(1)).as("c_b0"))
        val dense = rel.select(col("source")).distinct()
          .crossJoin(broadcast(
            s.range(1, 17).select(col("id").as("cell"))))
          .join(lcnt, Seq("source", "cell"), "left")
          .select(col("source"), col("cell"),
            (coalesce(col("c_a0"), lit(0L)) + 1L).as("c_a"),
            (coalesce(col("c_b0"), lit(0L)) + 1L).as("c_b"))
          .localCheckpoint() // 16 cells × sources
        val dtot = dense.groupBy(col("source"))
          .agg(sum(col("c_a")).as("na"), sum(col("c_b")).as("nb"))
        val pk = dense.join(broadcast(dtot), "source")
          .select(col("source"),
            expr("c_b * 1000000 div nb").as("p"),
            expr("c_a * 1000000 div na").as("q"))
          .withColumn("lnr",
            expr("CAST(round(ln(CAST(p AS DOUBLE) / q) * 1000000.0) " +
              "AS BIGINT)"))
          .groupBy(col("source"))
          .agg(expr("sum((p - q) * lnr) div 1000000").as("psi_micro"),
            expr("sum(p * lnr) div 1000000").as("kl_micro"))
        // embedding centroid drift per source (q346)
        val ej = Tables.embeddings(s, d)
          .select(col("vec_id"),
            graft.pipeline.Similarity.quantize(col("embedding")).as("v"))
          .join(docs.select(col("doc_id").as("vec_id"), col("source"),
            (col("doc_id") % 7 =!= 0).cast("long").as("e_in_a")),
            "vec_id")
          .select(col("source"), col("e_in_a"), posexplode(col("v")))
          .select(col("source"), col("e_in_a"), col("pos").as("dim"),
            // encoder-version plant: broken sources re-embedded their
            // delta with a biased encoder (first 16 dims, +4000·sev)
            (col("col") + when(col("e_in_a") === 0L && col("pos") < 16,
              sev * 4000L).otherwise(0L)).as("ev"))
        val mmd = ej.groupBy(col("source"), col("dim"))
          .agg(sum(when(col("e_in_a") === 1L, col("ev")).otherwise(0L))
            .as("sa"),
            sum(col("e_in_a")).as("nae"),
            sum(col("ev")).as("sb"), count(lit(1)).as("nbe"))
          .select(col("source"),
            (expr("sa div greatest(1L, nae)") -
              expr("sb div greatest(1L, nbe)")).as("diffq"))
          .groupBy(col("source"))
          .agg(sum(col("diffq") * col("diffq")).as("mmd2_q"))
        // volume residual vs the release-wide growth ratio (q371 shape)
        val gt = mdiff.agg(sum(col("rows_a")).as("ta_all"),
          sum(col("rows_b")).as("tb_all"))
        val vx = mdiff.crossJoin(broadcast(gt))
          .withColumn("fc",
            expr("rows_a * (tb_all * 10000 div ta_all) div 10000"))
          .select(col("source"), col("rows_a"), col("rows_b"),
            col("buckets_changed"),
            expr("abs(rows_b - fc) * 10000 div greatest(1L, fc)")
              .as("vol_resid_bp"))
        vx.join(w1, "source").join(pk, "source").join(mmd, "source")
          // thresholds calibrated on the planted regressions' measured
          // separations at 25 docs/source (the gate-SF stratum size):
          // sev-0 noise ceilings w1 ≈ 5.5M / mmd2 ≈ 0.9M sit well
          // under the warn lines; sev-1 lands in [warn, alert); sev-2
          // clears alert on mmd2 (its cleanest detector). PSI/KL/vol
          // lines sit above small-sample noise by design (attribution
          // at gate SFs, detectors at production stratum sizes).
          .withColumn("verdict",
            when(col("w1_ppm") >= 13000000L
              || col("psi_micro") >= 500000L
              || col("kl_micro") >= 250000L || col("mmd2_q") >= 10000000L
              || col("vol_resid_bp") >= 5000L, "alert")
              .when(col("w1_ppm") >= 6500000L
                || col("psi_micro") >= 200000L
                || col("kl_micro") >= 100000L
                || col("mmd2_q") >= 3000000L
                || col("vol_resid_bp") >= 1500L, "warn")
              .otherwise(lit("ok")))
          .select(col("source"), col("rows_a"), col("rows_b"),
            col("buckets_changed"), col("w1_ppm"), col("psi_micro"),
            col("kl_micro"), col("mmd2_q"), col("vol_resid_bp"),
            col("verdict"))
          .orderBy(col("source"))
      },
      Some("""WITH rel AS (
                SELECT source, doc_id, text, 1 AS in_a
                FROM documents WHERE doc_id % 7 != 0
                UNION ALL
                SELECT source, doc_id,
                  CASE ('0x' || substr(md5(source), 1, 2))::BIGINT % 3
                    WHEN 2 THEN text || ' ' || text || ' ' || text
                    WHEN 1 THEN text || ' ' || text
                    ELSE text END,
                  0
                FROM documents WHERE doc_id % 7 = 0),
              rt AS (
                SELECT source, doc_id, text, in_a,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks
                FROM rel),
              rh AS (
                SELECT source, in_a,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || text), 1, 15))::BIGINT AS h
                FROM rel),
              fa AS (
                SELECT source, h % 256 AS b, count(*) AS n_a,
                  CAST(sum(CAST(h AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold_a
                FROM rh WHERE in_a = 1 GROUP BY source, h % 256),
              fb AS (
                SELECT source, h % 256 AS b, count(*) AS n_b,
                  CAST(sum(CAST(h AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold_b
                FROM rh GROUP BY source, h % 256),
              mdiff AS (
                SELECT fb.source,
                  sum(coalesce(fa.n_a, 0)) AS rows_a,
                  sum(fb.n_b) AS rows_b,
                  sum(CASE WHEN coalesce(fa.fold_a, -1) <> fb.fold_b
                      THEN 1 ELSE 0 END) AS buckets_changed
                FROM fb LEFT JOIN fa
                  ON fa.source = fb.source AND fa.b = fb.b
                GROUP BY fb.source),
              wc AS (
                SELECT source, least(toks, 512) AS v,
                  sum(in_a) AS n_a, count(*) AS n_b
                FROM rt GROUP BY source, least(toks, 512)),
              wt AS (
                SELECT source, sum(n_a) AS ta, sum(n_b) AS tb
                FROM wc GROUP BY source),
              wg AS (
                SELECT wc.source,
                  abs(sum(n_a) OVER (PARTITION BY wc.source ORDER BY v
                        ROWS UNBOUNDED PRECEDING)
                      * 1000000 // greatest(1, wt.ta)
                    - sum(n_b) OVER (PARTITION BY wc.source ORDER BY v
                        ROWS UNBOUNDED PRECEDING)
                      * 1000000 // greatest(1, wt.tb))
                  * coalesce(lead(v, 1) OVER (PARTITION BY wc.source
                      ORDER BY v) - v, 0) AS gap
                FROM wc JOIN wt ON wt.source = wc.source),
              w1 AS (
                SELECT source, sum(gap) AS w1_ppm FROM wg
                GROUP BY source),
              lcnt AS (
                SELECT source, least(16, 1 + toks // 8) AS cell,
                  sum(in_a) AS c_a0, count(*) AS c_b0
                FROM rt GROUP BY source, least(16, 1 + toks // 8)),
              dense AS (
                SELECT s.source, c.cell,
                  coalesce(l.c_a0, 0) + 1 AS c_a,
                  coalesce(l.c_b0, 0) + 1 AS c_b
                FROM (SELECT DISTINCT source FROM rt) s
                CROSS JOIN (SELECT unnest(generate_series(1, 16))
                  AS cell) c
                LEFT JOIN lcnt l ON l.source = s.source
                  AND l.cell = c.cell),
              dtot AS (
                SELECT source, sum(c_a) AS na, sum(c_b) AS nb
                FROM dense GROUP BY source),
              pk AS (
                SELECT source,
                  sum((p - q) * lnr) // 1000000 AS psi_micro,
                  sum(p * lnr) // 1000000 AS kl_micro
                FROM (
                  SELECT d.source, c_b * 1000000 // nb AS p,
                    c_a * 1000000 // na AS q,
                    CAST(round(ln(CAST(c_b * 1000000 // nb AS DOUBLE)
                      / (c_a * 1000000 // na)) * 1000000.0) AS BIGINT)
                      AS lnr
                  FROM dense d JOIN dtot t ON t.source = d.source)
                GROUP BY source),
              ez AS (
                SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                    AS v
                FROM embeddings),
              ej AS (
                SELECT d.source,
                  CASE WHEN d.doc_id % 7 != 0 THEN 1 ELSE 0 END
                    AS e_in_a,
                  t.i AS dim,
                  ez.v[t.i + 1]
                  + CASE WHEN d.doc_id % 7 = 0 AND t.i < 16
                      THEN (('0x' || substr(md5(d.source), 1, 2))
                        ::BIGINT % 3) * 4000
                      ELSE 0 END AS ev
                FROM documents d JOIN ez ON ez.vec_id = d.doc_id,
                  (SELECT unnest(range(64)) AS i) t),
              mmd AS (
                SELECT source, sum(diffq * diffq) AS mmd2_q FROM (
                  SELECT source,
                    sum(CASE WHEN e_in_a = 1 THEN ev ELSE 0 END)
                      // greatest(1, sum(e_in_a))
                    - sum(ev) // greatest(1, count(*)) AS diffq
                  FROM ej GROUP BY source, dim)
                GROUP BY source),
              gt AS (
                SELECT sum(rows_a) AS ta_all, sum(rows_b) AS tb_all
                FROM mdiff),
              vx AS (
                SELECT m.source, m.rows_a, m.rows_b, m.buckets_changed,
                  abs(m.rows_b - m.rows_a * (gt.tb_all * 10000
                    // gt.ta_all) // 10000) * 10000
                    // greatest(1, m.rows_a * (gt.tb_all * 10000
                    // gt.ta_all) // 10000) AS vol_resid_bp
                FROM mdiff m, gt)
              SELECT vx.source,
                CAST(rows_a AS BIGINT) AS rows_a,
                CAST(rows_b AS BIGINT) AS rows_b,
                CAST(buckets_changed AS BIGINT) AS buckets_changed,
                CAST(w1_ppm AS BIGINT) AS w1_ppm,
                CAST(psi_micro AS BIGINT) AS psi_micro,
                CAST(kl_micro AS BIGINT) AS kl_micro,
                CAST(mmd2_q AS BIGINT) AS mmd2_q,
                CAST(vol_resid_bp AS BIGINT) AS vol_resid_bp,
                CASE WHEN w1_ppm >= 13000000 OR psi_micro >= 500000
                       OR kl_micro >= 250000 OR mmd2_q >= 10000000
                       OR vol_resid_bp >= 5000 THEN 'alert'
                     WHEN w1_ppm >= 6500000 OR psi_micro >= 200000
                       OR kl_micro >= 100000 OR mmd2_q >= 3000000
                       OR vol_resid_bp >= 1500 THEN 'warn'
                     ELSE 'ok' END AS verdict
              FROM vx
              JOIN w1 ON w1.source = vx.source
              JOIN pk ON pk.source = vx.source
              JOIN mmd ON mmd.source = vx.source
              ORDER BY vx.source"""))
  )
}
