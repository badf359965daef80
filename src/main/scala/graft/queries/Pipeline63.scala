package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, eleventh batch — the audio axis of the multimodal
  * column (VAD segmentation), scalable uncertainty (Poisson bootstrap),
  * and the dedup threshold-sensitivity planner.
  */
object Pipeline63 {

  val entries: Seq[QEntry] = Seq(

    // Voice-activity segmentation over stub-decoded audio frames: each
    // media payload "decodes" to 32 energy frames (STUB contract —
    // md5-derived energies; two planted speech runs per media plus a
    // 1-frame blip trailing the second run by a 1–3 frame gap).
    // Energy ≥ 50 is the voiced flag (the stub separates the classes
    // exactly; a real decoder makes 50 the tuning knob). Then the VAD
    // machinery q339 does NOT have: gaps-and-islands raw runs →
    // hangover MERGE across silence gaps ≤ 2 → minimum-length drop
    // (n_voiced ≥ 2) — the blip merges into run 2 when its gap is ≤ 2
    // and is dropped as a lone frame when the gap is 3. Every window
    // is per-media (≤ 32 rows/key, ≤ 3 runs/key).
    QEntry("q353_audio_vad",
      (s, d) => {
        val frames = Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), col("text"),
            expr("2 + doc_id % 4").as("s1"),
            expr("2 + doc_id % 4 + 2 + doc_id % 3").as("e1"),
            expr("14 + doc_id % 6").as("s2"),
            expr("14 + doc_id % 6 + 3 + doc_id % 4").as("e2"),
            expr("14 + doc_id % 6 + 3 + doc_id % 4 + 2 + doc_id % 3")
              .as("blip"),
            explode(sequence(lit(0), lit(31))).as("f"))
          .withColumn("speech",
            expr("(f BETWEEN s1 AND e1) OR (f BETWEEN s2 AND e2) " +
              "OR f = blip"))
          .withColumn("energy",
            expr("CASE WHEN speech THEN 50 + " +
              "CAST(conv(substring(md5(concat(text, ':', " +
              "CAST(f AS STRING))), 1, 4), 16, 10) AS BIGINT) % 206 " +
              "ELSE CAST(conv(substring(md5(concat(text, ':', " +
              "CAST(f AS STRING))), 1, 4), 16, 10) AS BIGINT) % 50 END"))
          .withColumn("voiced", col("energy") >= 50L)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id")).orderBy(col("f"))
        val runs = frames.filter(col("voiced"))
          .withColumn("rn", row_number().over(w))
          .withColumn("run_id", col("f") - col("rn"))
          .groupBy(col("media_id"), col("run_id"))
          .agg(min(col("f")).as("rs"), max(col("f")).as("re"),
            count(lit(1)).as("nv"))
        val wr = org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id")).orderBy(col("rs"))
        val merged = runs
          .withColumn("pe", lag(col("re"), 1).over(wr))
          .withColumn("brk",
            when(col("pe").isNull, 1L)
              .when(col("rs") - col("pe") - 1L > 2L, 1L).otherwise(0L))
          .withColumn("seg", sum(col("brk")).over(wr))
          .groupBy(col("media_id"), col("seg"))
          .agg(min(col("rs")).as("start_f"), max(col("re")).as("end_f"),
            sum(col("nv")).as("n_voiced"))
          .filter(col("n_voiced") >= 2L)
        val wk = org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id")).orderBy(col("start_f"))
        merged
          .withColumn("seg_idx", row_number().over(wk).cast("long"))
          .select(col("media_id"), col("seg_idx"),
            col("start_f").cast("long").as("start_f"),
            col("end_f").cast("long").as("end_f"),
            (col("end_f") - col("start_f") + 1L).cast("long")
              .as("n_frames"),
            col("n_voiced"))
          .orderBy(col("media_id"), col("seg_idx"))
      },
      Some("""WITH docs AS (
                SELECT doc_id AS media_id, text,
                  2 + doc_id % 4 AS s1,
                  2 + doc_id % 4 + 2 + doc_id % 3 AS e1,
                  14 + doc_id % 6 AS s2,
                  14 + doc_id % 6 + 3 + doc_id % 4 AS e2,
                  14 + doc_id % 6 + 3 + doc_id % 4 + 2 + doc_id % 3
                    AS blip
                FROM documents),
              frames AS (
                SELECT media_id, text, f.f,
                  (f.f BETWEEN s1 AND e1) OR (f.f BETWEEN s2 AND e2)
                    OR f.f = blip AS speech
                FROM docs, (SELECT unnest(generate_series(0, 31)) AS f) f),
              en AS (
                SELECT media_id, f,
                  CASE WHEN speech THEN 50 +
                    ('0x' || substr(md5(text || ':' ||
                      CAST(f AS VARCHAR)), 1, 4))::BIGINT % 206
                  ELSE ('0x' || substr(md5(text || ':' ||
                    CAST(f AS VARCHAR)), 1, 4))::BIGINT % 50 END
                    AS energy
                FROM frames),
              v AS (SELECT media_id, f FROM en WHERE energy >= 50),
              r AS (
                SELECT media_id, f,
                  f - row_number() OVER (PARTITION BY media_id
                    ORDER BY f) AS run_id
                FROM v),
              runs AS (
                SELECT media_id, run_id, min(f) AS rs, max(f) AS re,
                  count(*) AS nv
                FROM r GROUP BY media_id, run_id),
              m AS (
                SELECT media_id, rs, re, nv,
                  CASE WHEN lag(re) OVER (PARTITION BY media_id
                      ORDER BY rs) IS NULL THEN 1
                    WHEN rs - lag(re) OVER (PARTITION BY media_id
                      ORDER BY rs) - 1 > 2 THEN 1 ELSE 0 END AS brk
                FROM runs),
              sg AS (
                SELECT media_id, rs, re, nv,
                  sum(brk) OVER (PARTITION BY media_id ORDER BY rs)
                    AS seg
                FROM m),
              agg AS (
                SELECT media_id, seg, min(rs) AS start_f,
                  max(re) AS end_f, sum(nv) AS n_voiced
                FROM sg GROUP BY media_id, seg
                HAVING sum(nv) >= 2)
              SELECT media_id,
                CAST(row_number() OVER (PARTITION BY media_id
                  ORDER BY start_f) AS BIGINT) AS seg_idx,
                CAST(start_f AS BIGINT) AS start_f,
                CAST(end_f AS BIGINT) AS end_f,
                CAST(end_f - start_f + 1 AS BIGINT) AS n_frames,
                CAST(n_voiced AS BIGINT) AS n_voiced
              FROM agg
              ORDER BY media_id, seg_idx""")),

    // Poisson bootstrap (the single-pass, cluster-scale bootstrap:
    // per-replicate weights drawn Poisson(1) instead of resampling n
    // rows — mergeable, shuffle-free): 16 replicates of mean tokens
    // per doc, each doc's weight from a deterministic md5 coin through
    // the fixed λ=1 inverse-CDF ppm table (both engines walk the SAME
    // table — the estimate is hash-compared, not tolerance-boxed).
    // One corpus scan to a 16-cell map-side-combined aggregate; the
    // 90%-ish CI = 2nd/15th order statistics of the 16 estimates rides
    // on every row.
    QEntry("q354_poisson_bootstrap",
      (s, d) => {
        val reps = s.range(0, 16).select(col("id").as("b"))
        val est = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"))
          .crossJoin(broadcast(reps))
          .select(col("b"), col("tok"),
            expr("CAST(conv(substring(md5(concat('boot:', " +
              "CAST(b AS STRING), ':', CAST(doc_id AS STRING))), " +
              "1, 6), 16, 10) AS BIGINT) % 1000000").as("u"))
          .withColumn("w",
            expr("CASE WHEN u < 367879 THEN 0L WHEN u < 735759 THEN 1L " +
              "WHEN u < 919699 THEN 2L WHEN u < 981012 THEN 3L " +
              "WHEN u < 996340 THEN 4L WHEN u < 999406 THEN 5L " +
              "WHEN u < 999917 THEN 6L WHEN u < 999990 THEN 7L " +
              "ELSE 8L END"))
          .groupBy(col("b"))
          .agg(sum(col("w")).as("n_eff"),
            expr("sum(w * tok) * 1000 div greatest(1L, sum(w))")
              .as("est_milli"))
          .localCheckpoint() // 16 rows
        val point = Tables.documents(s, d)
          .agg(expr("sum(CAST(size(split(lower(text), '\\\\s+')) " +
            "AS BIGINT)) * 1000 div count(1)").as("point_milli"))
        val ci = est.agg(sort_array(collect_list(col("est_milli")))
            .as("arr"))
          .select(element_at(col("arr"), 2).as("lo_milli"),
            element_at(col("arr"), 15).as("hi_milli"))
        est.crossJoin(broadcast(point)).crossJoin(broadcast(ci))
          .select(col("b"), col("n_eff"), col("est_milli"),
            col("point_milli"), col("lo_milli"), col("hi_milli"))
          .orderBy(col("b"))
      },
      Some("""WITH docs AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok
                FROM documents),
              e AS (
                SELECT b.b, d.tok,
                  ('0x' || substr(md5('boot:' || CAST(b.b AS VARCHAR)
                    || ':' || CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
                    % 1000000 AS u
                FROM docs d, (SELECT unnest(range(16)) AS b) b),
              w AS (
                SELECT b, tok,
                  CASE WHEN u < 367879 THEN 0 WHEN u < 735759 THEN 1
                    WHEN u < 919699 THEN 2 WHEN u < 981012 THEN 3
                    WHEN u < 996340 THEN 4 WHEN u < 999406 THEN 5
                    WHEN u < 999917 THEN 6 WHEN u < 999990 THEN 7
                    ELSE 8 END AS w
                FROM e),
              est AS (
                SELECT b, CAST(sum(w) AS BIGINT) AS n_eff,
                  CAST(sum(w * tok) * 1000 // greatest(1, sum(w))
                    AS BIGINT) AS est_milli
                FROM w GROUP BY b),
              pt AS (
                SELECT CAST(sum(tok) * 1000 // count(*) AS BIGINT)
                  AS point_milli
                FROM docs),
              ci AS (
                SELECT (list(est_milli ORDER BY est_milli))[2]
                    AS lo_milli,
                  (list(est_milli ORDER BY est_milli))[15] AS hi_milli
                FROM est)
              SELECT CAST(b AS BIGINT) AS b, n_eff, est_milli,
                pt.point_milli, ci.lo_milli, ci.hi_milli
              FROM est, pt, ci
              ORDER BY b""")),

    // Dedup threshold sensitivity: the retention curve behind "where
    // do we set the near-dup cut". PLANNER contract (q313/q342
    // discipline): the pair enumeration runs on a deterministic md5
    // 20% doc sample — at a 0.6 floor TRUE near-pairs grow
    // quadratically in duplication density (q61's measured 155×:
    // output size, not a pruning failure), so the full-corpus sweep
    // is exactly the computation the planner exists to avoid; the
    // sample keeps the curve shape at 1/25th the pair mass. ONE
    // collapse + prefix-filter + verify pass at the floor, then every
    // threshold in {60, 70, 80, 90} reads the SAME scored pair frame:
    // rep pairs passing inter·100 ≥ uni·t, their implied raw-pair
    // mass (n_dups_a·n_dups_b), distinct removable reps (the b side)
    // and their token mass. Exact-dup members are threshold-
    // independent and ride as a constant column.
    QEntry("q355_dedup_threshold_sweep",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .filter(expr("CAST(conv(substring(md5(concat('sweep:', " +
            "CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT) " +
            "% 100 < 20"))
        val pairs = graft.pipeline.Dedup.ngramJaccardPairs(
            docs, "doc_id", "text", n = 3, tNum = 3, tDen = 5)
          .localCheckpoint()
        val toks = docs.select(col("doc_id").as("b_id"),
          graft.pipeline.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("tok"))
        val near = pairs.filter(col("kind") === "near")
        val grid = s.range(0, 4)
          .select((lit(60L) + col("id") * 10L).as("t_pct"))
        val perT = near.crossJoin(broadcast(grid))
          .filter(col("inter") * 100L >= col("uni") * col("t_pct"))
          .localCheckpoint()
        val pairStats = perT.groupBy(col("t_pct"))
          .agg(count(lit(1)).as("n_rep_pairs"),
            sum(col("implied_pairs")).as("implied_raw_pairs"))
        val remStats = perT.select(col("t_pct"), col("b_id")).distinct()
          .join(toks, Seq("b_id"))
          .groupBy(col("t_pct"))
          .agg(count(lit(1)).as("n_removable_reps"),
            sum(col("tok")).as("removable_tokens"))
        val dups = pairs.filter(col("kind") === "dup")
          .agg(count(lit(1)).as("n_exact_dup_members"))
        grid.join(pairStats, Seq("t_pct"), "left")
          .join(remStats, Seq("t_pct"), "left")
          .crossJoin(broadcast(dups))
          .select(col("t_pct"),
            coalesce(col("n_rep_pairs"), lit(0L)).as("n_rep_pairs"),
            coalesce(col("implied_raw_pairs"), lit(0L))
              .as("implied_raw_pairs"),
            coalesce(col("n_removable_reps"), lit(0L))
              .as("n_removable_reps"),
            coalesce(col("removable_tokens"), lit(0L))
              .as("removable_tokens"),
            col("n_exact_dup_members"))
          .orderBy(col("t_pct"))
      },
      Some("""WITH sdocs AS (
                SELECT doc_id, text FROM documents
                WHERE ('0x' || substr(md5('sweep:' ||
                  CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 100 < 20),
              grp AS (
                SELECT md5(text) AS h, min(doc_id) AS keep_id,
                  count(*) AS n_dups
                FROM sdocs GROUP BY 1),
              reps AS (
                SELECT b.doc_id, b.text, g.n_dups
                FROM sdocs b JOIN grp g ON g.keep_id = b.doc_id),
              members AS (
                SELECT g.keep_id AS rep_id, b.doc_id AS member_id
                FROM sdocs b JOIN grp g ON g.h = md5(b.text)
                WHERE b.doc_id <> g.keep_id),
              t AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM reps),
              g AS (
                SELECT doc_id, list_distinct(list_transform(
                  range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                  AS gs
                FROM t WHERE len(toks) >= 3),
              e AS (SELECT doc_id, unnest(gs) AS tok FROM g),
              sz AS (SELECT doc_id, len(gs) AS ntok FROM g),
              inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  count(*) AS inter
                FROM e a JOIN e b ON a.tok = b.tok
                  AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
              near AS (
                SELECT i.a_id, i.b_id, i.inter,
                  sa.ntok + sb.ntok - i.inter AS uni,
                  CAST(ra.n_dups * rb.n_dups AS BIGINT) AS implied_pairs
                FROM inter i
                JOIN sz sa ON sa.doc_id = i.a_id
                JOIN sz sb ON sb.doc_id = i.b_id
                JOIN reps ra ON ra.doc_id = i.a_id
                JOIN reps rb ON rb.doc_id = i.b_id
                WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 3),
              dtok AS (
                SELECT doc_id AS b_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok
                FROM sdocs),
              grid AS (SELECT unnest([60, 70, 80, 90]) AS t_pct),
              pass AS (
                SELECT gr.t_pct, n.a_id, n.b_id, n.implied_pairs
                FROM near n, grid gr
                WHERE n.inter * 100 >= n.uni * gr.t_pct),
              ps AS (
                SELECT t_pct, count(*) AS n_rep_pairs,
                  sum(implied_pairs) AS implied_raw_pairs
                FROM pass GROUP BY t_pct),
              rm AS (
                SELECT t_pct, count(*) AS n_removable_reps,
                  sum(tok) AS removable_tokens
                FROM (SELECT DISTINCT t_pct, b_id FROM pass)
                JOIN dtok USING (b_id)
                GROUP BY t_pct),
              dd AS (SELECT count(*) AS n_exact_dup_members FROM members)
              SELECT CAST(gr.t_pct AS BIGINT) AS t_pct,
                CAST(coalesce(ps.n_rep_pairs, 0) AS BIGINT)
                  AS n_rep_pairs,
                CAST(coalesce(ps.implied_raw_pairs, 0) AS BIGINT)
                  AS implied_raw_pairs,
                CAST(coalesce(rm.n_removable_reps, 0) AS BIGINT)
                  AS n_removable_reps,
                CAST(coalesce(rm.removable_tokens, 0) AS BIGINT)
                  AS removable_tokens,
                CAST(dd.n_exact_dup_members AS BIGINT)
                  AS n_exact_dup_members
              FROM grid gr
              LEFT JOIN ps ON ps.t_pct = gr.t_pct
              LEFT JOIN rm ON rm.t_pct = gr.t_pct, dd
              ORDER BY gr.t_pct"""))
  )
}
