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
      ))
  )
}
