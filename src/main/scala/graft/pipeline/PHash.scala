package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Perceptual-hash (dHash) near-duplicate detection for the multimodal
  * column — the image twin of [[Dedup]]'s text near-dup family, under
  * the same collapse-by-default / capped-bucket scale discipline
  * (VERDICT r12 item 1: the round-12 formulation banded RAW fingerprints,
  * so an n-way duplicate-image group emitted ~4·n² band-join rows — the
  * measured q186/q275 pathology).
  *
  * The decode is the STUB multimodal contract ([[Multimodal.stubDecode]]
  * — deterministic fake luminances from md5, REAL pipeline): each media
  * payload "decodes" to an 8×8 luminance grid, lum(cell) =
  * md5(text ‖ cell) byte plus the payload's brightness shift `sh`
  * (clamped at 255). The dHash is the 56-bit row-wise gradient sign
  * (8 rows × 7 horizontal diffs) — equal brightness shifts preserve
  * sign, only saturation flips bits, so a shifted copy lands within a
  * small Hamming distance of its original. Swap the md5 grid for a real
  * image decode and every stage downstream stands unchanged.
  *
  * Scale shape:
  *  - [[dhashFingerprints]] is a PURE PROJECTION — the luminance array
  *    and the 56-bit fold are per-row `transform`/`aggregate` higher-
  *    order functions, no explode, no shuffle (the round-12 version
  *    shuffled 64+56 rows per doc through two hash aggregates);
  *  - [[dhashNearDup]] collapses equal fingerprints to min-id reps
  *    FIRST (one hash-agg on the 8-byte fp — byte-identical payloads
  *    hash identically, so dup groups cost one dup edge per member,
  *    never band-join rows), bands only the reps (4 × 14-bit Hamming
  *    bands: a pair within distance 3 always shares a band), caps
  *    degenerate bands with [[Dedup.dropOversizedBuckets]], and
  *    verifies candidates with exact `bit_count`.
  */
object PHash {

  /** SQL fragment for the stub-decode luminance array of `text` at
    * brightness shift `sh` — shared by the fingerprint projection; the
    * DuckDB oracles replay the identical arithmetic. */
  private val LumArraySql =
    """transform(sequence(0, 63), c ->
         least(255L, CAST(conv(substring(md5(concat(text, ':',
           CAST(c AS STRING))), 1, 2), 16, 10) AS BIGINT) + sh))"""

  /** 56-bit dHash per media row. Input columns: `id` (long), `text`
    * (the stub payload), `sh` (long brightness shift). Output:
    * (id, fp). Zero-shuffle: one codegen'd projection per row. */
  def dhashFingerprints(media: DataFrame): DataFrame =
    media
      .select(col("id"), expr(LumArraySql).as("l"))
      .select(col("id"), expr(
        """aggregate(sequence(0, 55), 0L, (acc, k) ->
             acc + CASE WHEN
               element_at(l, CAST(k div 7 AS INT) * 8 + k % 7 + 1) >
               element_at(l, CAST(k div 7 AS INT) * 8 + k % 7 + 2)
             THEN shiftleft(1L, CAST(k AS INT)) ELSE 0L END)""").as("fp"))

  /** (id, fp, b, bv) Hamming band buckets: 4 bands × 14 bits. A pair at
    * Hamming distance ≤ 3 differs in at most 3 of the 4 bands, so it
    * always shares at least one — the banding guarantee the verify
    * threshold leans on (distances 4–6 surface best-effort, exactly
    * like LSH above its design threshold). */
  private[pipeline] def bandBuckets(fps: DataFrame): DataFrame =
    fps.select(col("id"), col("fp"),
        explode(sequence(lit(0), lit(3))).as("b"))
      .select(col("id"), col("fp"), col("b"),
        expr("(fp div shiftleft(1L, CAST(b * 14 AS INT))) % 16384")
          .as("bv"))

  /** Batch perceptual near-dup over a media frame (`id`, `text`, `sh`)
    * — collapse-by-default, capped, the `(kind, implied_pairs)`
    * contract of [[Dedup.minhashNearDupPairs]]:
    *
    *  - `near` rows: min-id REP pairs (a_id < b_id) at Hamming
    *    1..maxHamming (equal fingerprints collapse, so never 0), with
    *    `implied_pairs` = n_dups(a)·n_dups(b) — expanding reps by their
    *    dup groups reproduces the raw pair set;
    *  - `dup` rows: (rep, member) membership edges, hamming 0,
    *    implied_pairs 1.
    *
    * Columns: (kind, a_id, b_id, hamming, implied_pairs). The fp group
    * table is localCheckpoint'd (it feeds reps, dup edges and the
    * implied-pair counts); bands are capped per (b, bv) BEFORE the
    * self-join, so a degenerate band value (mass near-identical
    * gradients) bounds at maxBucket² candidates instead of squaring. */
  def dhashNearDup(media: DataFrame, maxHamming: Int = 6,
      maxBucket: Int = 1000): DataFrame = {
    val fps = dhashFingerprints(media)
      .localCheckpoint() // the md5-grid projection feeds groups AND the
                         // dup-edge join — never decode twice
    val groups = fps.groupBy(col("fp"))
      .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n_dups"))
      .localCheckpoint() // feeds reps, dup edges, and implied counts
    val dupEdges = fps.join(groups, "fp")
      .filter(col("id") =!= col("rep_id"))
      .select(col("rep_id"), col("id").as("member_id"))
    val bands = bandBuckets(groups.select(col("rep_id").as("id"), col("fp")))
      .localCheckpoint() // capped twice-read (count + anti-join) + joined
    val capped = Dedup.dropOversizedBuckets(bands, Seq("b", "bv"), maxBucket)
    val cand = capped.select(col("id").as("a_id"), col("fp").as("fa"),
        col("b"), col("bv"))
      .join(capped.select(col("id").as("b_id"), col("fp").as("fb"),
        col("b"), col("bv")), Seq("b", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("fa"), col("fb"))
      .distinct() // a close pair can share several bands
    val nd = groups.select(col("rep_id"), col("n_dups"))
    val near = cand
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(fa ^ fb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .join(nd.select(col("rep_id").as("a_id"), col("n_dups").as("__na")),
        "a_id")
      .join(nd.select(col("rep_id").as("b_id"), col("n_dups").as("__nb")),
        "b_id")
      .select(lit("near").as("kind"), col("a_id"), col("b_id"),
        col("hamming"), (col("__na") * col("__nb")).as("implied_pairs"))
    val dup = dupEdges.select(lit("dup").as("kind"),
      col("rep_id").as("a_id"), col("member_id").as("b_id"),
      lit(0L).as("hamming"), lit(1L).as("implied_pairs"))
    near.union(dup)
  }

  /** The round-12 formulation — RAW fingerprints banded with no
    * collapse and no cap. Kept PRIVATE as the scale foil: on a
    * dup-dense corpus its band join squares in duplicate density
    * (tools/PHashScale measures it; SCALE.md records the number).
    * Returns (a_id, b_id, hamming) pairs. */
  private[graft] def dhashNearDupRaw(media: DataFrame,
      maxHamming: Int = 6): DataFrame = {
    val fps = dhashFingerprints(media).localCheckpoint()
    val bands = bandBuckets(fps)
    bands.select(col("id").as("a_id"), col("fp").as("fa"), col("b"),
        col("bv"))
      .join(bands.select(col("id").as("b_id"), col("fp").as("fb"),
        col("b"), col("bv")), Seq("b", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"), col("fa"), col("fb"))
      .distinct()
      .select(col("a_id"), col("b_id"),
        expr("CAST(bit_count(fa ^ fb) AS BIGINT)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental perceptual near-dup: arriving media versus the running
    * fingerprint state — the multimodal twin of
    * [[Dedup.IncrementalNearDup]], same collapse-state machinery at
    * FINGERPRINT grain (dHash needs no token state, so the whole state
    * is two narrow dims):
    *
    *  - `fpDim`  (fp, rep_id): every distinct fingerprint seen, with
    *    its first-seen min-id rep;
    *  - `bands`  (id, fp, b, bv): band buckets of REPS ONLY;
    *  - `counts` (fp, n): members seen per fingerprint (implied-pair
    *    accounting).
    *
    * Per batch: (1) arrivals whose fp is already known are absorbed as
    * `dup` members — one edge, NO band join, NO state growth; (2)
    * in-batch equal fps collapse to a min-id rep; (3) fresh-rep bands
    * join against state ∪ same-batch fresh bands (capped per (b, bv)
    * at maxBucket over the union, the running-corpus cap) and verify at
    * Hamming ≤ maxHamming → `near` pairs, id-normalized (a_id < b_id),
    * implied_pairs = members-seen(fa)·members-seen(fb) AS OF this batch
    * — a later dup arrival is its own dup edge and inherits its rep's
    * earlier near relations on expansion; (4) state grows by fresh reps
    * only. Corpus-INTERNAL structure (pairs wholly inside the seed) is
    * never emitted — that is [[dhashNearDup]]'s job, run once.
    *
    * Emission contract per batch: (kind, a_id, b_id, hamming,
    * implied_pairs) — PHashSpec pins accumulated-emissions ==
    * [[dhashNearDup]] on (kind, a_id, b_id, hamming) when the whole
    * corpus arrives through batches over an empty seed. */
  final class IncrementalPHash(
      corpusMedia: DataFrame, // (id, text, sh) — may be empty
      maxHamming: Int = 6,
      maxBucket: Int = 1000,
      onPairs: DataFrame => Unit) {

    @volatile private var fpDim: DataFrame = _
    @volatile private var bands: DataFrame = _
    @volatile private var counts: DataFrame = _

    locally {
      val fps = dhashFingerprints(corpusMedia)
      val groups = fps.groupBy(col("fp"))
        .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n"))
        .localCheckpoint() // seed state: one narrow frame, read thrice
      fpDim = groups.select(col("fp"), col("rep_id"))
      counts = groups.select(col("fp"), col("n"))
      bands = bandBuckets(groups.select(col("rep_id").as("id"), col("fp")))
        .localCheckpoint()
    }

    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val bfps = dhashFingerprints(batch).localCheckpoint()
      val joined = bfps.join(fpDim, Seq("fp"), "left")
        .localCheckpoint() // feeds absorbed + fresh
      // known fp → absorbed as a member: a dup edge, no band join
      val absorbed = joined.filter(col("rep_id").isNotNull)
        .select(col("rep_id"), col("id").as("member_id"))
      val fresh = joined.filter(col("rep_id").isNull)
        .select(col("id"), col("fp"))
      // in-batch collapse: min-id rep per fresh fingerprint
      val freshGroups = fresh.groupBy(col("fp"))
        .agg(min(col("id")).as("rep_id"), count(lit(1)).as("n"))
        .localCheckpoint() // feeds dup edges, bands, state update
      val inBatchDup = fresh.join(freshGroups, "fp")
        .filter(col("id") =!= col("rep_id"))
        .select(col("rep_id"), col("id").as("member_id"))
      val freshBands = bandBuckets(
        freshGroups.select(col("rep_id").as("id"), col("fp")))
        .localCheckpoint() // joined this batch + appended to state
      // counts as of THIS batch (state + arrivals), for implied pairs
      val curCounts = counts
        .join(bfps.groupBy(col("fp")).agg(count(lit(1)).as("__b")),
          Seq("fp"), "full")
        .select(col("fp"),
          (coalesce(col("n"), lit(0L)) + coalesce(col("__b"), lit(0L)))
            .as("n"))
        .localCheckpoint() // read per near side + becomes next state
      // candidates: fresh reps × (state ∪ same-batch fresh) reps, capped
      // per band value over the UNION — the running-corpus cap
      val all = bands.union(freshBands).localCheckpoint()
      val capped = Dedup.dropOversizedBuckets(all, Seq("b", "bv"), maxBucket)
      val freshCapped = capped.join(
        freshGroups.select(col("rep_id").as("id")), Seq("id"), "left_semi")
      val cand = freshCapped.select(col("id").as("x_id"),
          col("fp").as("fx"), col("b"), col("bv"))
        .join(capped.select(col("id").as("y_id"), col("fp").as("fy"),
          col("b"), col("bv")), Seq("b", "bv"))
        .filter(col("x_id") =!= col("y_id"))
        .select(least(col("x_id"), col("y_id")).as("a_id"),
          greatest(col("x_id"), col("y_id")).as("b_id"),
          when(col("x_id") < col("y_id"), col("fx")).otherwise(col("fy"))
            .as("fa"),
          when(col("x_id") < col("y_id"), col("fy")).otherwise(col("fx"))
            .as("fb"))
        .distinct() // several shared bands, and fresh×fresh seen twice
      val near = cand
        .select(col("a_id"), col("b_id"), col("fa"), col("fb"),
          expr("CAST(bit_count(fa ^ fb) AS BIGINT)").as("hamming"))
        .filter(col("hamming") <= maxHamming)
        .join(curCounts.select(col("fp").as("fa"), col("n").as("__na")),
          "fa")
        .join(curCounts.select(col("fp").as("fb"), col("n").as("__nb")),
          "fb")
        .select(lit("near").as("kind"), col("a_id"), col("b_id"),
          col("hamming"), (col("__na") * col("__nb")).as("implied_pairs"))
      val dup = absorbed.union(inBatchDup)
        .select(lit("dup").as("kind"), col("rep_id").as("a_id"),
          col("member_id").as("b_id"), lit(0L).as("hamming"),
          lit(1L).as("implied_pairs"))
      onPairs(near.union(dup))
      // state grows by fresh reps only — the collapse
      fpDim = fpDim.union(freshGroups.select(col("fp"), col("rep_id")))
        .localCheckpoint()
      counts = curCounts
      bands = all
    }

    /** Attach to a real stream of media rows (id, text, sh) —
      * foreachBatch over [[processBatch]], AvailableNow (the
      * [[Dedup.IncrementalNearDup.start]] convention; PHashSpec drives
      * it with maxFilesPerTrigger=1 to force multiple micro-batches
      * and pins equality with the batch operator). */
    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }
}
