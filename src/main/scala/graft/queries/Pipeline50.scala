package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, fourteenth batch (rebuilt round 13) — perceptual
  * near-dup for the multimodal column: dHash over the stubbed decode
  * (the `Multimodal.stubDecode` contract — fake luminances, REAL
  * pipeline), now under the collapse-by-default / capped-bucket scale
  * discipline (VERDICT r12 item 1) via [[graft.pipeline.PHash]], plus
  * the incremental arm (VERDICT r12 item 4). Swap the md5 grid for a
  * real image decode and every stage downstream stands unchanged.
  */
object Pipeline50 {

  /** Shared corpus construction: every doc as a media payload, every
    * 20th doc gets a PLANTED brightness-shifted copy (+40 clamped at
    * 255 — the transform dHash is built to survive: equal shifts
    * preserve sign, only saturation flips bits; +40 saturates enough
    * cells to flip 0–3 of the 56 gradient bits per fixture doc, so the
    * planted copies split between the collapse arm (hamming 0 → dup)
    * and the banded near arm, both within the 4-band ≤3 guarantee —
    * full recall), and every 25th doc gets THREE
    * byte-identical copies — the n-way duplicate-image group that made
    * the round-12 uncollapsed band join square (its fp collides in all
    * 4 bands), now absorbed as dup edges by the fp-grain collapse. */
  private def media(s: org.apache.spark.sql.SparkSession, d: String) = {
    val base = Tables.documents(s, d).select(col("doc_id"), col("text"))
    base.select(col("doc_id").as("id"), col("text"), lit(0L).as("sh"))
      .union(base.filter(col("doc_id") % 20 === 0)
        .select((col("doc_id") + 10000000L).as("id"), col("text"),
          lit(40L).as("sh")))
      .union(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 20000000L).as("id"), col("text"),
          lit(0L).as("sh")))
      .union(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 30000000L).as("id"), col("text"),
          lit(0L).as("sh")))
      .union(base.filter(col("doc_id") % 25 === 0)
        .select((col("doc_id") + 40000000L).as("id"), col("text"),
          lit(0L).as("sh")))
  }

  /** Shared oracle prelude: the media construction + per-id 56-bit
    * dHash fingerprints, replayed cell by cell in DuckDB. */
  private val FpsSql =
    """base AS (SELECT doc_id, text FROM documents),
       al AS (
         SELECT doc_id AS id, text, 0 AS sh FROM base
         UNION ALL
         SELECT doc_id + 10000000, text, 40 FROM base WHERE doc_id % 20 = 0
         UNION ALL
         SELECT doc_id + 20000000, text, 0 FROM base WHERE doc_id % 25 = 0
         UNION ALL
         SELECT doc_id + 30000000, text, 0 FROM base WHERE doc_id % 25 = 0
         UNION ALL
         SELECT doc_id + 40000000, text, 0 FROM base WHERE doc_id % 25 = 0),
       cells AS (SELECT unnest(generate_series(0, 63)) AS cell),
       lums AS (
         SELECT al.id, cells.cell,
           least(255, ('0x' || substr(md5(al.text || ':' ||
             CAST(cells.cell AS VARCHAR)), 1, 2))::BIGINT + al.sh)
             AS lum
         FROM al, cells),
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
       groups AS (
         SELECT fp, min(id) AS rep_id, count(*) AS n_dups
         FROM fps GROUP BY fp),
       bands AS (
         SELECT rep_id AS id, fp, b,
           (fp // (1::BIGINT << CAST(b * 14 AS INTEGER))) % 16384 AS bv
         FROM groups, (SELECT unnest(generate_series(0, 3)) AS b))"""

  /** Batch-arm candidate CTE, replaying the Spark side's per-(band,
    * value) bucket cap exactly ([[graft.pipeline.Dedup
    * .dropOversizedBuckets]] drops buckets with > 1000 rep rows;
    * size-1 buckets emit no pairs, so BETWEEN 2 AND 1000 is the same
    * pair set) — ADVICE r14 item 1: without this, a degenerate band
    * value collecting > 1000 reps would keep oracle pairs the Spark
    * path drops. q331's INCREMENTAL cap is as-of-batch over
    * state ∪ fresh bands and is not expressible as one final-count
    * HAVING — PHashSpec pins bucket headroom (max ≪ 1000) at tested
    * SFs instead, so its uncapped [[CandSql]] stays exact there. */
  private val CandCappedSql =
    """bok AS (
         SELECT b, bv FROM bands
         GROUP BY b, bv HAVING count(*) BETWEEN 2 AND 1000),
       cand AS (
         SELECT DISTINCT a.id AS a_id, b.id AS b_id,
           a.fp AS fa, b.fp AS fb
         FROM bands a
         JOIN bok ON bok.b = a.b AND bok.bv = a.bv
         JOIN bands b
           ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)"""

  private val CandSql =
    """cand AS (
         SELECT DISTINCT a.id AS a_id, b.id AS b_id,
           a.fp AS fa, b.fp AS fb
         FROM bands a JOIN bands b
           ON a.b = b.b AND a.bv = b.bv AND a.id < b.id)"""

  val entries: Seq[QEntry] = Seq(

    // Perceptual-hash near-dup (dHash), collapse-first: equal
    // fingerprints collapse to min-id reps (byte-identical payloads —
    // including the planted 4-way duplicate-image groups — cost one
    // `dup` edge per member instead of squaring inside every Hamming
    // band), only reps are banded (4 × 14-bit bands: a pair within
    // distance 3 always shares a band) with degenerate band values
    // capped, and candidates verified exactly at Hamming ≤ 6. Planted
    // brightness-shifted copies surface as small-distance `near` rep
    // pairs (or collapse outright when no luminance saturates);
    // `implied_pairs` = n_dups(a)·n_dups(b) makes the collapsed output
    // expand losslessly to the raw pair set — the image-dedup recall
    // story, pinned end to end through Spark-shaped stages (zero-shuffle
    // fingerprint projection, one fp hash-agg, one capped band join).
    QEntry("q328_phash_neardup",
      (s, d) => graft.pipeline.PHash.dhashNearDup(media(s, d))
        .orderBy(col("kind"), col("a_id"), col("b_id")),
      Some(s"""WITH $FpsSql,
              $CandCappedSql,
              near AS (
                SELECT 'near' AS kind, c.a_id, c.b_id,
                  CAST(bit_count(xor(c.fa, c.fb)) AS BIGINT) AS hamming,
                  ga.n_dups * gb.n_dups AS implied_pairs
                FROM cand c
                JOIN groups ga ON ga.fp = c.fa
                JOIN groups gb ON gb.fp = c.fb
                WHERE bit_count(xor(c.fa, c.fb)) <= 6),
              dup AS (
                SELECT 'dup' AS kind, g.rep_id AS a_id, f.id AS b_id,
                  CAST(0 AS BIGINT) AS hamming,
                  CAST(1 AS BIGINT) AS implied_pairs
                FROM fps f JOIN groups g
                  ON g.fp = f.fp AND f.id <> g.rep_id)
              SELECT kind, a_id, b_id, hamming, implied_pairs FROM near
              UNION ALL
              SELECT kind, a_id, b_id, hamming, implied_pairs FROM dup
              ORDER BY kind, a_id, b_id""")),

    // Incremental perceptual near-dup: the same media corpus arriving
    // against a running fingerprint state — seed = the original docs,
    // batch 0 = the brightness-shifted copies, batch 1 = the
    // byte-identical copies. Arrivals with a known fingerprint are
    // absorbed as `dup` members (no band join, no state growth);
    // fresh fingerprints band-join against state ∪ same-batch reps and
    // emit `near` pairs with implied_pairs counted AS OF the emitting
    // batch. Corpus-internal structure is never emitted (that is
    // q328's job). The oracle replays arrival order from the id ranges
    // (ids were allocated batch-monotone), counting implied pairs up
    // to each pair's emission batch.
    QEntry("q331_phash_incremental",
      (s, d) => {
        val m = media(s, d)
        val emitted = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        val inc = new graft.pipeline.PHash.IncrementalPHash(
          m.filter(col("id") < 10000000L),
          onPairs = df => emitted += df.localCheckpoint())
        inc.processBatch(
          m.filter(col("id") >= 10000000L && col("id") < 20000000L), 0L)
        inc.processBatch(m.filter(col("id") >= 20000000L), 1L)
        emitted.reduce(_ union _)
          .orderBy(col("kind"), col("a_id"), col("b_id"))
      },
      Some(s"""WITH $FpsSql,
              $CandSql,
              fpb AS (
                SELECT id, fp,
                  CASE WHEN id < 10000000 THEN -1
                       WHEN id < 20000000 THEN 0 ELSE 1 END AS bt
                FROM fps),
              near AS (
                SELECT 'near' AS kind, c.a_id, c.b_id,
                  CAST(bit_count(xor(c.fa, c.fb)) AS BIGINT) AS hamming,
                  (SELECT count(*) FROM fpb m
                    WHERE m.fp = c.fa AND m.bt <= eb.bt) *
                  (SELECT count(*) FROM fpb m
                    WHERE m.fp = c.fb AND m.bt <= eb.bt) AS implied_pairs
                FROM cand c
                JOIN fpb eb ON eb.id = c.b_id
                WHERE bit_count(xor(c.fa, c.fb)) <= 6 AND eb.bt >= 0),
              dup AS (
                SELECT 'dup' AS kind, g.rep_id AS a_id, f.id AS b_id,
                  CAST(0 AS BIGINT) AS hamming,
                  CAST(1 AS BIGINT) AS implied_pairs
                FROM fpb f JOIN groups g
                  ON g.fp = f.fp AND f.id <> g.rep_id
                WHERE f.bt >= 0)
              SELECT kind, a_id, b_id, hamming, implied_pairs FROM near
              UNION ALL
              SELECT kind, a_id, b_id, hamming, implied_pairs FROM dup
              ORDER BY kind, a_id, b_id"""))
  )
}
