package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, fourth batch — temporal segmentation for the
  * multimodal column: shot-boundary detection over stub-decoded frame
  * features, completing the video axis (q67 samples frames, q213 pools
  * clips, q328/q331 dedup stills; this one SEGMENTS).
  */
object Pipeline56 {

  val entries: Seq[QEntry] = Seq(

    // Shot segmentation: each media payload "decodes" to 16 frames of
    // 16 luminance cells (STUB decode per the multimodal contract —
    // md5 luminances keyed by (text, shot seed, cell); frames within a
    // shot share the seed, i.e. a static scene, and two PLANTED cuts
    // at doc-dependent positions switch it). Per frame an 8-bin
    // luminance histogram — a pure per-row projection (transform +
    // aggregate, no explode past the frame grain) — then the adjacent-
    // frame L1 histogram distance over a per-media window (bounded: 16
    // rows per key), boundaries where L1 > 0 (the stub's static scenes
    // make within-shot deltas EXACTLY zero, so any positive delta is a
    // cut; a real decoder adds sensor jitter and the threshold becomes
    // the tuning knob — the measured fixture margin is min-cut L1 = 2
    // vs max-non-cut 0), and segments = running boundary count. Emits one row
    // per detected shot: (media_id, shot_idx, start_f, end_f,
    // n_frames, keyframe = first frame). The planted cuts surface as
    // exactly three shots per media; every stage — md5 grid, histogram,
    // L1, segmentation — replays in the oracle.
    QEntry("q339_shot_segmentation",
      (s, d) => {
        val cut1 = expr("3 + doc_id % 5")   // in [3, 7]
        val cut2 = expr("9 + doc_id % 4")   // in [9, 12]
        val frames = Tables.documents(s, d)
          .select(col("doc_id").as("media_id"), col("text"),
            cut1.as("c1"), cut2.as("c2"),
            explode(sequence(lit(0), lit(15))).as("f"))
          .select(col("media_id"), col("f"),
            expr("""CASE WHEN f >= c2 THEN 'S2' WHEN f >= c1 THEN 'S1'
                    ELSE 'S0' END""").as("seed"),
            col("text"))
        // one md5 pass per cell (the nested per-bin fold recomputed the
        // 16-cell grid once PER BIN — 8× the hashes, 90 s at the sf≈10
        // replica), and one shuffle to the dense per-frame histogram:
        // the cell explode aggregates straight into 8 conditional sums
        // (an earlier shape densified bins via a broadcast grid + a
        // per-(media,bin) window — 3 extra shuffles of pure plan
        // overhead, 4.9 s at sf0.1 for 8000 frames). Both windows
        // below share one spec, so lag + running-cut-count run in a
        // single WindowExec over ≤16 rows per media.
        val hists = frames
          .select(col("media_id"), col("f"),
            explode(expr("""transform(sequence(0, 15), c ->
              CAST(conv(substring(md5(concat(text, ':', seed, ':',
                CAST(c AS STRING))), 1, 2), 16, 10) AS BIGINT)
                div 32)""")).as("bin"))
          .groupBy(col("media_id"), col("f"))
          .agg(array((0 until 8).map(b =>
            sum(when(col("bin") === b, 1L).otherwise(0L))): _*).as("h"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("media_id")).orderBy(col("f"))
        val deltas = hists
          .withColumn("ph", lag(col("h"), 1).over(w))
          .withColumn("l1", when(col("ph").isNull, lit(0L))
            .otherwise(expr(
              "aggregate(zip_with(h, ph, (a, b) -> abs(a - b)), " +
                "0L, (acc, x) -> acc + x)")))
          .withColumn("is_cut", (col("l1") > lit(0L)).cast("long"))
          .withColumn("shot_idx", sum(col("is_cut")).over(w))
        deltas.groupBy(col("media_id"), col("shot_idx"))
          .agg(min(col("f")).as("start_f"), max(col("f")).as("end_f"),
            count(lit(1)).as("n_frames"))
          .withColumn("keyframe", col("start_f"))
          .orderBy(col("media_id"), col("shot_idx"))
      },
      Some("""WITH docs AS (
                SELECT doc_id AS media_id, text,
                  3 + doc_id % 5 AS c1, 9 + doc_id % 4 AS c2
                FROM documents),
              frames AS (
                SELECT media_id, text, f.f,
                  CASE WHEN f.f >= c2 THEN 'S2'
                       WHEN f.f >= c1 THEN 'S1' ELSE 'S0' END AS seed
                FROM docs, (SELECT unnest(generate_series(0, 15)) AS f)
                  f),
              cells AS (
                SELECT media_id, f, seed, text, c.c,
                  ('0x' || substr(md5(text || ':' || seed || ':' ||
                    CAST(c.c AS VARCHAR)), 1, 2))::BIGINT // 32 AS bin
                FROM frames, (SELECT unnest(generate_series(0, 15)) AS c)
                  c),
              hists AS (
                SELECT media_id, f, bin, count(*) AS n
                FROM cells GROUP BY media_id, f, bin),
              hb AS (
                SELECT d.media_id, d.f, b.b,
                  coalesce(h.n, 0) AS n
                FROM (SELECT DISTINCT media_id, f FROM cells) d
                CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS b) b
                LEFT JOIN hists h ON h.media_id = d.media_id
                  AND h.f = d.f AND h.bin = b.b),
              l1 AS (
                SELECT media_id, f,
                  sum(abs(n - pn)) AS l1
                FROM (
                  SELECT media_id, f, b, n,
                    lag(n, 1, n) OVER (PARTITION BY media_id, b
                      ORDER BY f) AS pn
                  FROM hb)
                GROUP BY media_id, f),
              cuts AS (
                SELECT media_id, f,
                  CASE WHEN f = 0 THEN 0
                       WHEN l1 > 0 THEN 1 ELSE 0 END AS is_cut
                FROM l1),
              shots AS (
                SELECT media_id, f,
                  sum(is_cut) OVER (PARTITION BY media_id ORDER BY f)
                    AS shot_idx
                FROM cuts)
              SELECT media_id, CAST(shot_idx AS BIGINT) AS shot_idx,
                CAST(min(f) AS BIGINT) AS start_f,
                CAST(max(f) AS BIGINT) AS end_f,
                CAST(count(*) AS BIGINT) AS n_frames,
                CAST(min(f) AS BIGINT) AS keyframe
              FROM shots GROUP BY media_id, shot_idx
              ORDER BY media_id, shot_idx"""))
  )
}
