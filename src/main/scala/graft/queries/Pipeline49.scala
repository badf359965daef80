package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, thirteenth batch — data-skipping and split hygiene:
  *  - q326: bloom-filter file-skipping audit — the point-lookup twin
  *    of q302's zone maps (range predicates): per-file bloom bit sets
  *    probed by customer keys, exact containment vs bloom hits, false
  *    positives measured;
  *  - q327: temporal-leakage audit of a time-based train/test cut —
  *    entities straddling the cut, the quiet eval-inflation bug.
  */
object Pipeline49 {

  val entries: Seq[QEntry] = Seq(

    // Bloom-skipping audit: orders land in synthetic 64-row files in
    // arrival order (two-pass GlobalRank — the q302 layout recipe);
    // each file keeps a bloom of its o_custkey values (k=3 md5-derived
    // positions in m=512 bits — deliberately small so false positives
    // are observable, not theoretical). Probe keys (custkey % 50 = 0)
    // then measure: files truly containing the key, files the bloom
    // hits, and the false-positive share of the prunable files — the
    // point-lookup data-skipping readout next to q302's range zones.
    // Everything after the per-file dedup is dimension-sized.
    QEntry("q326_bloom_skipping",
      (s, d) => {
        val F = 64
        val M = 512
        val rows = graft.operators.GlobalRank.rowNumber(
            Tables.orders(s, d).select(col("o_orderkey"),
              col("o_custkey").cast("long").as("k")),
            "rn", col("o_orderkey"))
          .select(expr(s"CAST((rn - 1) AS BIGINT) div $F").as("file_id"),
            col("k"))
          // lazy persist (not an eager localCheckpoint): feeds exact
          // containment + bloom bits + probes + totals in one action;
          // deterministic (o_orderkey is a total order), so pressure
          // eviction recomputes instead of hitting cold disk
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def pos(key: org.apache.spark.sql.Column,
            h: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(key.cast("string"), lit(":"),
            h.cast("string"))), 1, 8), 16, 10).cast("long") % M
        // Round 18 (guide §2.3/§4): the bloom positions are a function
        // of k alone, but the old shape md5-hashed every (row, h) pair —
        // 3 md5s per ORDER row (~450k at sf0.1) before the distinct.
        // Hash the ~10x-smaller distinct-key dim once (3 md5s per KEY)
        // and attach positions to the distinct (file_id, k) pairs by a
        // broadcastable join: same distinct (file_id, p) set, an order
        // of magnitude less hashing and narrower pre-distinct rows.
        val keyPos = rows.select(col("k")).distinct()
          .select(col("k"), explode(array(lit(0), lit(1), lit(2))).as("h"))
          .select(col("k"), pos(col("k"), col("h")).as("p"))
        val filePos = rows
          .select(col("file_id"), col("k")).distinct()
          .join(keyPos, "k")
          .select(col("file_id"), col("p"))
          .distinct()
        val probes = rows.select(col("k")).distinct()
          .filter(col("k") % 50 === 0)
        val probePos = probes
          .select(col("k"), explode(array(lit(0), lit(1), lit(2))).as("h"))
          .select(col("k"), pos(col("k"), col("h")).as("p"))
          .distinct()
        val nProbe = probePos.groupBy(col("k"))
          .agg(count(lit(1)).as("np"))
        val exact = rows.join(probes, "k")
          .select(col("k"), col("file_id")).distinct()
          .groupBy(col("k")).agg(count(lit(1)).as("files_exact"))
        val bloomHits = probePos.join(filePos, "p")
          .groupBy(col("k"), col("file_id"))
          .agg(count(lit(1)).as("matched"))
          .join(broadcast(nProbe), "k")
          .filter(col("matched") === col("np"))
          .groupBy(col("k")).agg(count(lit(1)).as("files_bloom"))
        val tot = rows.agg((max(col("file_id")) + 1).as("files_total"))
        exact.join(bloomHits, "k")
          .crossJoin(broadcast(tot))
          .select(col("k").as("custkey"), col("files_total"),
            col("files_exact"), col("files_bloom"),
            (col("files_bloom") - col("files_exact")).as("false_pos"),
            expr("(files_bloom - files_exact) * 10000 div " +
              "greatest(1L, files_total - files_exact)").as("fp_bp"))
          .orderBy(col("custkey"))
      },
      Some("""WITH rows_ AS (
                SELECT (row_number() OVER (ORDER BY o_orderkey) - 1)
                    // 64 AS file_id,
                  CAST(o_custkey AS BIGINT) AS k
                FROM orders),
              hs AS (SELECT unnest([0, 1, 2]) AS h),
              fpos AS (
                SELECT DISTINCT file_id,
                  ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                    CAST(h AS VARCHAR)), 1, 8))::BIGINT % 512 AS p
                FROM rows_, hs),
              probes AS (
                SELECT DISTINCT k FROM rows_ WHERE k % 50 = 0),
              ppos AS (
                SELECT DISTINCT k,
                  ('0x' || substr(md5(CAST(k AS VARCHAR) || ':' ||
                    CAST(h AS VARCHAR)), 1, 8))::BIGINT % 512 AS p
                FROM probes, hs),
              np AS (SELECT k, count(*) AS np FROM ppos GROUP BY 1),
              exact_ AS (
                SELECT k, count(DISTINCT file_id) AS files_exact
                FROM rows_ WHERE k % 50 = 0 GROUP BY 1),
              bh AS (
                SELECT ppos.k, fpos.file_id, count(*) AS matched
                FROM ppos JOIN fpos ON fpos.p = ppos.p
                GROUP BY 1, 2),
              bloom AS (
                SELECT bh.k, count(*) AS files_bloom
                FROM bh JOIN np ON np.k = bh.k
                WHERE bh.matched = np.np GROUP BY 1),
              tot AS (SELECT max(file_id) + 1 AS files_total FROM rows_)
              SELECT e.k AS custkey,
                CAST(tot.files_total AS BIGINT) AS files_total,
                CAST(e.files_exact AS BIGINT) AS files_exact,
                CAST(b.files_bloom AS BIGINT) AS files_bloom,
                CAST(b.files_bloom - e.files_exact AS BIGINT)
                  AS false_pos,
                CAST((b.files_bloom - e.files_exact) * 10000 //
                  greatest(1, tot.files_total - e.files_exact) AS BIGINT)
                  AS fp_bp
              FROM exact_ e JOIN bloom b ON b.k = e.k, tot
              ORDER BY custkey""")),

    // Temporal-leakage audit: cut the event stream at the midpoint day
    // (one scalar agg — no sort), split train = strictly before, test
    // = at-or-after, then count the users with activity on BOTH sides.
    // Those entities leak: any per-user feature computed on "train"
    // (q208's churn features, q180's EWMA) silently encodes test-side
    // behavior for them. The q93/q205 split-hygiene family at the
    // temporal axis.
    QEntry("q327_temporal_leakage",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"),
            expr("ts div 86400000000000").as("day"))
        val cut = ev.agg(
          expr("min(day) + (max(day) - min(day)) div 2").as("cut_day"))
        val users = ev.crossJoin(broadcast(cut))
          .groupBy(col("user_id"))
          .agg(sum((col("day") < col("cut_day")).cast("long")).as("nb"),
            sum((col("day") >= col("cut_day")).cast("long")).as("na"))
        users.agg(count(lit(1)).as("n_users"),
            sum((col("nb") > 0 && col("na") === 0).cast("long"))
              .as("train_only"),
            sum((col("na") > 0 && col("nb") === 0).cast("long"))
              .as("test_only"),
            sum((col("nb") > 0 && col("na") > 0).cast("long"))
              .as("leaky_users"),
            sum(col("nb")).as("events_before"),
            sum(col("na")).as("events_after"))
          .withColumn("leak_ppm",
            expr("leaky_users * 1000000 div n_users"))
      },
      Some("""WITH ev AS (
                SELECT user_id, epoch_us(ts) // 86400000000 AS day
                FROM events),
              cut AS (
                SELECT min(day) + (max(day) - min(day)) // 2 AS cut_day
                FROM ev),
              u AS (
                SELECT user_id,
                  sum(CASE WHEN day < cut.cut_day THEN 1 ELSE 0 END)
                    AS nb,
                  sum(CASE WHEN day >= cut.cut_day THEN 1 ELSE 0 END)
                    AS na
                FROM ev, cut GROUP BY 1)
              SELECT CAST(count(*) AS BIGINT) AS n_users,
                CAST(sum(CASE WHEN nb > 0 AND na = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS train_only,
                CAST(sum(CASE WHEN na > 0 AND nb = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS test_only,
                CAST(sum(CASE WHEN nb > 0 AND na > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS leaky_users,
                CAST(sum(nb) AS BIGINT) AS events_before,
                CAST(sum(na) AS BIGINT) AS events_after,
                CAST(sum(CASE WHEN nb > 0 AND na > 0 THEN 1 ELSE 0 END)
                  * 1000000 // count(*) AS BIGINT) AS leak_ppm
              FROM u"""))
  )
}
