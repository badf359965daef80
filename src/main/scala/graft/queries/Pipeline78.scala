package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 pack, fifth batch — dedup planning readout and the
  * streaming member of the drift family.
  */
object Pipeline78 {

  val entries: Seq[QEntry] = Seq(

    // Dedup savings census: the "what does exact dedup buy" planning
    // readout — per duplicate-cluster SIZE k: how many clusters, how
    // many redundant docs ((k−1) per cluster) and how many redundant
    // BYTES (n_chars of every non-rep member), with the corpus totals
    // and the overall savings share in bp riding on every row. Corpus:
    // the q328 plant convention (every 20th doc +1 copy, every 25th +3
    // byte-identical copies — 20∤25 overlaps give mixed cluster
    // sizes). One md5 group to the cluster dim; the histogram is a
    // second agg on cluster size — the corpus is scanned once.
    QEntry("q389_dedup_savings",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
        val corpus = base
          .union(base.filter(col("doc_id") % 20 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              col("text"), col("n_chars")))
          .union(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              col("text"), col("n_chars")))
          .union(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 30000000L).as("doc_id"),
              col("text"), col("n_chars")))
          .union(base.filter(col("doc_id") % 25 === 0)
            .select((col("doc_id") + 40000000L).as("doc_id"),
              col("text"), col("n_chars")))
        val clusters = corpus
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("k"), sum(col("n_chars")).as("bytes"),
            min(col("n_chars")).as("rep_bytes"))
          .localCheckpoint() // cluster dim: histogram + totals
        val hist = clusters.groupBy(col("k"))
          .agg(count(lit(1)).as("n_clusters"),
            (sum(col("k")) - count(lit(1))).as("redundant_docs"),
            sum(col("bytes") - col("rep_bytes")).as("redundant_bytes"))
        val tot = clusters.agg(sum(col("k")).as("total_docs"),
          sum(col("bytes")).as("total_bytes"),
          sum(col("bytes") - col("rep_bytes")).as("saved_bytes"))
        hist.crossJoin(broadcast(tot))
          .select(col("k"), col("n_clusters"), col("redundant_docs"),
            col("redundant_bytes"), col("total_docs"),
            col("total_bytes"),
            expr("saved_bytes * 10000 div total_bytes")
              .as("savings_bp"))
          .orderBy(col("k"))
      },
      Some("""WITH base AS (
                SELECT doc_id, text, n_chars FROM documents),
              corpus AS (
                SELECT doc_id, text, n_chars FROM base
                UNION ALL
                SELECT doc_id + 10000000, text, n_chars FROM base
                WHERE doc_id % 20 = 0
                UNION ALL
                SELECT doc_id + 20000000, text, n_chars FROM base
                WHERE doc_id % 25 = 0
                UNION ALL
                SELECT doc_id + 30000000, text, n_chars FROM base
                WHERE doc_id % 25 = 0
                UNION ALL
                SELECT doc_id + 40000000, text, n_chars FROM base
                WHERE doc_id % 25 = 0),
              clusters AS (
                SELECT md5(text) AS h, count(*) AS k,
                  sum(n_chars) AS bytes, min(n_chars) AS rep_bytes
                FROM corpus GROUP BY md5(text)),
              hist AS (
                SELECT k, count(*) AS n_clusters,
                  sum(k) - count(*) AS redundant_docs,
                  sum(bytes - rep_bytes) AS redundant_bytes
                FROM clusters GROUP BY k),
              tot AS (
                SELECT sum(k) AS total_docs, sum(bytes) AS total_bytes,
                  sum(bytes - rep_bytes) AS saved_bytes
                FROM clusters)
              SELECT CAST(k AS BIGINT) AS k,
                CAST(n_clusters AS BIGINT) AS n_clusters,
                CAST(redundant_docs AS BIGINT) AS redundant_docs,
                CAST(redundant_bytes AS BIGINT) AS redundant_bytes,
                CAST(total_docs AS BIGINT) AS total_docs,
                CAST(total_bytes AS BIGINT) AS total_bytes,
                CAST(saved_bytes * 10000 // total_bytes AS BIGINT)
                  AS savings_bp
              FROM hist, tot
              ORDER BY k""")),

    // Streaming weekly mix-shift PSI — the STREAMING member of the
    // drift family (q373's twin): the weekly (window, type) census is
    // computed by the ACTUAL Structured Streaming windowed aggregation
    // (7-day tumbling event-time windows over the event stream,
    // Trigger.AvailableNow into a complete-mode memory sink — the q122
    // gate convention), and the PSI arithmetic (Laplace-densified
    // census, ppm shares, micro-nat ln terms, adjacent-week join) runs
    // on the sink frame exactly as q373 runs it on the batch census.
    // window() aligns to the epoch, so window.start micros div the
    // week length IS q373's `ts div 604800000000000` week key — the
    // oracle is q373's, byte for byte: oracle == batch == streaming,
    // the q121/q122 audit chain for the monitoring family.
    QEntry("q390_stream_weekly_psi",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, d)
        val inDir = Scratch.dir(s, "q390_events")
        ev.coalesce(1).write.mode("overwrite").parquet(inDir)
        val sink = "q390_psi_sink"
        val stream = s.readStream
          .schema(graft.streaming.EventsProfile.eventsSchema)
          .parquet(inDir)
        val q = graft.streaming.EventsProfile.withEventTime(stream)
          .groupBy(window(col("event_time"), "7 days"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
          .writeStream.outputMode("complete").format("memory")
          .queryName(sink).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val wt = s.table(sink)
          .select(expr("unix_micros(window.start) div 604800000000")
            .as("wk"), col("event_type"), col("c"))
          .localCheckpoint() // the streamed census; PSI runs batch-side
        val weeks = wt.select(col("wk")).distinct()
        val types = wt.select(col("event_type")).distinct()
        val dense = weeks.crossJoin(broadcast(types))
          .join(wt, Seq("wk", "event_type"), "left")
          .select(col("wk"), col("event_type"),
            (coalesce(col("c"), lit(0L)) + 1L).as("c"))
          .localCheckpoint()
        val tot = dense.groupBy(col("wk")).agg(sum(col("c")).as("n"))
        val shares = dense.join(broadcast(tot), "wk")
          .select(col("wk"), col("event_type"),
            expr("c * 1000000 div n").as("p"))
          .localCheckpoint()
        val terms = shares
          .join(shares.select((col("wk") + 1L).as("wk"),
            col("event_type"), col("p").as("q")),
            Seq("wk", "event_type"))
          .select(col("wk"), col("event_type"), col("p"), col("q"),
            expr("CAST(round(ln(CAST(p AS DOUBLE) / q) * 1000000.0) " +
              "AS BIGINT)").as("lnr"))
          .withColumn("contrib_micro",
            expr("(p - q) * lnr div 1000000"))
          .localCheckpoint()
        val psi = terms.groupBy(col("wk"))
          .agg(sum(col("contrib_micro")).as("psi_micro"))
        terms.join(broadcast(psi), "wk")
          .select(col("wk"), col("event_type"), col("p"), col("q"),
            col("contrib_micro"), col("psi_micro"))
          .orderBy(col("wk"), col("event_type"))
      },
      Some("""WITH wt AS (
                SELECT epoch_us(ts) * 1000 // 604800000000000 AS wk,
                  event_type, count(*) AS c
                FROM events GROUP BY 1, 2),
              dense AS (
                SELECT w.wk, t.event_type, coalesce(wt.c, 0) + 1 AS c
                FROM (SELECT DISTINCT wk FROM wt) w
                CROSS JOIN (SELECT DISTINCT event_type FROM wt) t
                LEFT JOIN wt ON wt.wk = w.wk
                  AND wt.event_type = t.event_type),
              tot AS (SELECT wk, sum(c) AS n FROM dense GROUP BY wk),
              sh AS (
                SELECT d.wk, d.event_type,
                  d.c * 1000000 // t.n AS p
                FROM dense d JOIN tot t USING (wk)),
              terms AS (
                SELECT a.wk, a.event_type, a.p, b.p AS q,
                  CAST(round(ln(CAST(a.p AS DOUBLE) / b.p) * 1000000.0)
                    AS BIGINT) AS lnr
                FROM sh a JOIN sh b
                  ON b.event_type = a.event_type AND b.wk = a.wk - 1),
              c2 AS (
                SELECT wk, event_type, p, q, lnr,
                  (p - q) * lnr // 1000000 AS contrib_micro
                FROM terms),
              psi AS (
                SELECT wk, sum(contrib_micro) AS psi_micro
                FROM c2 GROUP BY wk)
              SELECT c2.wk, c2.event_type, CAST(c2.p AS BIGINT) AS p,
                CAST(c2.q AS BIGINT) AS q,
                CAST(c2.contrib_micro AS BIGINT) AS contrib_micro,
                CAST(psi.psi_micro AS BIGINT) AS psi_micro
              FROM c2 JOIN psi USING (wk)
              ORDER BY c2.wk, c2.event_type""")),

    // Pareto skyline selection: the non-dominated documents under two
    // maximize criteria — quality (stopword density bp, the q385
    // scorer) and length (tokens) — the multi-criteria "best docs"
    // operator behind curation shortlists (no scalarization weight to
    // tune: a doc survives iff nothing beats it on both axes). Scale
    // shape: the corpus never self-joins — a (quality-cell × length-
    // cell) GRID census (≤ 41×17, broadcast) prunes every doc whose
    // cell is strictly dominated by an occupied cell (cell floors
    // dominate cell ceilings one step down on both axes); then each
    // live cell reduces to its EXACT cell-local skyline with one
    // windowed pass (partition = cell, so partitions stay small and
    // parallel: a doc strictly dominated inside its own cell can never
    // be globally non-dominated, and dominance is transitive, so the
    // reduction loses nothing — ADVICE r14 item 2); only the remaining
    // candidates (bounded by the sum of per-cell skyline sizes, i.e.
    // by the output anti-chain plus cross-cell frontier slack, NOT by
    // docs-per-live-cell) pairwise-check exactly under a broadcast.
    // The oracle is the naive NOT EXISTS self-join — both prunes are
    // what the hash match certifies.
    QEntry("q391_pareto_skyline",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("toks"),
            (graft.pipeline.TextAnalysis.stopwordCount(col("text"))
              .cast("long") * 10000L).as("st"))
          .withColumn("q_bp", expr("st div greatest(1L, toks)"))
          .select(col("doc_id"), col("toks"), col("q_bp"))
          .withColumn("ca", expr("q_bp div 250"))
          .withColumn("cb", expr("toks div 32"))
          .localCheckpoint() // census + candidate filter
        val cells = scored.select(col("ca"), col("cb")).distinct()
        val domCells = cells.select(col("ca").as("da"), col("cb").as("db"))
        val liveCells = cells.join(broadcast(domCells),
            col("da") >= col("ca") + 1L && col("db") >= col("cb") + 1L,
            "left_anti")
        val live = scored.join(broadcast(liveCells), Seq("ca", "cb"))
        // cell-local exact skyline: dominated in-cell iff some same-cell
        // doc has strictly higher q_bp and toks ≥ mine (range frame
        // (cur+1, ∞) over integral q_bp), or equal q_bp and strictly
        // more toks (range frame (0, 0))
        val wGt = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ca"), col("cb")).orderBy(col("q_bp"))
          .rangeBetween(1L,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        val wEq = org.apache.spark.sql.expressions.Window
          .partitionBy(col("ca"), col("cb")).orderBy(col("q_bp"))
          .rangeBetween(
            org.apache.spark.sql.expressions.Window.currentRow,
            org.apache.spark.sql.expressions.Window.currentRow)
        val cand = live
          .withColumn("mt_gt", max(col("toks")).over(wGt))
          .withColumn("mt_eq", max(col("toks")).over(wEq))
          .filter((col("mt_gt").isNull || col("mt_gt") < col("toks")) &&
            col("mt_eq") <= col("toks"))
          .select(col("doc_id"), col("toks"), col("q_bp"))
          .localCheckpoint() // per-cell skylines: both sides of the check
        cand.join(broadcast(cand.select(col("q_bp").as("yq"),
            col("toks").as("yt"))),
            col("yq") >= col("q_bp") && col("yt") >= col("toks") &&
              (col("yq") > col("q_bp") || col("yt") > col("toks")),
            "left_anti")
          .select(col("doc_id"), col("toks"), col("q_bp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH scored AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)])
                    AS BIGINT) * 10000 AS st
                FROM documents),
              sq AS (
                SELECT doc_id, toks,
                  st // greatest(1, toks) AS q_bp
                FROM scored)
              SELECT x.doc_id, x.toks, CAST(x.q_bp AS BIGINT) AS q_bp
              FROM sq x
              WHERE NOT EXISTS (
                SELECT 1 FROM sq y
                WHERE y.q_bp >= x.q_bp AND y.toks >= x.toks
                  AND (y.q_bp > x.q_bp OR y.toks > x.toks))
              ORDER BY x.doc_id"""))
  )
}
