package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, eighth batch: corpus-stewardship advisors —
  * freshness-decayed mixture shares (q312), the LSH band/row planner
  * driven by the observed similarity histogram (q313), and the
  * duplicate-group representative-selection audit (q314).
  */
object Pipeline44 {

  def entries: Seq[QEntry] = Seq(

    // Freshness-decayed source mix: each event's weight halves every 7
    // days of age (integer decay — 1e6 div 2^(age div 7), zero past 20
    // weeks; no libm, so both engines agree bit-for-bit), giving the
    // recency-weighted event-type shares next to the raw shares — the
    // "is my corpus going stale, and where" monitor. One keyed agg to
    // the (type, day) dim; the decay math lives on the dim.
    QEntry("q312_decayed_mix",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // (type, day) dimension
        val maxDay = daily.agg(max(col("day"))).head().getLong(0)
        val wtd = daily
          .withColumn("age_w", expr(s"(${maxDay}L - day) div 7"))
          .withColumn("w_micro",
            when(col("age_w") >= 20, lit(0L))
              .otherwise(expr("1000000 div CAST(pow(2, age_w) AS BIGINT)")))
          .groupBy(col("event_type"))
          .agg(sum(col("cnt")).as("n_events"),
            sum(col("cnt") * col("w_micro")).as("decayed_micro"))
          .localCheckpoint()
        val tot = wtd.agg(sum(col("n_events")).as("tn"),
          sum(col("decayed_micro")).as("td")).head()
        wtd.select(col("event_type"), col("n_events"), col("decayed_micro"),
            expr(s"n_events * 1000000 div ${tot.getLong(0)}L")
              .as("raw_share_ppm"),
            expr(s"decayed_micro * 1000000 div ${tot.getLong(1)}L")
              .as("decayed_share_ppm"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              mx AS (SELECT max(day) AS md FROM daily),
              wtd AS (
                SELECT event_type, sum(cnt) AS n_events,
                  sum(cnt * (CASE
                    WHEN ((SELECT md FROM mx) - day) // 7 >= 20 THEN 0
                    ELSE 1000000 // CAST(pow(2,
                      ((SELECT md FROM mx) - day) // 7) AS BIGINT)
                    END)) AS decayed_micro
                FROM daily GROUP BY 1),
              tot AS (
                SELECT sum(n_events) AS tn, sum(decayed_micro) AS td
                FROM wtd)
              SELECT w.event_type,
                CAST(w.n_events AS BIGINT) AS n_events,
                CAST(w.decayed_micro AS BIGINT) AS decayed_micro,
                CAST(w.n_events * 1000000 // t.tn AS BIGINT)
                  AS raw_share_ppm,
                CAST(w.decayed_micro * 1000000 // t.td AS BIGINT)
                  AS decayed_share_ppm
              FROM wtd w CROSS JOIN tot t
              ORDER BY w.event_type""")),

    // LSH band/row planner: for every (bands, rows) split of a 64-perm
    // MinHash signature, the expected false-candidate and missed-pair
    // mass at threshold 0.8 under the OBSERVED pair-similarity
    // histogram (exact Jaccard over the deterministic adjacent-pair
    // sample (i, i+1) — the q55 replay pattern, inter=0 pairs kept).
    // S-curve P(s) = 1-(1-s^r)^b; fp sums P over pairs below the
    // threshold, fn sums 1-P above. The "how do I configure my dedup
    // index" advisor, data-driven; grids are broadcast dims.
    QEntry("q313_lsh_planner",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val toks = graft.pipeline.Dedup.tokenArrays(docs, "doc_id", "text")
          .localCheckpoint()
        val adj = docs.select(col("doc_id").as("a_id"),
            (col("doc_id") + 1).as("b_id"))
          .join(toks.select(col("doc_id").as("b_id")), "b_id")
        val hist = graft.pipeline.Dedup.verifyJaccard(adj, toks, 0.0)
          .select(expr("(100 * inter) div uni").as("s_centi"))
          .groupBy(col("s_centi")).agg(count(lit(1)).as("np"))
          .localCheckpoint() // ≤101-row similarity histogram
        import s.implicits._
        val configs = Seq(1, 2, 4, 8, 16, 32, 64)
          .map(b => (b.toLong, 64L / b)).toDF("b", "r")
        val scored = broadcast(configs).crossJoin(hist)
          .withColumn("p", lit(1.0) - pow(lit(1.0) -
            pow(col("s_centi").cast("double") / 100.0, col("r")), col("b")))
          .groupBy(col("b"), col("r"))
          .agg(sum(col("np")).as("n_pairs"),
            round(sum(when(col("s_centi") < 80,
              col("p") * col("np")).otherwise(lit(0.0))), 6).as("fp_pairs"),
            round(sum(when(col("s_centi") >= 80,
              (lit(1.0) - col("p")) * col("np")).otherwise(lit(0.0))), 6)
              .as("fn_pairs"))
          .withColumn("cost", round(col("fp_pairs") + col("fn_pairs"), 6))
        val best = scored.agg(min(struct(col("cost"), col("b"))).as("m"))
          .select(col("m.cost").as("bc"), col("m.b").as("bb"))
        scored.crossJoin(broadcast(best))
          .select(col("b"), col("r"), col("n_pairs"), col("fp_pairs"),
            col("fn_pairs"), col("cost"),
            (col("cost") === col("bc") && col("b") === col("bb"))
              .cast("long").as("is_best"))
          .orderBy(col("b"))
      },
      Some("""WITH tok AS (
                SELECT doc_id,
                  unnest(list_distinct(string_split_regex(lower(text),
                    '\s+'))) AS tok
                FROM documents),
              sizes AS (
                SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
              adj AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id
                FROM documents a JOIN documents b
                  ON b.doc_id = a.doc_id + 1),
              inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                  count(*) AS inter
                FROM tok a JOIN tok b
                  ON a.tok = b.tok AND b.doc_id = a.doc_id + 1
                GROUP BY 1, 2),
              pairs AS (
                SELECT adj.a_id, adj.b_id,
                  coalesce(i.inter, 0) AS inter,
                  sa.ntok + sb.ntok - coalesce(i.inter, 0) AS uni
                FROM adj
                LEFT JOIN inter i
                  ON i.a_id = adj.a_id AND i.b_id = adj.b_id
                JOIN sizes sa ON sa.doc_id = adj.a_id
                JOIN sizes sb ON sb.doc_id = adj.b_id),
              hist AS (
                SELECT (100 * inter) // uni AS s_centi, count(*) AS np
                FROM pairs GROUP BY 1),
              configs AS (
                SELECT CAST(b AS BIGINT) AS b, CAST(64 // b AS BIGINT) AS r
                FROM (SELECT unnest([1, 2, 4, 8, 16, 32, 64]) AS b)),
              scored AS (
                SELECT c.b, c.r, CAST(sum(h.np) AS BIGINT) AS n_pairs,
                  round(sum(CASE WHEN h.s_centi < 80 THEN
                    (1 - pow(1 - pow(h.s_centi / 100.0, c.r), c.b)) * h.np
                    ELSE 0 END), 6) AS fp_pairs,
                  round(sum(CASE WHEN h.s_centi >= 80 THEN
                    pow(1 - pow(h.s_centi / 100.0, c.r), c.b) * h.np
                    ELSE 0 END), 6) AS fn_pairs
                FROM configs c CROSS JOIN hist h
                GROUP BY 1, 2),
              sc2 AS (
                SELECT *, round(fp_pairs + fn_pairs, 6) AS cost
                FROM scored),
              best AS (
                SELECT cost AS bc, b AS bb FROM sc2
                ORDER BY cost, b LIMIT 1)
              SELECT s.b, s.r, s.n_pairs, s.fp_pairs, s.fn_pairs, s.cost,
                CAST(CASE WHEN s.cost = t.bc AND s.b = t.bb
                  THEN 1 ELSE 0 END AS BIGINT) AS is_best
              FROM sc2 s CROSS JOIN best t
              ORDER BY s.b""")),

    // Representative-selection audit: when a dedup group keeps one
    // copy, min-id is the usual (cheap) policy — this measures what a
    // quality-aware policy would have kept instead. Byte-dup groups
    // are planted (%40 docs return under shifted ids — the q275/q309
    // precedent); quality is a deterministic metadata-completeness
    // stand-in (n_chars·10 − id%7) so copies genuinely differ. Output
    // per group: both reps' qualities and the regret of min-id.
    QEntry("q314_rep_selection",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("n_chars"))
        val planted = base.filter(col("doc_id") % 40 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text"),
            col("n_chars"))
        val corpus = base.union(planted)
          .select(col("doc_id"), md5(col("text")).as("k"),
            (col("n_chars") * 10 - col("doc_id") % 7).as("q"))
          .localCheckpoint()
        val grp = corpus.groupBy(col("k"))
          .agg(min(col("doc_id")).as("rep_min"),
            count(lit(1)).as("n_members"),
            max(struct(col("q").as("q"), (-col("doc_id")).as("ni"))).as("m"))
          .filter(col("n_members") > 1)
          .select(col("k"), col("rep_min"), col("n_members"),
            col("m.q").as("best_q"), (-col("m.ni")).as("best_id"))
        grp.join(corpus.select(col("doc_id").as("rep_min"),
            col("q").as("min_q")), "rep_min")
          .select(col("rep_min"), col("n_members"), col("min_q"),
            col("best_id"), col("best_q"),
            (col("best_q") - col("min_q")).as("regret"))
          .orderBy(col("rep_min"))
      },
      Some("""WITH corpus AS (
                SELECT doc_id, md5(text) AS k,
                  n_chars * 10 - doc_id % 7 AS q
                FROM documents
                UNION ALL
                SELECT doc_id + 1000000, md5(text),
                  n_chars * 10 - (doc_id + 1000000) % 7
                FROM documents WHERE doc_id % 40 = 0),
              grp AS (
                SELECT k, min(doc_id) AS rep_min, count(*) AS n_members
                FROM corpus GROUP BY k HAVING count(*) > 1),
              best AS (
                SELECT k, q AS best_q, doc_id AS best_id FROM (
                  SELECT k, doc_id, q, row_number() OVER (
                    PARTITION BY k ORDER BY q DESC, doc_id) AS rn
                  FROM corpus) WHERE rn = 1)
              SELECT g.rep_min, CAST(g.n_members AS BIGINT) AS n_members,
                c.q AS min_q, b.best_id, b.best_q,
                b.best_q - c.q AS regret
              FROM grp g
              JOIN best b USING (k)
              JOIN corpus c ON c.doc_id = g.rep_min
              ORDER BY g.rep_min"""))
  )
}
