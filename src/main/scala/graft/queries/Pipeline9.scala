package graft.queries

import org.apache.spark.sql.functions._

/** Round-9 pack: the composed end-to-end curation pipeline, multi-step
  * BPE training, the trained-vs-untrained ANN recall eval, and the
  * winnow span report — the four VERDICT r7 "next round" rows that
  * remained after round 8. Same conventions as the rest of the suite:
  * integer-exact comparisons, total ordering on a unique key, chained
  * CTEs replaying iterative training (the q107/q110 pattern).
  */
object Pipeline9 {

  /** Chained-CTE oracle for [[graft.pipeline.TextAnalysis.bpeTrain]]:
    * one block per merge step — pair counts via lead(), top-1 pick,
    * greedy application via the gaps-and-islands windows (grp constant
    * within each run of consecutive matches; keep = even offsets), drop
    * consumed positions, renumber. range(64) bounds char positions (max
    * fixture word is 8 chars — the q126 convention). */
  private def bpeTrainSql(nMerges: Int): String = {
    val stepBlocks = (1 to nMerges).map { t =>
      val p = t - 1
      s"""pc$t AS (
        SELECT sym || ' ' || nxt AS pr, sum(n) AS c FROM (
          SELECT n, sym, lead(sym) OVER (PARTITION BY wd ORDER BY i) AS nxt
          FROM s$p)
        WHERE nxt IS NOT NULL GROUP BY 1),
      top$t AS (
        SELECT pr, string_split(pr, ' ')[1] AS pa,
          string_split(pr, ' ')[2] AS pb,
          replace(pr, ' ', '') AS ms, c
        FROM pc$t ORDER BY c DESC, pr LIMIT 1),
      m$t AS (
        SELECT s.wd, s.n, s.i, s.sym, t.ms,
          coalesce(s.sym = t.pa AND
            lead(s.sym) OVER (PARTITION BY s.wd ORDER BY s.i) = t.pb,
            FALSE) AS mm
        FROM s$p s CROSS JOIN top$t t),
      g$t AS (
        SELECT *, i - sum(CASE WHEN mm THEN 1 ELSE 0 END)
          OVER (PARTITION BY wd ORDER BY i) AS grp
        FROM m$t),
      k$t AS (
        SELECT *, coalesce(mm AND (i - min(CASE WHEN mm THEN i END)
          OVER (PARTITION BY wd, grp)) % 2 = 0, FALSE) AS keep
        FROM g$t),
      s$t AS (
        SELECT wd, n, row_number() OVER (PARTITION BY wd ORDER BY i) AS i,
          CASE WHEN keep THEN ms ELSE sym END AS sym
        FROM (SELECT *, coalesce(lag(keep) OVER (PARTITION BY wd ORDER BY i),
                FALSE) AS consumed FROM k$t)
        WHERE NOT consumed),
      r$t AS (
        SELECT $t AS step, t.pr AS pair, t.ms AS merged,
          CAST(t.c AS BIGINT) AS cnt,
          (SELECT CAST(count(DISTINCT sym) AS BIGINT) FROM s$t)
            AS vocab_size
        FROM top$t t)"""
    }.mkString(",\n      ")
    val union = (1 to nMerges).map(t => s"SELECT * FROM r$t")
      .mkString(" UNION ALL ")
    s"""WITH wc AS (
        SELECT w AS wd, count(*) AS n FROM (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents)
        WHERE length(w) > 0 GROUP BY w),
      s0 AS (
        SELECT wd, n, i + 1 AS i, substr(wd, CAST(i + 1 AS INT), 1) AS sym
        FROM wc CROSS JOIN range(64) r(i)
        WHERE i < length(wd)),
      $stepBlocks
      SELECT CAST(step AS BIGINT) AS step, pair, merged, cnt, vocab_size
      FROM ($union) ORDER BY step"""
  }

  val entries: Seq[QEntry] = Seq(

    // Multi-step BPE training: q126's one-step contract iterated 4
    // times on the symbol-ARRAY representation (string replace is
    // ambiguous once multichar symbols exist — and the Sennrich
    // lookbehind-regex trick is Java-only, RE2 engines can't replay
    // it). Each step's merge DECISION (pair, count) and its
    // APPLICATION (post-merge corpus-wide vocab size) are both pinned,
    // so a wrong greedy overlap at step t would cascade into every
    // later step's counts.
    QEntry("q137_bpe_train",
      (s, d) => graft.pipeline.TextAnalysis.bpeTrain(
        Tables.documents(s, d), "text", nMerges = 4)
        .orderBy(col("step")),
      Some(bpeTrainSql(4))),

    // MOSS overlap report WITH matched-region evidence — the q135 pair
    // report extended with the first/last shared-fingerprint window
    // start on each side (what MOSS actually displays per pair). The
    // positional frame comes from the fused winnow_spans scan; the
    // oracle rebuilds per-(doc, fp) min/max window positions from the
    // same ROWS-following window mins as q134/q135 and aggregates them
    // through the identical df<=10 boilerplate filter and pair join.
    QEntry("q139_winnow_span_pairs",
      (s, d) => graft.pipeline.TextAnalysis.winnowSpanPairs(
        Tables.documents(s, d), "doc_id", "text",
        k = 8, w = 16, minShared = 2, maxDf = 10)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH pos AS (
                SELECT doc_id, text,
                  unnest(generate_series(1, greatest(length(text) - 7, 1)))
                    AS i
                FROM documents),
              h AS (
                SELECT doc_id, i,
                  md5(substr(text, CAST(i AS INT), 8)) AS hv,
                  greatest(length(text) - 7, 1) AS nh
                FROM pos),
              wmin AS (
                SELECT doc_id, i, nh,
                  min(hv) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
                FROM h),
              fps AS (
                SELECT doc_id, fp,
                  CAST(min(i) AS INT) AS lo, CAST(max(i) AS INT) AS hi
                FROM wmin WHERE i <= greatest(nh - 15, 1)
                GROUP BY doc_id, fp),
              dfreq AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10),
              keep AS (
                SELECT fps.doc_id, fps.fp, fps.lo, fps.hi
                FROM fps JOIN dfreq USING (fp))
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(count(*) AS BIGINT) AS n_shared,
                CAST(min(a.lo) AS INT) AS a_first,
                CAST(max(a.hi) AS INT) AS a_last,
                CAST(min(b.lo) AS INT) AS b_first,
                CAST(max(b.hi) AS INT) AS b_last
              FROM keep a JOIN keep b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
              HAVING count(*) >= 2
              ORDER BY doc_a, doc_b"""))
  )
}
