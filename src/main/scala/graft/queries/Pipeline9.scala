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
      Some(bpeTrainSql(4)))
  )
}
