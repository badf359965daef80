package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Round-10 session-4, final pack: the duplicate-collapse composition
  * that restores linearity to near-dup joins on duplication-dense
  * corpora (the q152/q172 lesson promoted to the TEXT side — SCALE.md
  * measured the uncollapsed q61 at 155× on the sf≈10 replica, the
  * squared-pairs pathology this operator removes). Round 11 made the
  * collapse the OPERATOR DEFAULT (VERDICT r10 item 1), so this gate row
  * now pins the default's dup path on a corpus that actually HAS byte
  * duplicates — the text twin of q152's planted-dup vector gate.
  */
object Pipeline32 {

  val entries: Seq[QEntry] = Seq(

    // The default collapsed PPJoin on a PLANTED duplicate corpus: the
    // %7==3 slice copied at +1e7 ids, the %13==5 slice at +2e7 (a doc in
    // both slices gets n_dups = 3). The operator's built-in collapse
    // must (a) emit one `dup` edge per planted copy with inter = uni =
    // the rep's gram-set size, (b) weight every `near` rep pair by
    // n_dups(a)·n_dups(b) — the full cross-duplicate pair count without
    // materializing it (on a corpus where every doc has k byte-copies
    // this turns O((k·D)²)-shaped candidate generation into
    // O(D²-shaped-on-distinct + D·k); measured >100× in SCALE.md).
    // The oracle replays collapse → brute-force join over reps → dup
    // edges bit-for-bit.
    QEntry("q275_collapsed_ngram_join",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val planted = docs
          .union(docs.filter(col("doc_id") % 7 === 3)
            .select((col("doc_id") + 10000000).as("doc_id"), col("text")))
          .union(docs.filter(col("doc_id") % 13 === 5)
            .select((col("doc_id") + 20000000).as("doc_id"), col("text")))
        Dedup.ngramJaccardPairs(planted, "doc_id", "text",
          n = 3, tNum = 4, tDen = 5)
          .orderBy(col("kind"), col("a_id"), col("b_id"))
      },
      Some("""WITH base AS (
                SELECT doc_id, text FROM documents
                UNION ALL
                SELECT doc_id + 10000000, text FROM documents
                WHERE doc_id % 7 = 3
                UNION ALL
                SELECT doc_id + 20000000, text FROM documents
                WHERE doc_id % 13 = 5),
              grp AS (
                SELECT md5(text) AS h, min(doc_id) AS keep_id,
                  count(*) AS n_dups
                FROM base GROUP BY 1),
              reps AS (
                SELECT b.doc_id, b.text, g.n_dups
                FROM base b JOIN grp g ON g.keep_id = b.doc_id),
              members AS (
                SELECT g.keep_id AS rep_id, b.doc_id AS member_id
                FROM base b JOIN grp g ON g.h = md5(b.text)
                WHERE b.doc_id <> g.keep_id),
              t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+')
                  AS toks
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
                SELECT 'near' AS kind, i.a_id, i.b_id, i.inter,
                  sa.ntok + sb.ntok - i.inter AS uni,
                  CAST(ra.n_dups * rb.n_dups AS BIGINT) AS implied_pairs
                FROM inter i
                JOIN sz sa ON sa.doc_id = i.a_id
                JOIN sz sb ON sb.doc_id = i.b_id
                JOIN reps ra ON ra.doc_id = i.a_id
                JOIN reps rb ON rb.doc_id = i.b_id
                WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
              dup AS (
                SELECT 'dup' AS kind, m.rep_id AS a_id,
                  m.member_id AS b_id, s.ntok AS inter, s.ntok AS uni,
                  CAST(1 AS BIGINT) AS implied_pairs
                FROM members m JOIN sz s ON s.doc_id = m.rep_id)
              SELECT * FROM near UNION ALL SELECT * FROM dup
              ORDER BY kind, a_id, b_id"""))
  )
}
