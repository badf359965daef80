package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.Dedup

/** Round-10 session-4, final pack: the duplicate-collapse composition
  * that restores linearity to near-dup joins on duplication-dense
  * corpora (the q152/q172 lesson promoted to the TEXT side — SCALE.md
  * measured the uncollapsed q61 at 155× on the sf≈10 replica, the
  * squared-pairs pathology this operator removes).
  */
object Pipeline32 {

  val entries: Seq[QEntry] = Seq(

    // Collapse-then-join: exact groups first (one md5 hash-agg), the
    // PPJoin n-gram similarity join runs on group REPRESENTATIVES
    // only, and each surviving rep pair carries the IMPLIED
    // cross-duplicate pair count (n_dups_a · n_dups_b) — the full
    // near-dup pair set without materializing it. On a corpus where
    // every doc has k byte-copies this turns O((k·D)²)-shaped
    // candidate generation into O(D²-shaped-on-distinct + D·k) —
    // measured at the sf≈10 byte-dup corpus in SCALE.md. The fixture
    // has no exact dups, so the gate row pins the composition's
    // degenerate-case equality with q61 (implied_pairs = 1).
    QEntry("q275_collapsed_ngram_join",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val groups = Dedup.exactGroups(docs, "doc_id", "text")
          .select(col("keep_id").as("doc_id"), col("n_dups"))
        val reps = docs.join(groups, "doc_id")
          .localCheckpoint() // reps feed the join AND both expansions
        val pairs = Dedup.ngramJaccardPairs(
          reps.select(col("doc_id"), col("text")), "doc_id", "text",
          n = 3, tNum = 4, tDen = 5)
        pairs
          .join(reps.select(col("doc_id").as("a_id"),
            col("n_dups").as("na")), "a_id")
          .join(reps.select(col("doc_id").as("b_id"),
            col("n_dups").as("nb")), "b_id")
          .select(col("a_id"), col("b_id"), col("inter"), col("uni"),
            (col("na") * col("nb")).as("implied_pairs"))
          .orderBy(col("a_id"), col("b_id"))
      },
      Some("""WITH grp AS (
                SELECT md5(text) AS h, min(doc_id) AS keep_id,
                  count(*) AS n_dups
                FROM documents GROUP BY 1),
              reps AS (
                SELECT d.doc_id, d.text, g.n_dups
                FROM documents d JOIN grp g ON g.keep_id = d.doc_id),
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
                GROUP BY 1, 2)
              SELECT i.a_id, i.b_id, i.inter,
                sa.ntok + sb.ntok - i.inter AS uni,
                CAST(ga.n_dups * gb.n_dups AS BIGINT) AS implied_pairs
              FROM inter i
              JOIN sz sa ON sa.doc_id = i.a_id
              JOIN sz sb ON sb.doc_id = i.b_id
              JOIN reps ga ON ga.doc_id = i.a_id
              JOIN reps gb ON gb.doc_id = i.b_id
              WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4
              ORDER BY i.a_id, i.b_id"""))
  )
}
