package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-5 text-retrieval pack: TF-IDF term scoring and a bounded
  * inverted index — the retrieval-side operators of a training-data
  * pipeline (dedup/quality filtering feed INTO these; similarity search
  * reads OUT of them).
  */
object Pipeline4 {

  val entries: Seq[QEntry] = Seq(

    // TF-IDF: per-(doc, term) score. Two hash aggregations (tf on
    // (doc, term), df on term — both map-side combined) + one join on
    // term + the corpus size broadcast as a 1-row frame (never a
    // driver-side collect). Doubles appear only in the final ln() —
    // rounded at the query edge per the oracle-parity convention.
    QEntry("q81_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        val terms = docs.select(col("doc_id"), explode(col("toks")).as("term"))
        val tf = terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(dfreq, "term")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            round(col("tf") *
              log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
          .orderBy(col("doc_id"), col("term"))
      },
      Some("""WITH t AS (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
                FROM documents),
              tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM t GROUP BY doc_id, term),
              df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              n AS (SELECT count(*) AS n_docs FROM documents)
              SELECT tf.doc_id, tf.term, tf.tf, df.df,
                round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n
              ORDER BY tf.doc_id, tf.term""")),

    // Product-quantization ADC search under the full oracle: seed
    // codebooks (subvectors of the 4 lowest vec_ids — deterministic,
    // rebuildable in SQL), integer-dot encode, and ADC top-5 where
    // score(q, x) = dot(q, reconstruct(codes(x))) exactly. The oracle
    // recomputes encode+score as a join-sum — every stage of the PQ
    // dataflow is integer-pinned (Lloyd-TRAINED codebooks are the
    // spec-gated upgrade: same dataflow, PqSpec).
    QEntry("q83_pq_adc",
      (s, d) => {
        val (m, ksub, dim, k) = (4, 4, 64, 5)
        val emb = Tables.embeddings(s, d)
        val cb = graft.pipeline.Similarity.pqCodebookSeed(emb, m, ksub, dim)
        val enc = graft.pipeline.Similarity.pqEncode(emb, cb, m, dim)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        graft.pipeline.Similarity.pqTopKDot(queries, enc, cb, m, ksub, dim, k)
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              sub AS (
                SELECT vec_id, sg.s, qe[sg.s*16+1 : sg.s*16+16] AS sv
                FROM qz CROSS JOIN (SELECT unnest([0,1,2,3]) AS s) sg),
              seeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
              cb AS (
                SELECT sub.s, seeds.cid, sub.sv AS cv
                FROM sub JOIN seeds USING (vec_id)),
              dots AS (
                SELECT sub.vec_id, sub.s, cb.cid,
                  CAST(list_sum(list_transform(range(len(sub.sv)),
                       i -> sub.sv[i+1] * cb.cv[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM sub JOIN cb ON sub.s = cb.s),
              codes AS (
                SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM dots) WHERE arn = 1),
              scores AS (
                SELECT qd.vec_id AS q_id, c.vec_id,
                  CAST(sum(qd.dot) AS BIGINT) AS score
                FROM codes c
                JOIN dots qd ON c.s = qd.s AND c.cid = qd.cid
                WHERE qd.vec_id % 100 = 0
                GROUP BY qd.vec_id, c.vec_id),
              ranked AS (
                SELECT q_id, vec_id, score,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, vec_id) AS rn
                FROM scores)
              SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= 5
              ORDER BY q_id, rn""")),

    // Per-doc contamination FLAGS (every non-bench doc kept, zero
    // included) — the state-free projection twin of q80, identical in
    // batch and append-mode streaming (TextAnalysis.contaminationFlags
    // scaladoc; streaming equivalence spec-pinned).
    QEntry("q84_contamination_flags",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bench = graft.pipeline.TextAnalysis.benchShingleHashSet(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
        graft.pipeline.TextAnalysis.contaminationFlags(
          docs.filter(col("doc_id") % 10 =!= 0), bench, "doc_id", "text", 8)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, len(toks) - 6),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                       toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                       toks[i+6] || ' ' || toks[i+7]))) AS g
                FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                      FROM documents)
                WHERE len(toks) >= 8),
              bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0),
              hits AS (
                SELECT s.doc_id, count(*) AS n_contaminated
                FROM sh s JOIN bench b USING (g)
                WHERE s.doc_id % 10 <> 0
                GROUP BY s.doc_id)
              SELECT d.doc_id, CAST(coalesce(h.n_contaminated, 0) AS BIGINT)
                       AS n_contaminated
              FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
              WHERE d.doc_id % 10 <> 0
              ORDER BY d.doc_id""")),

    // Bounded inverted index: per term, document frequency + the first
    // maxPostings doc ids. The cap runs BEFORE the collect (row_number
    // per term, filter, then collect_list) so no executor ever holds a
    // stopword's full posting list — collect_list-then-slice would buffer
    // O(df) per term, which at corpus scale is the whole corpus for
    // common terms.
    QEntry("q82_inverted_index",
      (s, d) => {
        val maxPostings = 20
        val terms = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(split(lower(col("text")), "\\s+"))).as("term"))
        val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
        terms
          .withColumn("rn", row_number().over(w))
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"),
            array_join(
              transform(
                sort_array(collect_list(when(col("rn") <= maxPostings, col("doc_id")))),
                x => x.cast("string")),
              ",").as("postings_csv"))
          .orderBy(col("term"))
      },
      Some("""WITH t AS (
                SELECT DISTINCT doc_id,
                  unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS term
                FROM documents)
              SELECT term, count(*) AS df,
                array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings_csv
              FROM t GROUP BY term ORDER BY term"""))
  )
}
