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
