package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, fourth batch — cross-table integrity for the
  * embedding axis.
  */
object Pipeline83 {

  val entries: Seq[QEntry] = Seq(

    // Embedding-consistency audit: the same CONTENT must embed to the
    // same vector — when a corpus re-embeds (a retry, a backfill, a
    // second pipeline) and rows of one text disagree, that is encoder
    // VERSION SKEW, and every similarity/dedup/decontam result built
    // on those vectors silently mixes two geometries (q382's centroid
    // drift catches it at source grain AFTER the fact; this catches it
    // at content grain, attributably). Shape: one (text-digest,
    // vector-digest) projection, one group to content grain (rows,
    // distinct vectors), one source census — the vector digest is
    // md5 of the comma-joined QUANTIZED components (q36's integer
    // grid), so float-noise below the grid is forgiven by design and
    // anything past it flags. Plant: an md5-drawn ~1/10 of the docs
    // re-embed (a hash draw, not id arithmetic — the fixture's
    // round-robin id↔source layout would pin an id-mod plant to 2 of
    // the 20 sources, the q386 lesson);
    // sources with md5(source) % 4 = 0 re-embed through a SKEWED
    // encoder (+5 quantized units on dim 0) — those contents read
    // n_vecs_distinct = 2 ('skewed'), the rest re-embed bit-identically
    // (consistent duplication, NOT flagged: re-embedding per se is
    // normal; disagreement is the bug).
    QEntry("q404_embedding_consistency",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .join(Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"),
              graft.pipeline.Similarity.quantize(col("embedding"))
                .as("v")), "doc_id")
        val skew = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 4 === 0
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 10 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              col("source"), col("text"),
              when(skew, expr(
                "transform(v, (x, i) -> IF(i = 0, x + 5L, x))"))
                .otherwise(col("v")).as("v")))
        val contents = corpus
          .select(col("source"), md5(col("text")).as("h"),
            md5(expr("array_join(transform(v, x -> CAST(x AS STRING)), " +
              "',')")).as("vd"))
          .groupBy(col("source"), col("h"))
          .agg(count(lit(1)).as("n_rows"),
            countDistinct(col("vd")).as("n_vecs"))
        contents.groupBy(col("source"))
          .agg(count(lit(1)).as("n_contents"),
            sum(when(col("n_rows") > 1L, 1L).otherwise(0L))
              .as("n_multi_embedded"),
            sum(when(col("n_vecs") > 1L, 1L).otherwise(0L))
              .as("n_inconsistent"))
          .withColumn("consistency_bp",
            expr("(n_contents - n_inconsistent) * 10000 div n_contents"))
          .withColumn("verdict",
            when(col("n_inconsistent") > 0L, "skewed")
              .otherwise(lit("consistent")))
          .orderBy(col("source"))
      },
      Some("""WITH ez AS (
                SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                    AS v
                FROM embeddings),
              base AS (
                SELECT d.doc_id, d.source, d.text, e.v
                FROM documents d JOIN ez e ON e.vec_id = d.doc_id),
              corpus AS (
                SELECT doc_id, source, text, v FROM base
                UNION ALL
                SELECT doc_id + 10000000, source, text,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                    % 4 = 0
                  THEN list_transform(v, (x, i) ->
                    CASE WHEN i = 1 THEN x + 5 ELSE x END)
                  ELSE v END
                FROM base WHERE ('0x' || substr(md5(
                  CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 10 = 0),
              contents AS (
                SELECT source, md5(text) AS h, count(*) AS n_rows,
                  count(DISTINCT md5(array_to_string(
                    list_transform(v, x -> CAST(x AS VARCHAR)), ',')))
                    AS n_vecs
                FROM corpus GROUP BY source, md5(text)),
              census AS (
                SELECT source, count(*) AS n_contents,
                  sum(CASE WHEN n_rows > 1 THEN 1 ELSE 0 END)
                    AS n_multi_embedded,
                  sum(CASE WHEN n_vecs > 1 THEN 1 ELSE 0 END)
                    AS n_inconsistent
                FROM contents GROUP BY source)
              SELECT source, CAST(n_contents AS BIGINT) AS n_contents,
                CAST(n_multi_embedded AS BIGINT) AS n_multi_embedded,
                CAST(n_inconsistent AS BIGINT) AS n_inconsistent,
                CAST((n_contents - n_inconsistent) * 10000
                  // n_contents AS BIGINT) AS consistency_bp,
                CASE WHEN n_inconsistent > 0 THEN 'skewed'
                     ELSE 'consistent' END AS verdict
              FROM census
              ORDER BY source"""))
  )
}
