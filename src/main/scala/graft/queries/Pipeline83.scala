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
              ORDER BY source""")),

    // Source novelty census: which source contributes content NOTHING
    // else has — the marginal-value question behind every mix/budget
    // decision (a source can be huge, clean, and still worthless if
    // its n-grams all exist elsewhere). Type-level: a source's novelty
    // = share of its distinct 8-gram types that occur in NO other
    // source. Shape: one positional-shingle projection to (gram, source)
    // type grain, one gram-grain census (n_sources per gram), one join
    // back at gram grain, one source rollup — two shuffles, both on
    // 8-byte gram digests, never on text. Corpus: the q386 mirror
    // topology (md5-drawn ~1/5 of each source re-published as
    // mirror_<source>, the nested ~1/25 syndicated into one agg feed)
    // — a MIRROR source's grams all exist in its original, so mirrors
    // read ~0 novelty ('redundant', the census's reason to exist)
    // while originals stay high; the agg feed sits at 0 twice over.
    QEntry("q405_source_novelty",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 5 === 0)
            .select(concat(lit("mirror_"), col("source")).as("source"),
              (col("doc_id") + 10000000L).as("doc_id"), col("text")))
          .union(base.filter(draw % 25 === 0)
            .select(lit("agg").as("source"),
              (col("doc_id") + 20000000L).as("doc_id"), col("text")))
        val st = corpus
          .select(col("source"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 8, distinct = true))
              .as("gram"))
          .select(col("source"),
            conv(substring(md5(col("gram")), 1, 15), 16, 10)
              .cast("long").as("g"))
          .distinct()
          .localCheckpoint() // gram census + join-back sides
        val gdim = st.groupBy(col("g"))
          .agg(count(lit(1)).as("n_sources"))
        st.join(gdim, "g")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("gram_types"),
            sum(when(col("n_sources") === 1L, 1L).otherwise(0L))
              .as("unique_types"))
          .withColumn("novelty_bp",
            expr("unique_types * 10000 div gram_types"))
          .withColumn("verdict",
            when(col("novelty_bp") < 500L, "redundant")
              .otherwise(lit("novel")))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT source, doc_id, text FROM documents),
              corpus AS (
                SELECT source, doc_id, text FROM base
                UNION ALL
                SELECT 'mirror_' || source, doc_id + 10000000, text
                FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 5 = 0
                UNION ALL
                SELECT 'agg', doc_id + 20000000, text FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 25 = 0),
              t AS (
                SELECT source, doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM corpus),
              st AS (
                SELECT DISTINCT source,
                  ('0x' || substr(md5(array_to_string(
                    toks[p.p + 1:p.p + 8], ' ')), 1, 15))::BIGINT AS g
                FROM t,
                  (SELECT unnest(generate_series(0, 511)) AS p) p
                WHERE p.p <= len(toks) - 8),
              gdim AS (
                SELECT g, count(*) AS n_sources FROM st GROUP BY g),
              census AS (
                SELECT st.source, count(*) AS gram_types,
                  sum(CASE WHEN gd.n_sources = 1 THEN 1 ELSE 0 END)
                    AS unique_types
                FROM st JOIN gdim gd USING (g)
                GROUP BY st.source)
              SELECT source, CAST(gram_types AS BIGINT) AS gram_types,
                CAST(unique_types AS BIGINT) AS unique_types,
                CAST(unique_types * 10000 // gram_types AS BIGINT)
                  AS novelty_bp,
                CASE WHEN unique_types * 10000 // gram_types < 500
                     THEN 'redundant' ELSE 'novel' END AS verdict
              FROM census
              ORDER BY source"""))
  )
}
