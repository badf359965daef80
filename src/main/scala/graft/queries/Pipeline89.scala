package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, tenth batch — watermark detection, topic outliers,
  * vocabulary-health, quality-confound forensics.
  */
object Pipeline89 {

  val entries: Seq[QEntry] = Seq(

    // Synthetic-text watermark scan (the Kirchenbauer green-list
    // signature): a watermarking generator biases token choice toward
    // a pseudorandom "green" half of the vocabulary, so the detector
    // is a per-source binomial test on green-token mass — model
    // output laundered into a training corpus lights up, human text
    // sits at the coin flip. Green = md5-parity of the token (the
    // cross-engine hash); the flag is the q419 integer binomial at
    // z > 6 ((2g − n)² > 36·n — token draws repeat words, so parity
    // is clustered and the honest variance is inflated; 6σ keeps
    // honest sources silent while the planted generator, which
    // re-suffixes red tokens and lands ~75% green, reads z ≈ 19).
    QEntry("q428_watermark_scan",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"), col("text"))
        val marked = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 7 === 5
        val green = (w: org.apache.spark.sql.Column) =>
          conv(substring(md5(w), 1, 2), 16, 10).cast("long") % 2 === 0
        val stream = docs.withColumn("marked", marked)
          .select(col("source"), col("marked"),
            explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
          .withColumn("w",
            when(col("marked") && !green(col("w")),
              concat(col("w"), lit("s"))).otherwise(col("w")))
        stream
          .withColumn("is_green", green(col("w")).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(col("is_green")).as("green_tokens"))
          .withColumn("green_bp",
            expr("green_tokens * 10000 div n_tokens"))
          .withColumn("verdict",
            when(expr("(2 * green_tokens - n_tokens) * " +
              "(2 * green_tokens - n_tokens) > 36 * n_tokens"),
              "watermarked").otherwise(lit("clean")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source, text,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 7 = 5
                    AS marked
                FROM documents),
              toks AS (
                SELECT source, marked,
                  unnest(string_split_regex(lower(text), '\s+')) AS w
                FROM docs),
              stream AS (
                SELECT source,
                  CASE WHEN marked AND ('0x' || substr(md5(w), 1, 2)
                      )::BIGINT % 2 != 0
                    THEN w || 's' ELSE w END AS w
                FROM toks WHERE length(w) > 0),
              c AS (
                SELECT source,
                  CASE WHEN ('0x' || substr(md5(w), 1, 2))::BIGINT
                    % 2 = 0 THEN 1 ELSE 0 END AS is_green
                FROM stream),
              g AS (
                SELECT source, count(*) AS n, sum(is_green) AS gr
                FROM c GROUP BY source)
              SELECT source, CAST(n AS BIGINT) AS n_tokens,
                CAST(gr AS BIGINT) AS green_tokens,
                CAST(gr * 10000 // n AS BIGINT) AS green_bp,
                CASE WHEN (2 * gr - n) * (2 * gr - n) > 36 * n
                  THEN 'watermarked' ELSE 'clean' END AS verdict
              FROM g
              ORDER BY source""")),

    // Semantic outlier quarantine: a doc whose embedding sits far from
    // its source's centroid is mis-filed (wrong-source ingestion, feed
    // mixing) — the quarantine list every topical mix depends on. The
    // fixture's embeddings are isotropic (no source geometry), so the
    // audit synthesizes the topical structure it defends: vectors are
    // shrunk 8× on the integer grid and biased +3000 on a per-source
    // dimension; mis-filed docs (draw % 9 = 4) carry ANOTHER source's
    // bias. Distance runs integer-exact at n² scale: n²·d² =
    // n²·||x||² − 2n·(x·S) + ||S||² with S the per-source component
    // sums (a 20-row broadcast dim) — zero pairwise work, translation
    // shift (all-positive grid) cancels in d². Gate: d² > 8e6.
    QEntry("q429_semantic_outliers",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"))
          .join(Tables.embeddings(s, d)
            .select(col("vec_id").as("doc_id"), col("embedding")),
            "doc_id")
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val srcDim = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 64
        val dim = when(draw % 9 === 4, (srcDim + 7) % 64)
          .otherwise(srcDim)
        val corpus = base
          .withColumn("bias_dim", dim)
          .withColumn("v", expr(
            "transform(" + // shrunk, shifted-positive, source-biased
              "arrays_zip(sequence(0, 63), " +
              "transform(embedding, x -> " +
              "CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT))), " +
              "p -> (p['1'] + 40000L) div 8 + " +
              "IF(p['0'] = bias_dim, 3000L, 0L))"))
          .localCheckpoint() // centroid sums + per-doc pass share it
        val sArr = corpus
          .select(col("source"), posexplode(col("v")))
          .groupBy(col("source"), col("pos"))
          .agg(sum(col("col")).as("sd"))
          .groupBy(col("source"))
          .agg(expr("transform(sort_array(collect_list(struct(pos, sd)))" +
            ", x -> x.sd)").as("s_vec"))
        val nPer = corpus.groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val dims = sArr.join(nPer, "source")
          .withColumn("s_norm2", graft.expressions.functions
            .dot_long(col("s_vec"), col("s_vec")))
        corpus.join(broadcast(dims), "source")
          .withColumn("x_norm2", graft.expressions.functions
            .dot_long(col("v"), col("v")))
          .withColumn("xs", graft.expressions.functions
            .dot_long(col("v"), col("s_vec")))
          .withColumn("n2d2",
            expr("n * n * x_norm2 - 2 * n * xs + s_norm2"))
          .withColumn("is_outlier",
            (col("n2d2") > lit(8000000L) * col("n") * col("n"))
              .cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("is_outlier")).as("outlier_docs"))
          .withColumn("outlier_bp",
            expr("outlier_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("outlier_docs") > 0L, "misfiled_docs")
              .otherwise(lit("topically_clean")))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT d.doc_id, d.source, e.embedding
                FROM documents d JOIN (SELECT vec_id AS doc_id,
                  embedding FROM embeddings) e USING (doc_id)),
              pv AS (
                SELECT doc_id, source,
                  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    ), 1, 4))::BIGINT % 9 = 4
                  THEN (('0x' || substr(md5(source), 1, 2))::BIGINT
                    % 64 + 7) % 64
                  ELSE ('0x' || substr(md5(source), 1, 2))::BIGINT % 64
                  END AS bias_dim,
                  list_transform(embedding, (x, i) ->
                    (CAST(round(CAST(x AS DOUBLE) * 10000) AS BIGINT)
                      + 40000) // 8 +
                    CASE WHEN i - 1 = (CASE WHEN ('0x' || substr(md5(
                      CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT % 9 = 4
                    THEN (('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 64 + 7) % 64
                    ELSE ('0x' || substr(md5(source), 1, 2))::BIGINT
                      % 64 END)
                    THEN 3000 ELSE 0 END) AS v
                FROM base),
              px AS (
                SELECT source, unnest(range(1, 65)) AS pos,
                  unnest(v) AS x
                FROM pv),
              sv AS (
                SELECT source, pos, sum(x) AS sd
                FROM px GROUP BY source, pos),
              sums AS (
                SELECT source, list(sd ORDER BY pos) AS s_vec
                FROM sv GROUP BY source),
              ns AS (
                SELECT source, count(*) AS n FROM pv GROUP BY source),
              enriched AS (
                SELECT p.source,
                  list_sum(list_transform(p.v, x -> x * x)) AS x_norm2,
                  list_sum(list_transform(range(1, 65), i ->
                    p.v[CAST(i AS INT)] * s.s_vec[CAST(i AS INT)]))
                    AS xs,
                  list_sum(list_transform(s.s_vec, x -> x * x))
                    AS s_norm2,
                  ns.n
                FROM pv p JOIN sums s USING (source)
                JOIN ns USING (source)),
              f AS (
                SELECT source,
                  CASE WHEN n * n * x_norm2 - 2 * n * xs + s_norm2
                    > 8000000 * n * n THEN 1 ELSE 0 END AS is_outlier
                FROM enriched),
              g AS (
                SELECT source, count(*) AS n_docs, sum(is_outlier)
                  AS outlier_docs
                FROM f GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(outlier_docs AS BIGINT) AS outlier_docs,
                CAST(outlier_docs * 10000 // n_docs AS BIGINT)
                  AS outlier_bp,
                CASE WHEN outlier_docs > 0 THEN 'misfiled_docs'
                  ELSE 'topically_clean' END AS verdict
              FROM g
              ORDER BY source""")),

    // Hapax-mass census: a healthy source's vocabulary has a Zipf tail,
    // but OCR damage / mojibake-split words / random IDs inflate the
    // share of TYPES seen exactly once far past it — the vocabulary-
    // health twin of q407 (which needs known artifact shapes; this
    // catches shape-free garbage). Per source: types, hapax types,
    // hapax share bp; garbage sources (md5 % 8 = 6) append 3 unique
    // gibberish tokens per doc. Two shuffles, both on (source, word)
    // then the source dim.
    QEntry("q430_hapax_census",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val garbage = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 8 === 6
        val corpus = docs.withColumn("text",
          when(garbage, concat(col("text"), lit(" zq"), col("doc_id"),
            lit("a qx"), col("doc_id"), lit("b xj"), col("doc_id"),
            lit("c"))).otherwise(col("text")))
        corpus
          .select(col("source"),
            explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("types"),
            sum(when(col("c") === 1L, 1L).otherwise(0L)).as("hapax"),
            sum(col("c")).as("tokens"))
          .withColumn("hapax_bp", expr("hapax * 10000 div types"))
          .withColumn("verdict",
            when(col("hapax_bp") > 4000L, "vocab_garbage")
              .otherwise(lit("healthy_tail")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                    % 8 = 6
                  THEN text || ' zq' || doc_id || 'a qx' || doc_id ||
                    'b xj' || doc_id || 'c'
                  ELSE text END AS text
                FROM documents),
              w AS (
                SELECT source,
                  unnest(string_split_regex(lower(text), '\s+')) AS w
                FROM docs),
              vc AS (
                SELECT source, w, count(*) AS c
                FROM w WHERE length(w) > 0 GROUP BY source, w),
              g AS (
                SELECT source, count(*) AS types,
                  sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax,
                  sum(c) AS tokens
                FROM vc GROUP BY source)
              SELECT source, CAST(types AS BIGINT) AS types,
                CAST(hapax AS BIGINT) AS hapax,
                CAST(tokens AS BIGINT) AS tokens,
                CAST(hapax * 10000 // types AS BIGINT) AS hapax_bp,
                CASE WHEN hapax * 10000 // types > 4000
                  THEN 'vocab_garbage' ELSE 'healthy_tail' END
                  AS verdict
              FROM g
              ORDER BY source""")),

    // Quality~length confound audit: when a source's quality score is
    // merely a proxy for document length, every "quality" floor is
    // secretly a length floor (and the mix silently optimizes for long
    // docs) — the control is per-source Pearson correlation between
    // score and token count, exact integer moments with doubles only
    // at the final sqrt/divide (the q388 convention, rounded to
    // milli). Confounded sources (md5 % 10 = 2) ship score := 100 ×
    // tokens (capped) → corr ≈ 1000 milli; honest sources score by
    // stopword share, which the fixture decorrelates from length.
    QEntry("q431_quality_length_confound",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("n_tok",
            size(split(lower(col("text")), "\\s+")).cast("long"))
        val confounded = conv(substring(md5(col("source")), 1, 2), 16,
          10).cast("long") % 10 === 2
        val stopScore = expr("CAST(size(filter(split(lower(text), " +
          "'\\\\s+'), w -> w IN ('the','a','of','and','to','in','is'," +
          "'on','for','with'))) AS BIGINT) * 10000 div " +
          "greatest(1L, n_tok)")
        val scored = docs.withColumn("score_bp",
          when(confounded, least(col("n_tok") * 100L, lit(9999L)))
            .otherwise(stopScore))
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("score_bp")).as("sx"),
            sum(col("n_tok")).as("sy"),
            sum(col("score_bp") * col("n_tok")).as("sxy"),
            sum(col("score_bp") * col("score_bp")).as("sxx"),
            sum(col("n_tok") * col("n_tok")).as("syy"))
          .withColumn("vx", expr("n * sxx - sx * sx"))
          .withColumn("vy", expr("n * syy - sy * sy"))
          .withColumn("corr_milli",
            when(col("vx") === 0L || col("vy") === 0L, 0L)
              .otherwise(expr(
                "CAST(round((n * sxy - sx * sy) * 1000.0 / " +
                  "(sqrt(CAST(vx AS DOUBLE)) * " +
                  "sqrt(CAST(vy AS DOUBLE)))) AS BIGINT)")))
          .withColumn("verdict",
            when(abs(col("corr_milli")) > 800L, "length_confounded")
              .otherwise(lit("independent")))
          .select(col("source"), col("n"), col("corr_milli"),
            col("verdict"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS n_tok,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) * 10000
                    // greatest(1, CAST(len(string_split_regex(
                      lower(text), '\s+')) AS BIGINT)) AS stop_bp,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 10 = 2
                    AS confounded
                FROM documents),
              scored AS (
                SELECT source, n_tok,
                  CASE WHEN confounded
                    THEN least(n_tok * 100, 9999) ELSE stop_bp END
                    AS score_bp
                FROM docs),
              g AS (
                SELECT source, count(*) AS n, sum(score_bp) AS sx,
                  sum(n_tok) AS sy, sum(score_bp * n_tok) AS sxy,
                  sum(score_bp * score_bp) AS sxx,
                  sum(n_tok * n_tok) AS syy
                FROM scored GROUP BY source),
              c AS (
                SELECT source, n,
                  CASE WHEN n * sxx - sx * sx = 0
                    OR n * syy - sy * sy = 0 THEN 0
                  ELSE CAST(round((n * sxy - sx * sy) * 1000.0 /
                    (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) *
                     sqrt(CAST(n * syy - sy * sy AS DOUBLE))))
                    AS BIGINT)
                  END AS corr_milli
                FROM g)
              SELECT source, CAST(n AS BIGINT) AS n, corr_milli,
                CASE WHEN abs(corr_milli) > 800
                  THEN 'length_confounded' ELSE 'independent' END
                  AS verdict
              FROM c
              ORDER BY source"""))
  )
}
