package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, fourteenth batch — corpus-law statistics completing
  * q361's Heaps forecast: the Zipf exponent, the Hill tail index of the
  * length distribution, and bigram-LM surprisal (the conditional tier
  * above q92's unigram quality score).
  */
object Pipeline66 {

  val entries: Seq[QEntry] = Seq(

    // Zipf exponent: word frequencies ranked by the two-pass
    // GlobalRank over the (−cnt, word) total order (no single-task
    // sort), the top-256 ranks fitted with integer least squares on
    // micro-nat (ln rank, ln cnt) points — q361's regression
    // discipline; the slope (≈ −1 on natural text) is the mixture-
    // health readout behind q305's coverage curve. Per-rank rows keep
    // the fitted cloud inspectable.
    QEntry("q362_zipf_fit",
      (s, d) => {
        val wc = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        val ranked = graft.operators.GlobalRank.rowNumber(
            wc, "rank", col("cnt").desc, col("w"))
          .filter(col("rank") <= 256)
          .select(col("rank"), col("w"), col("cnt"),
            expr("CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0) " +
              "AS BIGINT)").as("x"),
            expr("CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0) " +
              "AS BIGINT)").as("y"))
          .localCheckpoint() // 256 rows
        val slope = ranked
          .select(col("x").cast("decimal(38,0)").as("x"),
            col("y").cast("decimal(38,0)").as("y"))
          .agg(count(lit(1)).cast("decimal(38,0)").as("m"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("x") * col("y")).as("sxy"))
          .select(expr("CAST((m * sxy - sx * sy) * 1000000 div " +
            "(m * sxx - sx * sx) AS BIGINT)").as("zipf_slope_micro"))
        ranked.crossJoin(broadcast(slope))
          .select(col("rank").cast("long").as("rank"), col("w"),
            col("cnt"), col("x"), col("y"), col("zipf_slope_micro"))
          .orderBy(col("rank"))
      },
      Some("""WITH wc AS (
                SELECT w, count(*) AS cnt FROM (
                  SELECT unnest(string_split_regex(lower(text), '\s+'))
                    AS w
                  FROM documents)
                GROUP BY w),
              ranked AS (
                SELECT row_number() OVER (ORDER BY cnt DESC, w) AS rank,
                  w, cnt
                FROM wc QUALIFY rank <= 256),
              pts AS (
                SELECT rank, w, cnt,
                  CAST(round(ln(CAST(rank AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS x,
                  CAST(round(ln(CAST(cnt AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS y
                FROM ranked),
              sl AS (
                SELECT CAST((count(*) * sum(CAST(x AS HUGEINT) * y)
                    - CAST(sum(x) AS HUGEINT) * sum(y)) * 1000000
                  // (count(*) * sum(CAST(x AS HUGEINT) * x)
                    - CAST(sum(x) AS HUGEINT) * sum(x)) AS BIGINT)
                  AS zipf_slope_micro
                FROM pts)
              SELECT CAST(p.rank AS BIGINT) AS rank, p.w,
                CAST(p.cnt AS BIGINT) AS cnt, p.x, p.y,
                sl.zipf_slope_micro
              FROM pts p, sl
              ORDER BY p.rank""")),

    // Hill tail-index of the document-length distribution: α̂ =
    // k / Σ_{i≤k} ln(x_(i)/x_(k+1)) over the top k = 64 order
    // statistics — "how heavy is the length tail" (α ≤ 2 ⇒ infinite
    // variance: plan for skew). The top-65 lengths arrive via
    // TakeOrdered (bounded, no corpus sort); per-i log-ratios round
    // to micro-nats, α comes out of one exact integer division.
    QEntry("q363_hill_tail",
      (s, d) => {
        val lens = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("x"))
          .orderBy(col("x").desc, col("doc_id").asc).limit(65)
          .localCheckpoint() // 65 rows
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("x").desc, col("doc_id").asc)
        val idx = lens.withColumn("i", row_number().over(w).cast("long"))
        val xk1 = idx.filter(col("i") === 65)
          .select(col("x").as("xk1"))
        val top = idx.filter(col("i") <= 64)
          .crossJoin(broadcast(xk1))
          .select(col("i"), col("doc_id"), col("x"), col("xk1"),
            expr("CAST(round(ln(CAST(x AS DOUBLE) / xk1) * 1000000.0) " +
              "AS BIGINT)").as("lnr_micro"))
          .localCheckpoint() // 64 rows
        val alpha = top.agg(
          expr("64 * 1000000000000 div greatest(1L, sum(lnr_micro))")
            .as("alpha_micro"))
        top.crossJoin(broadcast(alpha))
          .select(col("i"), col("doc_id"), col("x"), col("xk1"),
            col("lnr_micro"), col("alpha_micro"))
          .orderBy(col("i"))
      },
      Some("""WITH lens AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS x
                FROM documents
                ORDER BY x DESC, doc_id LIMIT 65),
              idx AS (
                SELECT doc_id, x,
                  row_number() OVER (ORDER BY x DESC, doc_id) AS i
                FROM lens),
              xk1 AS (SELECT x AS xk1 FROM idx WHERE i = 65),
              top AS (
                SELECT i, doc_id, x, xk1.xk1,
                  CAST(round(ln(CAST(x AS DOUBLE) / xk1.xk1)
                    * 1000000.0) AS BIGINT) AS lnr_micro
                FROM idx, xk1 WHERE i <= 64),
              al AS (
                SELECT 64 * 1000000000000 //
                  greatest(1, sum(lnr_micro)) AS alpha_micro
                FROM top)
              SELECT CAST(t.i AS BIGINT) AS i, t.doc_id, t.x, t.xk1,
                t.lnr_micro, CAST(al.alpha_micro AS BIGINT)
                  AS alpha_micro
              FROM top t, al
              ORDER BY t.i""")),

    // Bigram-LM surprisal per doc: mean −ln p(w₂|w₁) in micro-nats
    // under the corpus bigram model (p = c_xy / c_x·, with c_x· the
    // predecessor marginal) — the conditional tier above q92's
    // unigram score: template spam scores LOW (predictable
    // continuations), gibberish HIGH. One shingling pass builds both
    // the count dim and the per-doc instances; per-term rounding
    // before the doc mean keeps the aggregation order-independent.
    QEntry("q364_bigram_surprisal",
      (s, d) => {
        // bigrams and predecessors shuffle as 60-bit md5 prefixes (the
        // q306 discipline — two longs instead of strings; the string
        // formulation ran 36 s at the 100× replica); the predecessor
        // marginal c_x· counts straight off the instance frame.
        val inst = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 2, distinct = false))
              .as("bg"))
          .select(col("doc_id"),
            conv(substring(md5(col("bg")), 1, 15), 16, 10).cast("long")
              .as("hbg"),
            conv(substring(md5(substring_index(col("bg"), " ", 1)),
              1, 15), 16, 10).cast("long").as("hw1"))
          .localCheckpoint() // (doc, bigram, predecessor) instances
        val cxy = inst.groupBy(col("hbg")).agg(count(lit(1)).as("c_xy"))
        val cx = inst.groupBy(col("hw1")).agg(count(lit(1)).as("c_x"))
        val scored = inst.join(cxy, "hbg").join(cx, "hw1")
          .select(col("doc_id"),
            expr("CAST(round(ln(CAST(c_x AS DOUBLE) / c_xy) " +
              "* 1000000.0) AS BIGINT)").as("s_micro"))
        val perDoc = scored.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_bigrams"),
            expr("sum(s_micro) div count(1)").as("mean_surprisal_micro"))
        Tables.documents(s, d).select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
            coalesce(col("mean_surprisal_micro"), lit(0L))
              .as("mean_surprisal_micro"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '\s+') AS w
                FROM documents),
              inst AS (
                SELECT doc_id,
                  ('0x' || substr(md5(w[i] || ' ' || w[i+1]), 1, 15))
                    ::BIGINT AS hbg,
                  ('0x' || substr(md5(w[i]), 1, 15))::BIGINT AS hw1
                FROM t, unnest(range(1, len(w))) AS u(i)
                WHERE len(w) >= 2),
              cxy AS (SELECT hbg, count(*) AS c_xy
                      FROM inst GROUP BY hbg),
              cx AS (SELECT hw1, count(*) AS c_x
                     FROM inst GROUP BY hw1),
              scored AS (
                SELECT i.doc_id,
                  CAST(round(ln(CAST(cx.c_x AS DOUBLE) / c.c_xy)
                    * 1000000.0) AS BIGINT) AS s_micro
                FROM inst i JOIN cxy c USING (hbg)
                JOIN cx USING (hw1)),
              per AS (
                SELECT doc_id, count(*) AS n_bigrams,
                  sum(s_micro) // count(*) AS mean_surprisal_micro
                FROM scored GROUP BY doc_id)
              SELECT d.doc_id,
                CAST(coalesce(p.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                CAST(coalesce(p.mean_surprisal_micro, 0) AS BIGINT)
                  AS mean_surprisal_micro
              FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id
              ORDER BY d.doc_id"""))
  )
}
