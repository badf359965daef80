package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 pack, third batch — mixture planning: the Chinchilla-style
  * epoch-allocation waterfill and the quality-threshold retention
  * curve (the data-ablation planner beside q355's dedup sweep).
  */
object Pipeline76 {

  val entries: Seq[QEntry] = Seq(

    // Token-budget waterfill: allocate a training budget of
    // 2·Σtokens milli-token units across sources, each capped at
    // cap_milli epochs (md5-derived quality cap ∈ {1,2,3,4} epochs —
    // a high-quality source may be repeated more). The exact
    // water level λ solves Σ min(cap_s, λ)·t_s = budget: sources
    // sorted by cap, the one valid breakpoint segment located by
    // prefix sums (candidate λ_j = remaining budget over the suffix
    // token mass once every source below j sits at cap; valid iff
    // prev_cap ≤ λ_j ≤ cap_j; all-capped fallback when the budget
    // exceeds Σ cap·t). Pure integer arithmetic on the ≤ |sources|
    // dimension — the plan a 100 TB mixture run is scheduled from.
    // Truncating division under-allocates by < suffix-tokens milli —
    // the safe side of the budget.
    QEntry("q384_token_budget_waterfill",
      (s, d) => {
        val tok = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(sum(graft.pipeline.TextAnalysis.tokenCount(col("text"))
            .cast("long")).as("t"))
          .withColumn("cap_milli",
            lit(1000L) + lit(1000L) *
              (conv(substring(md5(col("source")), 1, 2), 16, 10)
                .cast("long") % 4))
        val cap = graft.pipeline.Stats
          .boundedDim(tok, "q384 source dim", 100000L)
          .localCheckpoint() // source dim: ranks + totals + output spine
        val tot = cap.agg(sum(col("t")).as("total_t"),
          (sum(col("t")) * 2000L).as("budget"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("cap_milli"), col("source"))
        val wcum = w.rowsBetween(org.apache.spark.sql.expressions
          .Window.unboundedPreceding, 0)
        val cand = cap
          .withColumn("k", row_number().over(w))
          .withColumn("cumct", sum(col("cap_milli") * col("t")).over(wcum))
          .withColumn("cumt", sum(col("t")).over(wcum))
          .withColumn("prevcap",
            coalesce(lag(col("cap_milli"), 1).over(w), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("lam",
            expr("(budget - (cumct - cap_milli * t)) div " +
              "(total_t - (cumt - t))"))
        val validLam = cand
          .filter(col("prevcap") <= col("lam") &&
            col("lam") <= col("cap_milli"))
          .orderBy(col("k")).limit(1)
          .select(col("lam"), lit(0L).as("pri"))
        val fallback = cap.agg(max(col("cap_milli")).as("lam"))
          .select(col("lam"), lit(1L).as("pri"))
        val lamf = validLam.union(fallback)
          .orderBy(col("pri")).limit(1).select(col("lam"))
        cap.crossJoin(broadcast(lamf))
          .select(col("source"), col("t").as("tokens"), col("cap_milli"),
            col("lam").as("lambda_milli"),
            least(col("cap_milli"), col("lam")).as("alloc_milli"))
          .withColumn("alloc_tokens",
            expr("alloc_milli * tokens div 1000"))
          .withColumn("capped",
            (col("cap_milli") <= col("lambda_milli")).cast("long"))
          .orderBy(col("source"))
      },
      Some("""WITH tok AS (
                SELECT source,
                  sum(CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT)) AS t
                FROM documents GROUP BY source),
              cap AS (
                SELECT source, t,
                  1000 + 1000 * (('0x' || substr(md5(source), 1, 2))
                    ::BIGINT % 4) AS cap_milli
                FROM tok),
              tot AS (
                SELECT sum(t) AS total_t, 2000 * sum(t) AS budget
                FROM cap),
              r AS (
                SELECT source, t, cap_milli,
                  row_number() OVER (ORDER BY cap_milli, source) AS k,
                  sum(cap_milli * t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumct,
                  sum(t) OVER (ORDER BY cap_milli, source
                    ROWS UNBOUNDED PRECEDING) AS cumt,
                  coalesce(lag(cap_milli, 1) OVER (ORDER BY cap_milli,
                    source), 0) AS prevcap
                FROM cap),
              cand AS (
                SELECT k, prevcap, cap_milli,
                  (tot.budget - (cumct - cap_milli * t))
                    // (tot.total_t - (cumt - t)) AS lam
                FROM r, tot),
              lamf AS (
                SELECT coalesce(
                  (SELECT lam FROM cand
                   WHERE prevcap <= lam AND lam <= cap_milli
                   ORDER BY k LIMIT 1),
                  (SELECT max(cap_milli) FROM cap)) AS lam)
              SELECT source, CAST(t AS BIGINT) AS tokens,
                CAST(cap_milli AS BIGINT) AS cap_milli,
                CAST(lam AS BIGINT) AS lambda_milli,
                CAST(least(cap_milli, lam) AS BIGINT) AS alloc_milli,
                CAST(least(cap_milli, lam) * t // 1000 AS BIGINT)
                  AS alloc_tokens,
                CASE WHEN cap_milli <= lam THEN 1 ELSE 0 END AS capped
              FROM cap, lamf
              ORDER BY source""")),

    // Quality-threshold retention curve: the ablation planner for the
    // quality filter (q355's honest shape on the curation axis) —
    // score every doc once (stopword density in bp, the classic
    // fluency proxy from the q84 facet family), reduce to the
    // (source, score-bucket) dimension, and read the whole threshold
    // sweep off ONE suffix-cumulative window over that bounded dim:
    // per (source, threshold ∈ 0, 250, …, 2250) the docs and tokens
    // retained at score ≥ threshold, with shares in bp. The corpus is
    // scanned once; the sweep costs |sources| × 41 bucket rows.
    QEntry("q385_quality_retention_curve",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("source"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("toks"),
            (graft.pipeline.TextAnalysis.stopwordCount(col("text"))
              .cast("long") * 10000L).as("stop10k"))
          .withColumn("score_bp",
            expr("stop10k div greatest(1L, toks)"))
          .withColumn("bucket",
            least(expr("score_bp div 250"), lit(40L)))
        val bdim = scored.groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_toks"))
          .localCheckpoint() // bounded (source × ≤41) dim
        val totals = bdim.groupBy(col("source"))
          .agg(sum(col("n_docs")).as("td"), sum(col("n_toks")).as("tt"))
        val wSuf = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("bucket"))
          .rowsBetween(0, org.apache.spark.sql.expressions
            .Window.unboundedFollowing)
        val suf = bdim
          .withColumn("docs_kept", sum(col("n_docs")).over(wSuf))
          .withColumn("toks_kept", sum(col("n_toks")).over(wSuf))
        // dense threshold grid 0..9 → thr = step·250; kept-at-thr =
        // suffix sum at the smallest bucket ≥ step (buckets are
        // sparse, so join each step to the first present bucket ≥ it)
        val steps = s.range(0, 10)
          .select(col("id").as("step"), (col("id") * 250L).as("thr_bp"))
        val curve = totals.crossJoin(broadcast(steps))
          .join(suf, Seq("source"), "left")
          .filter(col("bucket") >= col("step"))
          .groupBy(col("source"), col("thr_bp"), col("td"), col("tt"))
          .agg(max(struct((-col("bucket")).as("nb"), col("docs_kept"),
            col("toks_kept"))).as("first"))
          .select(col("source"), col("thr_bp"),
            col("first.docs_kept").as("docs_kept"),
            col("first.toks_kept").as("toks_kept"),
            col("td"), col("tt"))
        totals.crossJoin(broadcast(steps)).select(col("source"),
            col("thr_bp"), col("td"), col("tt"))
          .join(curve, Seq("source", "thr_bp", "td", "tt"), "left")
          .select(col("source"), col("thr_bp"),
            coalesce(col("docs_kept"), lit(0L)).as("docs_kept"),
            coalesce(col("toks_kept"), lit(0L)).as("toks_kept"),
            expr("coalesce(docs_kept, 0L) * 10000 div td")
              .as("docs_share_bp"),
            expr("coalesce(toks_kept, 0L) * 10000 div tt")
              .as("toks_share_bp"))
          .orderBy(col("source"), col("thr_bp"))
      },
      Some("""WITH scored AS (
                SELECT source,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS toks,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)])
                    AS BIGINT) * 10000 AS stop10k
                FROM documents),
              b AS (
                SELECT source,
                  least((stop10k // greatest(1, toks)) // 250, 40)
                    AS bucket,
                  count(*) AS n_docs, sum(toks) AS n_toks
                FROM scored GROUP BY 1, 2),
              totals AS (
                SELECT source, sum(n_docs) AS td, sum(n_toks) AS tt
                FROM b GROUP BY source),
              suf AS (
                SELECT source, bucket,
                  sum(n_docs) OVER (PARTITION BY source ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS docs_kept,
                  sum(n_toks) OVER (PARTITION BY source ORDER BY bucket
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS toks_kept
                FROM b),
              steps AS (
                SELECT unnest(generate_series(0, 9)) AS step),
              hit AS (
                SELECT t.source, st.step * 250 AS thr_bp, t.td, t.tt,
                  arg_min(s.docs_kept, s.bucket) AS docs_kept,
                  arg_min(s.toks_kept, s.bucket) AS toks_kept
                FROM totals t
                CROSS JOIN steps st
                LEFT JOIN suf s ON s.source = t.source
                  AND s.bucket >= st.step
                GROUP BY t.source, st.step, t.td, t.tt)
              SELECT source, CAST(thr_bp AS BIGINT) AS thr_bp,
                CAST(coalesce(docs_kept, 0) AS BIGINT) AS docs_kept,
                CAST(coalesce(toks_kept, 0) AS BIGINT) AS toks_kept,
                CAST(coalesce(docs_kept, 0) * 10000 // td AS BIGINT)
                  AS docs_share_bp,
                CAST(coalesce(toks_kept, 0) * 10000 // tt AS BIGINT)
                  AS toks_share_bp
              FROM hit
              ORDER BY source, thr_bp"""))
  )
}
