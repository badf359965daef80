package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, third batch — preference modeling and weighted
  * sampling: the two curation primitives an RLHF-era data pipeline
  * adds on top of dedup/quality (pairwise preference strengths for
  * arena-style data, and importance sampling with a Horvitz–Thompson
  * readout for quality-weighted corpus selection).
  */
object Pipeline55 {

  val entries: Seq[QEntry] = Seq(

    // Bradley–Terry preference strengths in exact integer arithmetic:
    // items = order priorities, "games" = days, and priority i beats j
    // on a day when it has strictly more orders (ties = no game) — the
    // daily-tournament construction. Strengths start uniform at 1e6
    // micro-units; three minorization rounds
    //   s_i' = W_i·1e6 div Σ_j n_ij·1e6 div greatest(1, s_i + s_j)
    // with truncating int64 division, so the DuckDB oracle replays the
    // fit bit-for-bit (the q178/q303 iterative-integer discipline; no
    // libm, no floats). Everything after the one corpus scan runs on
    // the 5-item / ≤20-pair dimension — iteration cost is independent
    // of corpus size, the 100 TB contract for preference fitting.
    QEntry("q337_bradley_terry",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 " +
              "00:00:00', o_orderdate) div 86400000000").as("day"),
            col("o_orderpriority").as("item"))
          .groupBy(col("day"), col("item"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // the one corpus reduction; feeds pair wins
        val games = daily.alias("a")
          .join(daily.select(col("day"), col("item").as("j"),
            col("c").as("cj")).alias("b"), "day")
          .filter(col("item") =!= col("j"))
          .groupBy(col("item"), col("j"))
          .agg(sum(lit(1)).as("n_games"),
            sum((col("c") > col("cj")).cast("long")).as("wins"))
          .filter(col("n_games") > 0)
          .localCheckpoint() // ≤20-row pair dim, drives every round
        val items = games.select(col("item")).distinct()
          .localCheckpoint()
        val totalWins = games.groupBy(col("item"))
          .agg(sum(col("wins")).as("w_total"))
        var str = items.select(col("item"), lit(1000000L).as("s"))
          .localCheckpoint()
        for (_ <- 1 to 3) {
          val denom = games
            .join(str.select(col("item"), col("s").as("si")), "item")
            .join(str.select(col("item").as("j"), col("s").as("sj")), "j")
            .groupBy(col("item"))
            .agg(sum(expr("n_games * 1000000 div greatest(1L, si + sj)"))
              .as("den"))
          str = items
            .join(totalWins, "item")
            .join(denom, "item")
            .select(col("item"),
              expr("w_total * 1000000 div greatest(1L, den)").as("s"))
            .localCheckpoint()
        }
        items.join(totalWins, "item")
          .join(games.groupBy(col("item"))
            .agg(sum(col("n_games")).as("n_games")), "item")
          .join(str, "item")
          .select(col("item"), col("n_games"), col("w_total"),
            col("s").as("strength_micro"))
          .orderBy(col("item"))
      },
      Some("""WITH daily AS (
                SELECT epoch_us(o_orderdate) // 86400000000 AS day,
                  o_orderpriority AS item, count(*) AS c
                FROM orders GROUP BY 1, 2),
              games AS (
                SELECT a.item, b.item AS j,
                  count(*) AS n_games,
                  sum(CASE WHEN a.c > b.c THEN 1 ELSE 0 END) AS wins
                FROM daily a JOIN daily b
                  ON a.day = b.day AND a.item <> b.item
                GROUP BY a.item, b.item),
              items AS (SELECT DISTINCT item FROM games),
              tw AS (SELECT item, sum(wins) AS w_total
                     FROM games GROUP BY item),
              s0 AS (SELECT item, CAST(1000000 AS BIGINT) AS s FROM items),
              d1 AS (
                SELECT g.item,
                  sum(g.n_games * 1000000 //
                    greatest(1, si.s + sj.s)) AS den
                FROM games g
                JOIN s0 si ON si.item = g.item
                JOIN s0 sj ON sj.item = g.j
                GROUP BY g.item),
              s1 AS (
                SELECT i.item,
                  CAST(tw.w_total * 1000000 // greatest(1, d1.den)
                    AS BIGINT) AS s
                FROM items i JOIN tw USING (item) JOIN d1 USING (item)),
              d2 AS (
                SELECT g.item,
                  sum(g.n_games * 1000000 //
                    greatest(1, si.s + sj.s)) AS den
                FROM games g
                JOIN s1 si ON si.item = g.item
                JOIN s1 sj ON sj.item = g.j
                GROUP BY g.item),
              s2 AS (
                SELECT i.item,
                  CAST(tw.w_total * 1000000 // greatest(1, d2.den)
                    AS BIGINT) AS s
                FROM items i JOIN tw USING (item) JOIN d2 USING (item)),
              d3 AS (
                SELECT g.item,
                  sum(g.n_games * 1000000 //
                    greatest(1, si.s + sj.s)) AS den
                FROM games g
                JOIN s2 si ON si.item = g.item
                JOIN s2 sj ON sj.item = g.j
                GROUP BY g.item),
              s3 AS (
                SELECT i.item,
                  CAST(tw.w_total * 1000000 // greatest(1, d3.den)
                    AS BIGINT) AS s
                FROM items i JOIN tw USING (item) JOIN d3 USING (item)),
              ng AS (SELECT item, sum(n_games) AS n_games
                     FROM games GROUP BY item)
              SELECT i.item, CAST(ng.n_games AS BIGINT) AS n_games,
                CAST(tw.w_total AS BIGINT) AS w_total,
                s3.s AS strength_micro
              FROM items i JOIN ng USING (item) JOIN tw USING (item)
              JOIN s3 USING (item)
              ORDER BY i.item""")),

    // Importance sampling with a Horvitz–Thompson readout: per doc an
    // inclusion probability proportional to its token count (clamped
    // to [5000, 1e6] ppm — length-weighted selection, the "sample long
    // docs more" curation knob), deterministic md5 coin (both engines
    // draw the SAME sample — the estimate is hash-compared exactly,
    // not tolerance-boxed like q65), HT estimator Σ tok·1e6 div p over
    // the sample vs the true total, error in basis points per source.
    // One scan to the per-source aggregate; no corpus-grain shuffle
    // beyond the groupBy.
    QEntry("q338_importance_sample",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("source"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"),
            expr("CAST(conv(substring(md5(concat('ht:', " +
              "CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT) " +
              "% 1000000").as("u"))
          .withColumn("p_ppm",
            expr("least(1000000L, greatest(5000L, tok * 5000))"))
        docs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("true_tokens"),
            sum((col("u") < col("p_ppm")).cast("long")).as("n_sampled"),
            sum(when(col("u") < col("p_ppm"),
              expr("tok * 1000000 div p_ppm")).otherwise(lit(0L)))
              .as("ht_tokens"))
          .withColumn("err_bp",
            expr("abs(ht_tokens - true_tokens) * 10000 div " +
              "greatest(1L, true_tokens)"))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok,
                  CAST(('0x' || substr(md5('ht:' ||
                    CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000000
                    AS BIGINT) AS u
                FROM documents),
              w AS (
                SELECT source, tok, u,
                  least(1000000, greatest(5000, tok * 5000)) AS p_ppm
                FROM docs)
              SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS true_tokens,
                CAST(sum(CASE WHEN u < p_ppm THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_sampled,
                CAST(sum(CASE WHEN u < p_ppm
                  THEN tok * 1000000 // p_ppm ELSE 0 END)
                  AS BIGINT) AS ht_tokens,
                CAST(abs(sum(CASE WHEN u < p_ppm
                    THEN tok * 1000000 // p_ppm ELSE 0 END) - sum(tok))
                  * 10000 // greatest(1, sum(tok)) AS BIGINT) AS err_bp
              FROM w GROUP BY source
              ORDER BY source"""))
  )
}
