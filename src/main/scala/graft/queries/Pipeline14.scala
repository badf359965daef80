package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3 continuation: KMV directional containment, the
  * empirical-Bayes rate smoother, exact-integer anomaly flags over a
  * dense hour grid, rolling distinct actives, and temperature-scaled
  * mixture weights via exact integer sqrt. Conventions unchanged.
  */
object Pipeline14 {

  val entries: Seq[QEntry] = Seq(

    // Directional containment from merged KMV sketches: for each source
    // pair, C(A⊆B) ≈ |topk ∩ A ∩ B| / |topk ∩ A| over the k smallest of
    // the merged sketch — the ASYMMETRIC overlap question q197's
    // Jaccard can't answer (a small crawl fully mirrored inside a big
    // one scores ~100% here while its Jaccard stays tiny). Per-element
    // in_a/in_b flags survive the merge (vs q197's single shared bit).
    // Scale shape: identical to q197 — corpus touched once for the
    // ≤ k-row sketches, the pair stage dimension-sized.
    QEntry("q200_kmv_containment",
      (s, d) => {
        val k = 64
        val sh = Tables.documents(s, d)
          .select(col("source"), explode(
            graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 3, distinct = true)).as("g"))
          .distinct()
          .select(col("source"),
            expr("CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)")
              .as("h"))
          .distinct()
        val sk = sh.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("source")).orderBy(col("h"))))
          .filter(col("rn") <= k).select(col("source"), col("h"))
          .localCheckpoint() // dimension-sized: ≤ k rows per source
        val srcs = sk.select(col("source")).distinct()
        val m = sk.join(srcs.select(col("source").as("src_b")),
            col("source") < col("src_b"))
          .select(col("source").as("src_a"), col("src_b"), col("h"),
            lit(1L).as("in_a"), lit(0L).as("in_b"))
          .union(sk.join(srcs.select(col("source").as("src_a")),
            col("src_a") < col("source"))
            .select(col("src_a"), col("source").as("src_b"), col("h"),
              lit(0L).as("in_a"), lit(1L).as("in_b")))
          .groupBy(col("src_a"), col("src_b"), col("h"))
          .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
        m.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
          .filter(col("rn") <= k)
          .groupBy(col("src_a"), col("src_b"))
          .agg(sum(col("in_a")).as("na"), sum(col("in_b")).as("nb"),
            sum(col("in_a") * col("in_b")).as("shared"))
          .select(col("src_a"), col("src_b"), col("na"), col("nb"),
            col("shared"),
            expr("(shared * 10000) div na").as("cont_ab_bp"),
            expr("(shared * 10000) div nb").as("cont_ba_bp"))
          .orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH t AS (
                SELECT source, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              g AS (
                SELECT DISTINCT source,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS g
                FROM t WHERE len(toks) >= 3),
              h AS (
                SELECT DISTINCT source,
                  ('0x' || substr(md5(g), 1, 8))::BIGINT AS h
                FROM g),
              r AS (
                SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                FROM h),
              sk AS (SELECT source, h FROM r WHERE rn <= 64),
              srcs AS (SELECT DISTINCT source FROM sk),
              mm AS (
                SELECT src_a, src_b, h, max(in_a) AS in_a, max(in_b) AS in_b
                FROM (
                  SELECT a.source AS src_a, b.source AS src_b, a.h,
                    1 AS in_a, 0 AS in_b
                  FROM sk a JOIN srcs b ON a.source < b.source
                  UNION ALL
                  SELECT a.source, b.source, b.h, 0, 1
                  FROM sk b JOIN srcs a ON a.source < b.source)
                GROUP BY 1, 2, 3),
              rr AS (
                SELECT src_a, src_b, h, in_a, in_b,
                  row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
                    AS rn
                FROM mm),
              topk AS (
                SELECT src_a, src_b, sum(in_a) AS na, sum(in_b) AS nb,
                  sum(in_a * in_b) AS shared
                FROM rr WHERE rn <= 64 GROUP BY 1, 2)
              SELECT src_a, src_b, CAST(na AS BIGINT) AS na,
                CAST(nb AS BIGINT) AS nb, CAST(shared AS BIGINT) AS shared,
                CAST((shared * 10000) // na AS BIGINT) AS cont_ab_bp,
                CAST((shared * 10000) // nb AS BIGINT) AS cont_ba_bp
              FROM topk ORDER BY src_a, src_b""")),

    // Empirical-Bayes rate smoothing: per-user click-through over view
    // events, shrunk toward the corpus-wide prior with pseudo-count
    // strength s = 20 — posterior mean (c + s·p0)/(c + v + s) in exact
    // integer ppm, the estimator a ranking/quality pipeline uses so a
    // 1-view-1-click user doesn't outrank a 1000-view-400-click one.
    // The prior is ONE integer (global ppm) broadcast from a 1-row
    // frame; the per-user agg is the only corpus shuffle.
    QEntry("q201_eb_rates",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click"))
        val per = ev.groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("v"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("c"))
        val prior = ev.agg(
          sum(when(col("event_type") === "click", 1L).otherwise(0L))
            .as("cg"),
          count(lit(1)).as("tg"))
          .select(expr("(cg * 1000000) div tg").as("prior_ppm"))
        per.crossJoin(broadcast(prior))
          .select(col("user_id"), col("v"), col("c"),
            when(col("v") + col("c") > 0,
              expr("(c * 1000000) div (c + v)")).otherwise(0L)
              .as("raw_ppm"),
            expr("(c * 1000000 + 20 * prior_ppm) div (c + v + 20)")
              .as("smoothed_ppm"),
            col("prior_ppm"))
          .orderBy(col("user_id"))
      },
      Some("""WITH ev AS (
                SELECT user_id, event_type FROM events
                WHERE event_type IN ('view', 'click')),
              per AS (
                SELECT user_id,
                  sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS v,
                  sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c
                FROM ev GROUP BY user_id),
              prior AS (
                SELECT (sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                  END) * 1000000) // count(*) AS prior_ppm
                FROM ev)
              SELECT user_id, CAST(v AS BIGINT) AS v, CAST(c AS BIGINT) AS c,
                CAST(CASE WHEN c + v > 0 THEN (c * 1000000) // (c + v)
                     ELSE 0 END AS BIGINT) AS raw_ppm,
                CAST((c * 1000000 + 20 * prior_ppm) // (c + v + 20)
                  AS BIGINT) AS smoothed_ppm,
                CAST(prior_ppm AS BIGINT) AS prior_ppm
              FROM per, prior ORDER BY user_id""")),

    // Hourly anomaly flags per event type — EXACT integer 2σ test over
    // a DENSE hour grid (a missing hour is a zero-count hour, and
    // silence is exactly the anomaly an on-call wants paged for):
    // flag ⇔ (n·c − S)² > 4·(n·S2 − S²), the |c − μ| > 2σ population
    // test cleared of all division and sqrt — no rounding anywhere, so
    // the oracle replays bit-for-bit. One corpus agg to (type, hour)
    // counts; the grid, moments, and test are dimension-sized.
    QEntry("q202_hourly_anomaly",
      (s, d) => {
        val hourUs = 3600L * 1000000L
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            expr(s"(ts div 1000) div $hourUs").as("hr"))
        val cnt = ev.groupBy(col("event_type"), col("hr"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds the span AND the dense grid join
        val span = cnt.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
        val grid = cnt.select(col("event_type")).distinct()
          .crossJoin(broadcast(span))
          .select(col("event_type"),
            explode(expr("sequence(lo, hi)")).as("hr"))
          .join(cnt, Seq("event_type", "hr"), "left")
          .select(col("event_type"), col("hr"),
            coalesce(col("c"), lit(0L)).as("c"))
        val mom = grid.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("c")).as("s"),
            sum(col("c") * col("c")).as("s2"))
        grid.join(mom, "event_type")
          .filter(expr(
            "(n*c - s) * (n*c - s) > 4 * (n*s2 - s*s)"))
          .select(col("event_type"), col("hr"), col("c"),
            col("n"), col("s"), col("s2"),
            (col("c") * col("n") > col("s")).as("is_spike"))
          .orderBy(col("event_type"), col("hr"))
      },
      Some("""WITH ev AS (
                SELECT event_type,
                  epoch_us(ts) // 3600000000 AS hr
                FROM events),
              cnt AS (
                SELECT event_type, hr, count(*) AS c
                FROM ev GROUP BY 1, 2),
              span AS (SELECT min(hr) AS lo, max(hr) AS hi FROM cnt),
              grid AS (
                SELECT t.event_type, g.hr, coalesce(cnt.c, 0) AS c
                FROM (SELECT DISTINCT event_type FROM cnt) t
                CROSS JOIN (SELECT unnest(range(lo, hi + 1)) AS hr
                            FROM span) g
                LEFT JOIN cnt ON cnt.event_type = t.event_type
                  AND cnt.hr = g.hr),
              mom AS (
                SELECT event_type, count(*) AS n, sum(c) AS s,
                  sum(c * c) AS s2
                FROM grid GROUP BY event_type)
              SELECT g.event_type, CAST(g.hr AS BIGINT) AS hr,
                CAST(g.c AS BIGINT) AS c, CAST(n AS BIGINT) AS n,
                CAST(s AS BIGINT) AS s, CAST(s2 AS BIGINT) AS s2,
                g.c * n > s AS is_spike
              FROM grid g JOIN mom m ON m.event_type = g.event_type
              WHERE (n*g.c - s) * (n*g.c - s) > 4 * (n*s2 - s*s)
              ORDER BY g.event_type, g.hr""")),

    // Rolling 7-day distinct active users per calendar day (the WAU
    // curve, reported daily) — the (user, day) distinct frame explodes
    // into its ≤ 7 report-days and one keyed distinct-count agg does
    // the rest: no self-join over a date range, no window over the
    // user dimension; report days clipped to the observed span so
    // edge days don't read as drops. DAU rides along from the same
    // frame. Scale: corpus → (user, day) distinct once, ×7 fan-out on
    // the DISTINCT frame (not the raw events).
    QEntry("q203_rolling_active",
      (s, d) => {
        val dayUs = 86400L * 1000000L
        val ud = Tables.events(s, d)
          .select(col("user_id"),
            expr(s"(ts div 1000) div $dayUs").as("day"))
          .distinct()
          .localCheckpoint() // feeds span, DAU, and the WAU fan-out
        val span = ud.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
        val wau = ud.crossJoin(broadcast(span))
          .select(col("user_id"),
            explode(expr("sequence(day, least(day + 6, hi))"))
              .as("report_day"))
          .groupBy(col("report_day"))
          .agg(countDistinct(col("user_id")).as("wau"))
        val dau = ud.groupBy(col("day").as("report_day"))
          .agg(countDistinct(col("user_id")).as("dau"))
        wau.join(dau, Seq("report_day"), "left")
          .select(col("report_day"), coalesce(col("dau"), lit(0L)).as("dau"),
            col("wau"))
          .orderBy(col("report_day"))
      },
      Some("""WITH ud AS (
                SELECT DISTINCT user_id,
                  epoch_us(ts) // 86400000000 AS day
                FROM events),
              span AS (SELECT min(day) AS lo, max(day) AS hi FROM ud),
              wau AS (
                SELECT report_day, count(DISTINCT user_id) AS wau
                FROM (
                  SELECT user_id,
                    unnest(range(day, least(day + 7, hi + 1))) AS report_day
                  FROM ud, span)
                GROUP BY report_day),
              dau AS (
                SELECT day AS report_day, count(DISTINCT user_id) AS dau
                FROM ud GROUP BY day)
              SELECT w.report_day, coalesce(d.dau, 0) AS dau, w.wau
              FROM wau w LEFT JOIN dau d ON d.report_day = w.report_day
              ORDER BY w.report_day""")),

    // Temperature-scaled mixture weights (α = 1/2): w_s = isqrt(n_s)
    // — the up-weight-the-tail sampling temperature multilingual/
    // multi-source training uses, in EXACT integers: isqrt via
    // floor(sqrt(double)) + a ±1 correction step (sqrt is correctly
    // rounded so the double seed is off by at most 1; the correction
    // makes the result exact for any int64, not just below 2^52).
    // Outputs natural vs temperature share side by side in bp. One
    // corpus agg; everything else is the 20-row source dimension.
    QEntry("q204_mixture_temperature",
      (s, d) => {
        val n = Tables.documents(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("n"))
        val w = n.select(col("source"), col("n"),
            expr("CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT)").as("s0"))
          .select(col("source"), col("n"),
            expr("CASE WHEN (s0+1)*(s0+1) <= n THEN s0+1 " +
              "WHEN s0*s0 > n THEN s0-1 ELSE s0 END").as("w"))
        val tot = w.agg(sum(col("n")).as("tn"), sum(col("w")).as("tw"))
        w.crossJoin(broadcast(tot))
          .select(col("source"), col("n"), col("w"),
            expr("(n * 10000) div tn").as("natural_bp"),
            expr("(w * 10000) div tw").as("temperature_bp"))
          .orderBy(col("source"))
      },
      Some("""WITH n AS (
                SELECT source, count(*) AS n FROM documents GROUP BY source),
              w0 AS (
                SELECT source, n,
                  CAST(floor(sqrt(CAST(n AS DOUBLE))) AS BIGINT) AS s0
                FROM n),
              w AS (
                SELECT source, n,
                  CASE WHEN (s0+1)*(s0+1) <= n THEN s0+1
                       WHEN s0*s0 > n THEN s0-1 ELSE s0 END AS w
                FROM w0),
              tot AS (SELECT sum(n) AS tn, sum(w) AS tw FROM w)
              SELECT source, CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w,
                CAST((n * 10000) // tn AS BIGINT) AS natural_bp,
                CAST((w * 10000) // tw AS BIGINT) AS temperature_bp
              FROM w, tot ORDER BY source"""))
  )
}
