package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, fourth pack: cooperative-game channel
  * attribution (exact Shapley over the observed-subset value function),
  * the Welch two-sample readout that closes the q235 experimentation
  * loop, a seasonal-naive forecast backtest (MASE), and corpus
  * concentration metrics (entropy / effective sources / HHI / Gini)
  * for the dataset card. Conventions unchanged.
  */
object Pipeline24 {

  val entries: Seq[QEntry] = Seq(

    // Exact Shapley channel attribution (the set-aggregate formulation:
    // Zhao et al. 2018): each user's touch set = the event types seen
    // in the 12-hour lookback window before their conversion (before
    // the corpus horizon for non-converters), encoded as a 4-bit mask
    // over {click, error, signup, view}; v(S) = conversion rate (ppm)
    // of users with exactly
    // mask S, unobserved masks contribute 0. phi_i = sum over the 8
    // subsets S not containing i of w(|S|)·(v(S u {i}) - v(S)), with
    // 4!·w pre-scaled to the integers {6, 2, 2, 6} so the whole
    // computation is integer arithmetic on a 16-row subset dimension.
    // Scale shape: one corpus pass to per-user (mask, conv) partials,
    // one keyed agg onto <= 16 masks; the Shapley sum is a 4x16
    // dimension join — corpus-size-independent, like q233's MM loop.
    QEntry("q243_shapley_attribution",
      (s, d) => {
        val ev = Tables.events(s, d)
        // conversion = first HIGH-VALUE purchase (>= $80, the q236
        // event) — the plain-purchase rate is 100% on this fixture,
        // which would zero every marginal contribution
        val firstP = ev.filter(col("event_type") === "purchase" &&
            expr("CAST(round(value * 100) AS BIGINT)") >= 8000)
          .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
        // 12-hour lookback window before the conversion (corpus horizon
        // for non-converters) — an UNWINDOWED touch set saturates to
        // mask 15 for every user on this fixture, collapsing all
        // marginals to the same value; the windowed predicate lives
        // INSIDE the aggregation so every user is censused
        val horizon = ev.agg(max(col("ts")).as("h"))
        val winNs = 12L * 3600L * 1000000000L
        val anchor = coalesce(col("tp"), col("h"))
        val pre = col("ts") >= anchor - winNs && col("ts") < anchor
        val masks = ev.join(firstP, Seq("user_id"), "left")
          .crossJoin(broadcast(horizon))
          .groupBy(col("user_id"))
          .agg(
            max(when(col("event_type") === "click" && pre, 1L)
              .otherwise(0L)).as("b0"),
            max(when(col("event_type") === "error" && pre, 1L)
              .otherwise(0L)).as("b1"),
            max(when(col("event_type") === "signup" && pre, 1L)
              .otherwise(0L)).as("b2"),
            max(when(col("event_type") === "view" && pre, 1L)
              .otherwise(0L)).as("b3"),
            max(when(col("tp").isNotNull, 1L).otherwise(0L)).as("conv"))
          .select(
            (col("b0") + col("b1") * 2 + col("b2") * 4 + col("b3") * 8)
              .as("mask"), col("conv"))
        val v = masks.groupBy(col("mask"))
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
          .select(col("mask"), expr("(c * 1000000) div n").as("v_ppm"))
        val subsets = s.range(16).select(col("id").as("s"))
        val channels = s.range(1)
          .select(explode(array(
            struct(lit("click").as("channel"), lit(1L).as("bit")),
            struct(lit("error").as("channel"), lit(2L).as("bit")),
            struct(lit("signup").as("channel"), lit(4L).as("bit")),
            struct(lit("view").as("channel"), lit(8L).as("bit"))))
            .as("ch"))
          .select(col("ch.channel").as("channel"), col("ch.bit").as("bit"))
        val terms = channels.crossJoin(subsets)
          .filter(expr("(s & bit) = 0"))
          .withColumn("w24", expr(
            "CASE bit_count(s) WHEN 0 THEN 6L WHEN 1 THEN 2L " +
              "WHEN 2 THEN 2L ELSE 6L END"))
          .join(v.select(col("mask").as("s"), col("v_ppm").as("v0")),
            Seq("s"), "left")
          .join(v.select(col("mask").as("s1"), col("v_ppm").as("v1")),
            expr("s1 = s + bit"), "left")
        terms.groupBy(col("channel"))
          .agg(sum(col("w24") *
            (coalesce(col("v1"), lit(0L)) - coalesce(col("v0"), lit(0L))))
            .as("phi24"))
          .select(col("channel"), expr("phi24 div 24").as("phi_ppm"))
          .orderBy(col("phi_ppm").desc, col("channel"))
      },
      Some("""WITH fp AS (
                SELECT user_id, min(epoch_us(ts)) AS tp
                FROM events WHERE event_type = 'purchase'
                  AND CAST(round(value * 100) AS BIGINT) >= 8000
                GROUP BY user_id),
              hz AS (SELECT max(epoch_us(ts)) AS h FROM events),
              mk AS (
                SELECT e.user_id,
                  max(CASE WHEN e.event_type = 'click' AND
                    epoch_us(e.ts) >= coalesce(fp.tp, hz.h) - 43200000000
                    AND epoch_us(e.ts) < coalesce(fp.tp, hz.h)
                    THEN 1 ELSE 0 END) +
                  max(CASE WHEN e.event_type = 'error' AND
                    epoch_us(e.ts) >= coalesce(fp.tp, hz.h) - 43200000000
                    AND epoch_us(e.ts) < coalesce(fp.tp, hz.h)
                    THEN 2 ELSE 0 END) +
                  max(CASE WHEN e.event_type = 'signup' AND
                    epoch_us(e.ts) >= coalesce(fp.tp, hz.h) - 43200000000
                    AND epoch_us(e.ts) < coalesce(fp.tp, hz.h)
                    THEN 4 ELSE 0 END) +
                  max(CASE WHEN e.event_type = 'view' AND
                    epoch_us(e.ts) >= coalesce(fp.tp, hz.h) - 43200000000
                    AND epoch_us(e.ts) < coalesce(fp.tp, hz.h)
                    THEN 8 ELSE 0 END) AS mask,
                  max(CASE WHEN fp.tp IS NOT NULL THEN 1 ELSE 0 END)
                    AS conv
                FROM events e LEFT JOIN fp ON fp.user_id = e.user_id
                CROSS JOIN hz
                GROUP BY e.user_id),
              v AS (
                SELECT mask, (sum(conv) * 1000000) // count(*) AS v_ppm
                FROM mk GROUP BY mask),
              ch AS (
                SELECT * FROM (VALUES ('click', 1), ('error', 2),
                  ('signup', 4), ('view', 8)) t(channel, bit)),
              sub AS (SELECT range AS s FROM range(16)),
              terms AS (
                SELECT ch.channel,
                  CASE bit_count(CAST(sub.s AS BIGINT)) WHEN 0 THEN 6
                    WHEN 1 THEN 2 WHEN 2 THEN 2 ELSE 6 END AS w24,
                  coalesce(v1.v_ppm, 0) - coalesce(v0.v_ppm, 0) AS dv
                FROM ch CROSS JOIN sub
                LEFT JOIN v v0 ON v0.mask = sub.s
                LEFT JOIN v v1 ON v1.mask = sub.s + ch.bit
                WHERE (sub.s & ch.bit) = 0)
              SELECT channel,
                CAST(sum(w24 * dv) // 24 AS BIGINT) AS phi_ppm
              FROM terms GROUP BY channel
              ORDER BY phi_ppm DESC, channel""")),

    // Welch two-sample readout for the q235 experiment: per-arm means
    // in micro-dollars (exact integer numerators), pooled nothing —
    // Welch's unequal-variance standard error and Satterthwaite df,
    // with the two irrational steps (sqrt, the df ratio) rounded once
    // to fixed point from exact integer variance sums (sqrt IS
    // correctly rounded in IEEE 754 — unlike ln/exp — so both engines
    // produce the identical double before the round). Sample variances
    // carried as the integer pair (n·SS - S², n·(n-1)) to dodge any
    // mean-of-squares cancellation. One corpus pass to per-user
    // partials; the test is a 2-row agg.
    QEntry("q244_welch_ttest",
      (s, d) => {
        val users = Tables.events(s, d)
          .select(col("user_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
          .groupBy(col("user_id"))
          .agg(expr("sum(cents) div 100").as("yd"))
          .withColumn("arm",
            conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 2)
        val stats = users.groupBy(col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("yd")).as("sy"),
            sum(col("yd") * col("yd")).as("syy"))
          .select(col("arm"), col("n"), col("sy"), col("syy"),
            expr("(n * syy - sy * sy) div (n * (n - 1))").as("var_d"))
        val a = stats.filter(col("arm") === 0)
          .select(col("n").as("na"), col("sy").as("sya"),
            col("var_d").as("va"))
        val b = stats.filter(col("arm") === 1)
          .select(col("n").as("nb"), col("sy").as("syb"),
            col("var_d").as("vb"))
        a.crossJoin(b)
          .select(col("na"), col("nb"),
            expr("(sya * 1000000) div na").as("mean_a_microd"),
            expr("(syb * 1000000) div nb").as("mean_b_microd"),
            col("va").as("var_a_d2"), col("vb").as("var_b_d2"),
            expr("CAST(round(sqrt(CAST(va AS DOUBLE) / na + " +
              "CAST(vb AS DOUBLE) / nb) * 1e6) AS BIGINT)")
              .as("se_microd"),
            expr("CAST(round((CAST(va AS DOUBLE) / na + " +
              "CAST(vb AS DOUBLE) / nb) * " +
              "(CAST(va AS DOUBLE) / na + CAST(vb AS DOUBLE) / nb) / " +
              "((CAST(va AS DOUBLE) / na) * (CAST(va AS DOUBLE) / na) " +
              "/ (na - 1) + (CAST(vb AS DOUBLE) / nb) * " +
              "(CAST(vb AS DOUBLE) / nb) / (nb - 1)) * 1000) AS BIGINT)")
              .as("df_milli"))
          .select(col("na"), col("nb"), col("mean_a_microd"),
            col("mean_b_microd"), col("var_a_d2"), col("var_b_d2"),
            col("se_microd"), col("df_milli"),
            expr("((mean_a_microd - mean_b_microd) * 1000) div se_microd")
              .as("t_milli"))
      },
      Some("""WITH u AS (
                SELECT user_id,
                  sum(CAST(round(value * 100) AS BIGINT)) // 100 AS yd,
                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    ::BIGINT % 2 AS arm
                FROM events GROUP BY user_id),
              st AS (
                SELECT arm, count(*) AS n, sum(yd) AS sy,
                  sum(yd * yd) AS syy,
                  (count(*) * sum(yd * yd) - sum(yd) * sum(yd)) //
                    (count(*) * (count(*) - 1)) AS var_d
                FROM u GROUP BY arm),
              ab AS (
                SELECT
                  max(CASE WHEN arm = 0 THEN n END) AS na,
                  max(CASE WHEN arm = 1 THEN n END) AS nb,
                  max(CASE WHEN arm = 0 THEN sy END) AS sya,
                  max(CASE WHEN arm = 1 THEN sy END) AS syb,
                  max(CASE WHEN arm = 0 THEN var_d END) AS va,
                  max(CASE WHEN arm = 1 THEN var_d END) AS vb
                FROM st),
              w AS (
                SELECT na, nb,
                  (sya * 1000000) // na AS mean_a_microd,
                  (syb * 1000000) // nb AS mean_b_microd,
                  va AS var_a_d2, vb AS var_b_d2,
                  CAST(round(sqrt(CAST(va AS DOUBLE) / na +
                    CAST(vb AS DOUBLE) / nb) * 1e6) AS BIGINT)
                    AS se_microd,
                  CAST(round((CAST(va AS DOUBLE) / na +
                    CAST(vb AS DOUBLE) / nb) *
                    (CAST(va AS DOUBLE) / na + CAST(vb AS DOUBLE) / nb) /
                    ((CAST(va AS DOUBLE) / na) * (CAST(va AS DOUBLE) / na)
                     / (na - 1) + (CAST(vb AS DOUBLE) / nb) *
                     (CAST(vb AS DOUBLE) / nb) / (nb - 1)) * 1000)
                    AS BIGINT) AS df_milli
                FROM ab)
              SELECT CAST(na AS BIGINT) AS na, CAST(nb AS BIGINT) AS nb,
                CAST(mean_a_microd AS BIGINT) AS mean_a_microd,
                CAST(mean_b_microd AS BIGINT) AS mean_b_microd,
                CAST(var_a_d2 AS BIGINT) AS var_a_d2,
                CAST(var_b_d2 AS BIGINT) AS var_b_d2,
                se_microd, df_milli,
                CAST(((mean_a_microd - mean_b_microd) * 1000) //
                  se_microd AS BIGINT) AS t_milli
              FROM w""")),

    // Seasonal-naive forecast backtest: hold out the final 7 days per
    // event type, forecast each held-out day with the SAME WEEKDAY a
    // week earlier (seasonal naive) vs yesterday (naive), score MAE in
    // integer counts and their ratio as MASE bp — the sanity backtest
    // that gates every fancier forecaster. Scale shape: corpus → the
    // (type, day) dimension in one keyed agg; forecasts are two
    // self-joins ON THE DIMENSION (day-7 / day-1), never corpus rows.
    QEntry("q245_seasonal_backtest",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // (type, day) dimension, joined 3 ways
        val horizon = daily.agg(max(col("day")).as("h"))
        val test = daily.crossJoin(broadcast(horizon))
          .filter(col("day") > col("h") - 7)
        val seas = daily.select(col("event_type"),
          (col("day") + 7).as("day"), col("cnt").as("f_seas"))
        val naive = daily.select(col("event_type"),
          (col("day") + 1).as("day"), col("cnt").as("f_naive"))
        test.join(seas, Seq("event_type", "day"))
          .join(naive, Seq("event_type", "day"))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_eval"),
            sum(abs(col("cnt") - col("f_seas"))).as("ae_seas"),
            sum(abs(col("cnt") - col("f_naive"))).as("ae_naive"))
          .select(col("event_type"), col("n_eval"),
            expr("(ae_seas * 100) div n_eval").as("mae_seas_c"),
            expr("(ae_naive * 100) div n_eval").as("mae_naive_c"),
            expr("(ae_seas * 10000) div ae_naive").as("mase_bp"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              hz AS (SELECT max(day) AS h FROM daily),
              test AS (
                SELECT d.* FROM daily d, hz WHERE d.day > hz.h - 7),
              j AS (
                SELECT t.event_type, t.cnt, s.cnt AS f_seas,
                  n.cnt AS f_naive
                FROM test t
                JOIN daily s ON s.event_type = t.event_type
                  AND s.day = t.day - 7
                JOIN daily n ON n.event_type = t.event_type
                  AND n.day = t.day - 1)
              SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
                CAST((sum(abs(cnt - f_seas)) * 100) // count(*)
                  AS BIGINT) AS mae_seas_c,
                CAST((sum(abs(cnt - f_naive)) * 100) // count(*)
                  AS BIGINT) AS mae_naive_c,
                CAST((sum(abs(cnt - f_seas)) * 10000) //
                  sum(abs(cnt - f_naive)) AS BIGINT) AS mase_bp
              FROM j GROUP BY event_type ORDER BY event_type""")),

    // Corpus concentration card: how unbalanced is the source mix, by
    // bytes? Shannon entropy in micro-nats (per-source log terms
    // rounded then count-weighted on RAW char counts — q228
    // discipline); Simpson/HHI/Gini computed in the share-ppm domain
    // (share_ppm = c·1e6 div n, <= 1e6 per source), which makes every
    // squared sum <= k·1e12 and the inverse-Simpson numerator a
    // CONSTANT 1e18 — overflow-proof at ANY corpus size, unlike raw
    // char-count squares (which blow past int64 near sf1). One keyed
    // agg to the source dimension; the 20-row rank is dimension-sized.
    QEntry("q246_source_concentration",
      (s, d) => {
        val src = Tables.documents(s, d)
          .groupBy(col("source")).agg(sum(col("n_chars")).as("c"))
        val tot = src.agg(sum(col("c")).as("n"), count(lit(1)).as("k"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("c"), col("source")) // 20-row source dimension
        val ranked = src.withColumn("i", row_number().over(w).cast("long"))
        ranked.crossJoin(broadcast(tot))
          .withColumn("share_ppm", expr("(c * 1000000) div n"))
          .select(col("c"), col("i"), col("n"), col("k"), col("share_ppm"),
            expr("c * CAST(round(ln(CAST(n AS DOUBLE) / c) * 1e6) " +
              "AS BIGINT)").as("ent_term"),
            (col("share_ppm") * col("share_ppm")).as("s2"),
            ((lit(2L) * col("i") - col("k") - 1) * col("share_ppm"))
              .as("gini_term"))
          .groupBy(lit(1).as("g"))
          .agg(max(col("k")).as("n_sources"),
            max(col("n")).as("total_chars"),
            expr("sum(ent_term) div max(n)").as("entropy_unats"),
            expr("1000000000000000000 div sum(s2)")
              .as("eff_sources_micro"),
            expr("sum(s2) div 1000000").as("hhi_ppm"),
            expr("(sum(gini_term) * 10000) div (max(k) * 1000000)")
              .as("gini_bp"))
          .drop("g")
      },
      Some("""WITH src AS (
                SELECT source, sum(n_chars) AS c
                FROM documents GROUP BY source),
              tot AS (SELECT sum(c) AS n, count(*) AS k FROM src),
              ranked AS (
                SELECT c, row_number() OVER (ORDER BY c, source) AS i,
                  (c * 1000000) // (SELECT n FROM tot) AS share_ppm
                FROM src)
              SELECT CAST(max(tot.k) AS BIGINT) AS n_sources,
                CAST(max(tot.n) AS BIGINT) AS total_chars,
                CAST(sum(c * CAST(round(ln(CAST(tot.n AS DOUBLE) / c)
                  * 1e6) AS BIGINT)) // max(tot.n) AS BIGINT)
                  AS entropy_unats,
                CAST(1000000000000000000 // sum(share_ppm * share_ppm)
                  AS BIGINT) AS eff_sources_micro,
                CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT)
                  AS hhi_ppm,
                CAST((sum((2 * i - tot.k - 1) * share_ppm) * 10000) //
                  (max(tot.k) * 1000000) AS BIGINT) AS gini_bp
              FROM ranked, tot"""))
  )
}
