package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, ninth pack: the streaming rate monitor's batch
  * twin (the shared-plan streaming==batch discipline of q144), SCD-2
  * dimension history building, the Theil–Sen robust trend estimator,
  * and funnel step-latency percentiles. Conventions unchanged.
  */
object Pipeline29 {

  val entries: Seq[QEntry] = Seq(

    // Hourly rate monitor (batch twin of EventsProfile.rateMonitor —
    // the SAME windowed-agg + broadcast-expectation plan runs under
    // readStream with a watermark; StreamingSpec pins streaming ==
    // batch). Expectation = per-type mean hourly count over the first
    // 480 hours (20 days), x100 integer; alarm iff |n - mu| > mu/2 in
    // exact integers. Scale shape: one keyed window agg, one broadcast
    // dim join; streaming state bounded by watermark x types.
    QEntry("q263_rate_monitor",
      (s, d) => {
        val ev = Tables.events(s, d)
        val lo = ev.agg(expr("min(ts div 3600000000000)").as("h0"))
        val hourly = ev.crossJoin(broadcast(lo))
          .select(col("event_type"),
            expr("ts div 3600000000000").as("h"), col("h0"))
        val mu = hourly.filter(col("h") < col("h0") + 480)
          .groupBy(col("event_type"))
          .agg(expr("(count(*) * 100) div 480").as("mu_centi"))
        val withTime = graft.streaming.EventsProfile.withEventTime(ev)
        graft.streaming.EventsProfile.rateMonitor(withTime, mu)
          .select(expr("unix_micros(window_start)").as("window_start_us"),
            col("event_type"), col("n"), col("mu_centi"), col("alarm"))
          .orderBy(col("window_start_us"), col("event_type"))
      },
      Some("""WITH lo AS (
                SELECT min(epoch_us(ts) // 3600000000) AS h0 FROM events),
              hourly AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS h
                FROM events),
              mu AS (
                SELECT event_type, (count(*) * 100) // 480 AS mu_centi
                FROM hourly, lo WHERE h < lo.h0 + 480
                GROUP BY event_type),
              cnt AS (
                SELECT event_type, h, count(*) AS n
                FROM hourly GROUP BY 1, 2)
              SELECT CAST(cnt.h * 3600000000 AS BIGINT)
                  AS window_start_us,
                cnt.event_type, CAST(cnt.n AS BIGINT) AS n,
                CAST(mu.mu_centi AS BIGINT) AS mu_centi,
                CAST(CASE WHEN abs(cnt.n * 200 - 2 * mu.mu_centi) >
                  mu.mu_centi THEN 1 ELSE 0 END AS BIGINT) AS alarm
              FROM cnt JOIN mu USING (event_type)
              ORDER BY window_start_us, event_type""")),

    // SCD-2 dimension history: per-user daily activity tier (0/1/2 by
    // event count) compressed into validity intervals — a new row only
    // when the tier CHANGES, valid_from = the change day, valid_to =
    // the day before the next change (-1 while current). The
    // slowly-changing-dimension build every warehouse runs on entity
    // attributes. Scale shape: corpus -> (user, day) dimension in one
    // keyed agg; change detection and interval closing are two
    // user-keyed lag/lead windows on that dimension.
    QEntry("q264_scd2_history",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("day"))
        val tiers = Tables.events(s, d)
          .select(col("user_id"), expr("ts div 86400000000000").as("day"))
          .groupBy(col("user_id"), col("day"))
          .agg(count(lit(1)).as("c"))
          .select(col("user_id"), col("day"),
            expr("CASE WHEN c <= 2 THEN 0L WHEN c <= 4 THEN 1L " +
              "ELSE 2L END").as("tier"))
        tiers
          .withColumn("pt", lag(col("tier"), 1).over(w))
          .filter(col("pt").isNull || col("tier") =!= col("pt"))
          .withColumn("valid_to",
            coalesce(lead(col("day"), 1).over(w) - 1, lit(-1L)))
          .select(col("user_id"), col("tier"),
            col("day").as("valid_from"), col("valid_to"))
          .orderBy(col("user_id"), col("valid_from"))
      },
      Some("""WITH ud AS (
                SELECT user_id, epoch_us(ts) * 1000 // 86400000000000
                  AS day, count(*) AS c
                FROM events GROUP BY 1, 2),
              t AS (
                SELECT user_id, day,
                  CASE WHEN c <= 2 THEN 0 WHEN c <= 4 THEN 1
                    ELSE 2 END AS tier
                FROM ud),
              ch AS (
                SELECT *, lag(tier) OVER (PARTITION BY user_id
                  ORDER BY day) AS pt
                FROM t),
              kept AS (
                SELECT user_id, tier, day FROM ch
                WHERE pt IS NULL OR tier <> pt),
              closed AS (
                SELECT user_id, tier, day AS valid_from,
                  coalesce(lead(day) OVER (PARTITION BY user_id
                    ORDER BY day) - 1, -1) AS valid_to
                FROM kept)
              SELECT user_id, CAST(tier AS BIGINT) AS tier,
                CAST(valid_from AS BIGINT) AS valid_from,
                CAST(valid_to AS BIGINT) AS valid_to
              FROM closed ORDER BY user_id, valid_from""")),

    // Theil-Sen robust trend per event type: the median of all
    // pairwise slopes (cnt_j - cnt_i)·1e6 div (day_j - day_i) over
    // the (type, day) daily-count dimension — the estimator that
    // shrugs off the outlier days that wreck least squares. The pair
    // join is DIMENSION x DIMENSION (30x30 per type), never corpus
    // rows; the median rides a type-partitioned rank window on the
    // slope dimension (q206 discipline).
    QEntry("q265_theil_sen",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // (type, day) dim feeds both pair sides
        val pairs = daily.alias("a")
          .join(daily.alias("b"),
            col("a.event_type") === col("b.event_type") &&
              col("b.day") > col("a.day"))
          .select(col("a.event_type").as("event_type"),
            expr("((b.cnt - a.cnt) * 1000000) div (b.day - a.day)")
              .as("slope"))
        val dim = pairs.groupBy(col("event_type"), col("slope"))
          .agg(count(lit(1)).as("cnt"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("slope"))
        dim
          .withColumn("cum", sum(col("cnt")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
          .withColumn("n", sum(col("cnt")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("event_type"))))
          .filter(col("cum") - col("cnt") < expr("(n + 1) div 2") &&
            col("cum") >= expr("(n + 1) div 2"))
          .select(col("event_type"), col("n").as("n_pairs"),
            col("slope").as("slope_micro_per_day"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              pairs AS (
                SELECT a.event_type,
                  ((b.cnt - a.cnt) * 1000000) // (b.day - a.day) AS slope
                FROM daily a JOIN daily b
                ON b.event_type = a.event_type AND b.day > a.day),
              dim AS (
                SELECT event_type, slope, count(*) AS cnt
                FROM pairs GROUP BY 1, 2),
              cum AS (
                SELECT *, sum(cnt) OVER (PARTITION BY event_type
                    ORDER BY slope ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW) AS cum,
                  sum(cnt) OVER (PARTITION BY event_type) AS n
                FROM dim)
              SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
                CAST(slope AS BIGINT) AS slope_micro_per_day
              FROM cum
              WHERE cum - cnt < (n + 1) // 2 AND cum >= (n + 1) // 2
              ORDER BY event_type""")),

    // Funnel step latency: for every purchase, the gap to the user's
    // most recent PRECEDING click (the last-touch step time), then
    // p50/p90/max of the gap distribution in integer minutes — how
    // long the click->purchase step takes. The as-of lookup is a
    // user-keyed last_value window (no join); the percentiles ride the
    // gap-minute value dimension (q206 discipline), which is bounded
    // by the observation window.
    QEntry("q266_step_latency",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)
        val gaps = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("last_click", last(
            when(col("event_type") === "click", col("ts")), true).over(w))
          .filter(col("event_type") === "purchase" &&
            col("last_click").isNotNull)
          .select(expr("(ts - last_click) div 60000000000")
            .as("gap_min"))
        val dim = gaps.groupBy(col("gap_min"))
          .agg(count(lit(1)).as("cnt"))
        val wv = org.apache.spark.sql.expressions.Window
          .orderBy(col("gap_min")) // bounded gap-minute dimension
        val cum = dim
          .withColumn("cum", sum(col("cnt")).over(wv.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
          .withColumn("n", sum(col("cnt")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        cum.agg(max(col("n")).as("n_steps"),
          min(when(col("cum") >= expr("(n + 1) div 2"), col("gap_min")))
            .as("p50_min"),
          min(when(col("cum") * 10 >= expr("n * 9"), col("gap_min")))
            .as("p90_min"),
          max(col("gap_min")).as("max_min"))
      },
      Some("""WITH e AS (
                SELECT user_id, epoch_us(ts) AS t, event_id, event_type
                FROM events),
              g AS (
                SELECT *,
                  max(CASE WHEN event_type = 'click' THEN t END)
                    OVER (PARTITION BY user_id ORDER BY t, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                    AS last_click
                FROM e),
              gaps AS (
                SELECT (t - last_click) // 60000000 AS gap_min
                FROM g
                WHERE event_type = 'purchase' AND last_click IS NOT NULL),
              dim AS (
                SELECT gap_min, count(*) AS cnt FROM gaps GROUP BY 1),
              cum AS (
                SELECT *, sum(cnt) OVER (ORDER BY gap_min
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum,
                  sum(cnt) OVER () AS n
                FROM dim)
              SELECT CAST(max(n) AS BIGINT) AS n_steps,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN gap_min END)
                  AS BIGINT) AS p50_min,
                CAST(min(CASE WHEN cum * 10 >= n * 9 THEN gap_min END)
                  AS BIGINT) AS p90_min,
                CAST(max(gap_min) AS BIGINT) AS max_min
              FROM cum"""))
  )
}
