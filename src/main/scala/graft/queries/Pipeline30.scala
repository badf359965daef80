package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, tenth pack: capture–recapture population
  * estimation, seasonal decomposition (centered-MA trend + day-of-week
  * indices), varint postings-size planning for the inverted index, and
  * per-step funnel A/B significance. Conventions unchanged.
  */
object Pipeline30 {

  val entries: Seq[QEntry] = Seq(

    // Capture-recapture (Chapman) population estimate: two 1-day
    // capture windows (first day, last day) over user activity; the
    // estimator ((n1+1)(n2+1) div (m+1)) - 1 with a Chapman variance
    // in milli — "how many users exist, from two sightings" when the
    // true census is impractical. Exact integer arithmetic; the two
    // captures are pushed-down scans + distinct aggs.
    QEntry("q267_capture_recapture",
      (s, d) => {
        val ev = Tables.events(s, d)
        val span = ev.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi"))
        val marked = ev.crossJoin(broadcast(span))
          .select(col("user_id"),
            (col("ts") < col("lo") + 86400000000000L).as("in_a"),
            (col("ts") >= col("hi") - 86400000000000L).as("in_b"))
          .groupBy(col("user_id"))
          .agg(max(col("in_a").cast("long")).as("a"),
            max(col("in_b").cast("long")).as("b"))
        marked.agg(sum(col("a")).as("n1"), sum(col("b")).as("n2"),
            sum(col("a") * col("b")).as("m"),
            count(lit(1)).as("true_users"))
          .select(col("n1"), col("n2"), col("m"), col("true_users"),
            expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1")
              .as("chapman_est"),
            // Chapman variance: (n1+1)(n2+1)(n1-m)(n2-m) /
            // ((m+1)^2 (m+2)), reported in milli
            expr("CAST(round(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) * " +
              "(n1 - m) * (n2 - m) / ((m + 1) * (m + 1)) / (m + 2) " +
              "* 1000) AS BIGINT)").as("var_milli"))
      },
      Some("""WITH span AS (
                SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
                FROM events),
              mk AS (
                SELECT user_id,
                  max(CASE WHEN epoch_us(ts) < span.lo + 86400000000
                    THEN 1 ELSE 0 END) AS a,
                  max(CASE WHEN epoch_us(ts) >= span.hi - 86400000000
                    THEN 1 ELSE 0 END) AS b
                FROM events, span GROUP BY user_id),
              agg AS (
                SELECT sum(a) AS n1, sum(b) AS n2, sum(a * b) AS m,
                  count(*) AS true_users
                FROM mk)
              SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
                CAST(m AS BIGINT) AS m,
                CAST(true_users AS BIGINT) AS true_users,
                CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT)
                  AS chapman_est,
                CAST(round(CAST((n1 + 1) * (n2 + 1) AS DOUBLE) *
                  (n1 - m) * (n2 - m) / ((m + 1) * (m + 1)) / (m + 2)
                  * 1000) AS BIGINT) AS var_milli
              FROM agg""")),

    // Seasonal decomposition of daily traffic per type: trend = the
    // centered 7-day moving average (interior days only — exactly 7
    // observations, integer micro), seasonal index = per day-of-week
    // mean of the detrended series. The classical-decomposition
    // additive model on the (type, day) dimension; every window is
    // type-partitioned and 7 rows wide.
    QEntry("q268_seasonal_decompose",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))
          .rowsBetween(-3, 3)
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
        daily
          .withColumn("n_win", count(lit(1)).over(w))
          .withColumn("win_sum", sum(col("cnt")).over(w))
          .withColumn("trend_micro", expr("(win_sum * 1000000) div 7"))
          .filter(col("n_win") === 7)
          .withColumn("detr_micro",
            col("cnt") * 1000000L - col("trend_micro"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_obs"),
            expr("sum(detr_micro) div count(*)").as("seasonal_micro"))
          .orderBy(col("event_type"), col("dow"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              tr AS (
                SELECT *, count(*) OVER wf AS n_win,
                  (sum(cnt) OVER wf * 1000000) // 7 AS trend_micro
                FROM daily
                WINDOW wf AS (PARTITION BY event_type ORDER BY day
                  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
              det AS (
                SELECT event_type, day % 7 AS dow,
                  cnt * 1000000 - trend_micro AS detr_micro
                FROM tr WHERE n_win = 7)
              SELECT event_type, CAST(dow AS BIGINT) AS dow,
                CAST(count(*) AS BIGINT) AS n_obs,
                CAST(sum(detr_micro) // count(*) AS BIGINT)
                  AS seasonal_micro
              FROM det GROUP BY 1, 2 ORDER BY event_type, dow""")),

    // Inverted-index postings size planning: per term, the varint-
    // (LEB128-)encoded size of the delta-gapped postings list — the
    // capacity estimate an index owner runs before building. Gaps via
    // a term-keyed lag window over sorted doc ids; byte cost by integer
    // threshold cases (1 byte < 2^7, 2 < 2^14, 3 < 2^21, else 4).
    // Top 15 terms by bytes. All term-keyed — no global anything.
    QEntry("q269_postings_varint",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("term")).orderBy(col("doc_id"))
        val post = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(split(lower(col("text")), "\\s+")))
              .as("term"))
          .filter(length(col("term")) > 0)
          .withColumn("gap",
            col("doc_id") - coalesce(lag(col("doc_id"), 1).over(w),
              lit(0L)))
          .withColumn("bytes", expr(
            "CASE WHEN gap < 128 THEN 1L WHEN gap < 16384 THEN 2L " +
              "WHEN gap < 2097152 THEN 3L ELSE 4L END"))
        post.groupBy(col("term"))
          .agg(count(lit(1)).as("df"), sum(col("bytes")).as("bytes"),
            expr("sum(gap) div count(*)").as("avg_gap"))
          .select(col("term"), col("df"), col("bytes"), col("avg_gap"),
            expr("(bytes * 100) div df").as("bytes_per_posting_centi"))
          .orderBy(col("bytes").desc, col("term"))
          .limit(15)
      },
      Some("""WITH post AS (
                SELECT doc_id, unnest(list_distinct(
                  string_split_regex(lower(text), '\s+'))) AS term
                FROM documents),
              g AS (
                SELECT term, doc_id,
                  doc_id - coalesce(lag(doc_id) OVER (
                    PARTITION BY term ORDER BY doc_id), 0) AS gap
                FROM post WHERE len(term) > 0),
              b AS (
                SELECT term, gap,
                  CASE WHEN gap < 128 THEN 1 WHEN gap < 16384 THEN 2
                    WHEN gap < 2097152 THEN 3 ELSE 4 END AS bytes
                FROM g)
              SELECT term, CAST(count(*) AS BIGINT) AS df,
                CAST(sum(bytes) AS BIGINT) AS bytes,
                CAST(sum(gap) // count(*) AS BIGINT) AS avg_gap,
                CAST((sum(bytes) * 100) // count(*) AS BIGINT)
                  AS bytes_per_posting_centi
              FROM b GROUP BY term
              ORDER BY bytes DESC, term LIMIT 15""")),

    // Funnel-step A/B significance: per step transition (signup→click,
    // click→purchase, ordered by event time within user), the
    // two-proportion z between the q235 hash arms in milli — "did the
    // treatment change funnel progression, and where". Proportions are
    // exact integer pairs; the one sqrt rounds once (IEEE-exact).
    QEntry("q270_funnel_significance",
      (s, d) => {
        val ev = Tables.events(s, d)
        val perUser = ev.groupBy(col("user_id"))
          .agg(min(when(col("event_type") === "signup", col("ts")))
            .as("t_signup"),
            min(when(col("event_type") === "click", col("ts")))
              .as("t_click"),
            min(when(col("event_type") === "purchase", col("ts")))
              .as("t_purchase"))
          .withColumn("arm",
            conv(substring(md5(col("user_id").cast("string")), 1, 8),
              16, 10).cast("long") % 2)
          .withColumn("s1", col("t_signup").isNotNull.cast("long"))
          .withColumn("s2", (col("t_signup").isNotNull &&
            col("t_click").isNotNull &&
            col("t_click") > col("t_signup")).cast("long"))
          .withColumn("s3", (col("t_signup").isNotNull &&
            col("t_click").isNotNull &&
            col("t_click") > col("t_signup") &&
            col("t_purchase").isNotNull &&
            col("t_purchase") > col("t_click")).cast("long"))
        val arms = perUser.groupBy(col("arm"))
          .agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"),
            sum(col("s3")).as("c3"))
        val a = arms.filter(col("arm") === 0)
          .select(col("c1").as("a1"), col("c2").as("a2"),
            col("c3").as("a3"))
        val b = arms.filter(col("arm") === 1)
          .select(col("c1").as("b1"), col("c2").as("b2"),
            col("c3").as("b3"))
        val wide = a.crossJoin(b)
        def step(name: String, na: String, ca: String, nb: String,
            cb: String) =
          wide.select(lit(name).as("step"),
            col(na).as("n_a"), col(ca).as("conv_a"),
            col(nb).as("n_b"), col(cb).as("conv_b"),
            expr(s"CAST(round((CAST($ca AS DOUBLE) / $na - " +
              s"CAST($cb AS DOUBLE) / $nb) / sqrt((CAST($ca + $cb " +
              s"AS DOUBLE) / ($na + $nb)) * (1.0 - CAST($ca + $cb " +
              s"AS DOUBLE) / ($na + $nb)) * (1.0 / $na + 1.0 / $nb)) " +
              "* 1000) AS BIGINT)").as("z_milli"))
        step("1_signup_to_click", "a1", "a2", "b1", "b2")
          .unionByName(step("2_click_to_purchase", "a2", "a3", "b2", "b3"))
          .orderBy(col("step"))
      },
      Some("""WITH pu AS (
                SELECT user_id,
                  min(CASE WHEN event_type = 'signup'
                    THEN epoch_us(ts) END) AS ts1,
                  min(CASE WHEN event_type = 'click'
                    THEN epoch_us(ts) END) AS tc,
                  min(CASE WHEN event_type = 'purchase'
                    THEN epoch_us(ts) END) AS tp,
                  ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    ::BIGINT % 2 AS arm
                FROM events GROUP BY user_id),
              fl AS (
                SELECT arm,
                  CASE WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END AS s1,
                  CASE WHEN ts1 IS NOT NULL AND tc IS NOT NULL
                    AND tc > ts1 THEN 1 ELSE 0 END AS s2,
                  CASE WHEN ts1 IS NOT NULL AND tc IS NOT NULL
                    AND tc > ts1 AND tp IS NOT NULL AND tp > tc
                    THEN 1 ELSE 0 END AS s3
                FROM pu),
              arms AS (
                SELECT arm, sum(s1) AS c1, sum(s2) AS c2, sum(s3) AS c3
                FROM fl GROUP BY arm),
              wide AS (
                SELECT
                  max(CASE WHEN arm = 0 THEN c1 END) AS a1,
                  max(CASE WHEN arm = 0 THEN c2 END) AS a2,
                  max(CASE WHEN arm = 0 THEN c3 END) AS a3,
                  max(CASE WHEN arm = 1 THEN c1 END) AS b1,
                  max(CASE WHEN arm = 1 THEN c2 END) AS b2,
                  max(CASE WHEN arm = 1 THEN c3 END) AS b3
                FROM arms),
              st AS (
                SELECT '1_signup_to_click' AS step,
                  a1 AS n_a, a2 AS conv_a, b1 AS n_b, b2 AS conv_b
                FROM wide
                UNION ALL
                SELECT '2_click_to_purchase', a2, a3, b2, b3 FROM wide)
              SELECT step, CAST(n_a AS BIGINT) AS n_a,
                CAST(conv_a AS BIGINT) AS conv_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(conv_b AS BIGINT) AS conv_b,
                CAST(round((CAST(conv_a AS DOUBLE) / n_a -
                  CAST(conv_b AS DOUBLE) / n_b) /
                  sqrt((CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b)) *
                    (1.0 - CAST(conv_a + conv_b AS DOUBLE) /
                      (n_a + n_b)) * (1.0 / n_a + 1.0 / n_b)) * 1000)
                  AS BIGINT) AS z_milli
              FROM st ORDER BY step"""))
  )
}
