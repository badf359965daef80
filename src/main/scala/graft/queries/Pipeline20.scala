package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3, eighth pack: sequence mining, information-
  * theoretic feature audit, Benford's-law fraud screening, and
  * referential-integrity reconciliation. Conventions unchanged.
  */
object Pipeline20 {

  val entries: Seq[QEntry] = Seq(

    // Frequent behavior sequences: every consecutive event-type trigram
    // from each user's time-ordered stream, with support = number of
    // DISTINCT users exhibiting it (the sequential-pattern-mining
    // support definition, not raw occurrence count) — top 10 by
    // support. One user-keyed lag window, one keyed distinct agg;
    // the pattern dimension carries the rest.
    QEntry("q227_frequent_sequences",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("p1", lag(col("event_type"), 1).over(w))
          .withColumn("p2", lag(col("event_type"), 2).over(w))
          .filter(col("p2").isNotNull)
          .select(col("user_id"),
            concat_ws(">", col("p2"), col("p1"), col("event_type"))
              .as("seq"))
          .groupBy(col("seq"))
          .agg(countDistinct(col("user_id")).as("support"),
            count(lit(1)).as("n_occurrences"))
          .orderBy(col("support").desc, col("n_occurrences").desc,
            col("seq"))
          .limit(10)
      },
      Some("""WITH s AS (
                SELECT user_id, event_type,
                  lag(event_type, 1) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS p1,
                  lag(event_type, 2) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS p2
                FROM events),
              sq AS (
                SELECT user_id, p2 || '>' || p1 || '>' || event_type AS seq
                FROM s WHERE p2 IS NOT NULL)
              SELECT seq, count(DISTINCT user_id) AS support,
                count(*) AS n_occurrences
              FROM sq GROUP BY seq
              ORDER BY support DESC, n_occurrences DESC, seq
              LIMIT 10""")),

    // Mutual information between event type and the value decile — the
    // feature-selection screen ("does the type tell me anything about
    // the spend?") in the suite's micro-nat discipline: joint and
    // marginal counts exact, each cell's log term rounded to integer
    // micro-nats, the (count-weighted) sum exact and order-independent;
    // MI reported in micro-nats scaled by the total count to stay
    // integral: MI_unats = Σ c_xy · round(1e6·ln(c_xy·N/(c_x·c_y)))
    // div N. One corpus agg, dimension-sized rest.
    QEntry("q228_mutual_information",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type").as("x"),
            least(lit(9L), expr(
              "CAST(round(value * 100) AS BIGINT) div 5000")).as("y"))
        val joint = ev.groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("cxy"))
          .localCheckpoint() // feeds both marginals + the MI rollup
        val mx = joint.groupBy(col("x")).agg(sum(col("cxy")).as("cx"))
        val my = joint.groupBy(col("y")).agg(sum(col("cxy")).as("cy"))
        val tot = joint.agg(sum(col("cxy")).as("n"))
        joint.join(mx, "x").join(my, "y").crossJoin(broadcast(tot))
          .select(col("cxy"), col("n"),
            expr("CAST(round(ln(CAST(cxy AS DOUBLE) * n / " +
              "(CAST(cx AS DOUBLE) * cy)) * 1e6) AS BIGINT)")
              .as("lr_unats"))
          .agg(max(col("n")).as("n_events"),
            expr("sum(cxy * lr_unats)").as("num"))
          .select(col("n_events"),
            expr("num div n_events").as("mi_unats"))
      },
      Some("""WITH e AS (
                SELECT event_type AS x,
                  least(9, CAST(round(value * 100) AS BIGINT) // 5000) AS y
                FROM events),
              joint AS (
                SELECT x, y, count(*) AS cxy FROM e GROUP BY 1, 2),
              mx AS (SELECT x, sum(cxy) AS cx FROM joint GROUP BY x),
              my AS (SELECT y, sum(cxy) AS cy FROM joint GROUP BY y),
              tot AS (SELECT sum(cxy) AS n FROM joint),
              term AS (
                SELECT j.cxy, tot.n,
                  CAST(round(ln(CAST(j.cxy AS DOUBLE) * tot.n /
                    (CAST(mx.cx AS DOUBLE) * my.cy)) * 1e6) AS BIGINT)
                    AS lr_unats
                FROM joint j JOIN mx ON mx.x = j.x
                JOIN my ON my.y = j.y CROSS JOIN tot)
              SELECT CAST(max(n) AS BIGINT) AS n_events,
                CAST(sum(cxy * lr_unats) // max(n) AS BIGINT) AS mi_unats
              FROM term""")),

    // Benford's-law first-digit audit over order totals — the fraud/
    // data-generation screen an auditor runs on monetary columns:
    // observed first-digit counts vs the Benford expectation
    // n·log10(1+1/d), the per-digit deviation in bp of n, and the
    // chi-square-style statistic Σ (obs−exp)²·1e4 div exp as one
    // integer (expected counts floored from the rounded micro-probs,
    // so both engines carry identical integers). One corpus agg onto
    // a 9-row digit dimension.
    QEntry("q229_benford_audit",
      (s, d) => {
        val digit = expr(
          "CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT) " +
            "AS STRING), 1, 1) AS BIGINT)")
        val obs = Tables.load(s, d, "orders")
          .select(digit.as("d"))
          .groupBy(col("d")).agg(count(lit(1)).as("obs"))
        val tot = obs.agg(sum(col("obs")).as("n"))
        obs.crossJoin(broadcast(tot))
          // benford_micro = round(1e6·log10(1 + 1/d)); exp = n·p div 1e6
          .withColumn("p_micro",
            expr("CAST(round(ln(1.0 + 1.0 / d) / ln(10) * 1e6) AS BIGINT)"))
          .withColumn("exp", expr("(n * p_micro) div 1000000"))
          .select(col("d"), col("obs"), col("exp"),
            expr("((obs - exp) * 10000) div n").as("dev_bp"),
            expr("((obs - exp) * (obs - exp) * 10000) div exp")
              .as("chi_term"))
          .orderBy(col("d"))
      },
      Some("""WITH o AS (
                SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100)
                  AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS d
                FROM orders),
              obs AS (SELECT d, count(*) AS obs FROM o GROUP BY d),
              tot AS (SELECT sum(obs) AS n FROM obs),
              t AS (
                SELECT d, obs, n,
                  CAST(round(ln(1.0 + 1.0 / d) / ln(10) * 1e6) AS BIGINT)
                    AS p_micro
                FROM obs, tot)
              SELECT d, CAST(obs AS BIGINT) AS obs,
                CAST((n * p_micro) // 1000000 AS BIGINT) AS exp,
                CAST(((obs - (n * p_micro) // 1000000) * 10000) // n
                  AS BIGINT) AS dev_bp,
                CAST(((obs - (n * p_micro) // 1000000) *
                      (obs - (n * p_micro) // 1000000) * 10000) //
                     ((n * p_micro) // 1000000) AS BIGINT) AS chi_term
              FROM t ORDER BY d""")),

    // Referential-integrity reconciliation — the warehouse-landing
    // audit: orphaned lineitems (FK with no order), childless orders,
    // and the per-order fan-out histogram, in one report. Exact
    // anti-join counts; the fan-out histogram rides the degree frame.
    QEntry("q230_referential_audit",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey").as("k"))
        val ok = Tables.load(s, d, "orders")
          .select(col("o_orderkey").as("k"))
        val deg = li.groupBy(col("k")).agg(count(lit(1)).as("fan"))
          .localCheckpoint() // feeds orphans AND the fan-out histogram
        val orphans = deg.join(ok, Seq("k"), "left_anti")
          .agg(coalesce(sum(col("fan")), lit(0L)).as("v"))
          .select(lit("a_orphan_lineitems").as("metric"), col("v"))
        val childless = ok.join(deg, Seq("k"), "left_anti")
          .agg(count(lit(1)).as("v"))
          .select(lit("b_childless_orders").as("metric"), col("v"))
        val hist = deg.groupBy(col("fan"))
          .agg(count(lit(1)).as("v"))
          .select(concat(lit("c_fanout_"), col("fan")).as("metric"),
            col("v"))
        orphans.unionByName(childless).unionByName(hist)
          .orderBy(col("metric"))
      },
      Some("""WITH deg AS (
                SELECT l_orderkey AS k, count(*) AS fan
                FROM lineitem GROUP BY 1),
              orphans AS (
                SELECT 'a_orphan_lineitems' AS metric,
                  coalesce(sum(fan), 0) AS v
                FROM deg WHERE k NOT IN (SELECT o_orderkey FROM orders)),
              childless AS (
                SELECT 'b_childless_orders', count(*)
                FROM orders WHERE o_orderkey NOT IN (SELECT k FROM deg)),
              hist AS (
                SELECT 'c_fanout_' || CAST(fan AS VARCHAR), count(*)
                FROM deg GROUP BY fan)
              SELECT metric, CAST(v AS BIGINT) AS v FROM (
                SELECT * FROM orphans
                UNION ALL SELECT * FROM childless
                UNION ALL SELECT * FROM hist)
              ORDER BY metric"""))
  )
}
