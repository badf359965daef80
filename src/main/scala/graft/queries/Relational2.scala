package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.profile.Validators

/** Second relational/profiling pack: per-column profile statistics,
  * pivot, rollup, as-of join, and the dictionary-backed phone validator —
  * rounding out the §2d taxonomy rows plus classic profiler summaries.
  */
object Relational2 {

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100, 0).cast("long")

  val entries: Seq[QEntry] = Seq(

    // Phone v1 (S3): NANP + registered-area-code dimension, with the
    // area codes loaded from the zips.json JSON side-input (the
    // reference's `set(area_codes)` driver-side flow, ZipDim scaladoc).
    QEntry("q17_phone_v1_validate",
      (s, d) => {
        val m = col("c_custkey") % 4
        val synth = when(m === 0, concat(lit("+1212"), lpad((lit(2000000) + col("c_custkey") % 7999999).cast("string"), 7, "0")))
          .when(m === 1, concat(lit("+1999"), lpad((lit(2000000) + col("c_custkey") % 7999999).cast("string"), 7, "0")))
          .when(m === 2, lit("9995551234"))
          .otherwise(lit("212-555-1234"))
        val v = Validators.phoneVerdictV1(col("raw"),
          graft.sources.ZipDim.areaCodesFromFile(s))
        Tables.customer(s, d)
          .select(col("c_custkey"), synth.as("raw"))
          .select(col("c_custkey"), col("raw"), v.getField("code").as("code"))
          .orderBy(col("c_custkey"))
      },
      Some("""SELECT c_custkey,
               CASE c_custkey % 4
                 WHEN 0 THEN concat('+1212', lpad(cast(2000000 + c_custkey % 7999999 AS VARCHAR), 7, '0'))
                 WHEN 1 THEN concat('+1999', lpad(cast(2000000 + c_custkey % 7999999 AS VARCHAR), 7, '0'))
                 WHEN 2 THEN '9995551234'
                 ELSE '212-555-1234' END AS raw,
               CASE c_custkey % 4
                 WHEN 0 THEN 1 WHEN 1 THEN 5 WHEN 2 THEN 5 ELSE 2 END AS code
              FROM customer ORDER BY c_custkey""")),

    // Classic profiler summary: per-column count/nulls/distinct/min/max.
    QEntry("q18_profile_stats",
      (s, d) => Tables.customer(s, d)
        .select(explode(array(
          struct(lit("c_name").as("col_name"), col("c_name").cast("string").as("value")),
          struct(lit("c_mktsegment").as("col_name"), col("c_mktsegment").cast("string").as("value")),
          struct(lit("c_nationkey").as("col_name"), lpad(col("c_nationkey").cast("string"), 4, "0").as("value"))
        )).as("p"))
        .select(col("p.col_name").as("col_name"), col("p.value").as("value"))
        .groupBy(col("col_name"))
        .agg(count(col("value")).as("n"),
          sum(when(col("value").isNull, 1L).otherwise(0L)).as("n_null"),
          countDistinct(col("value")).as("n_distinct"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))
        .orderBy(col("col_name")),
      Some("""SELECT col_name, count(value) AS n,
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT value) AS n_distinct,
               min(value) AS min_v, max(value) AS max_v
              FROM (
                SELECT 'c_name' AS col_name, CAST(c_name AS VARCHAR) AS value FROM customer
                UNION ALL
                SELECT 'c_mktsegment', CAST(c_mktsegment AS VARCHAR) FROM customer
                UNION ALL
                SELECT 'c_nationkey', lpad(CAST(c_nationkey AS VARCHAR), 4, '0') FROM customer)
              GROUP BY col_name ORDER BY col_name""")),

    // Pivot: order counts + cents by status x priority.
    QEntry("q19_pivot_status_priority",
      (s, d) => {
        val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        val pv = Tables.orders(s, d)
          .groupBy(col("o_orderstatus"))
          .pivot("o_orderpriority", priorities)
          .agg(sum(cents(col("o_totalprice"))))
        pv.select(col("o_orderstatus"),
            col("`1-URGENT`").as("urgent_cents"),
            col("`2-HIGH`").as("high_cents"),
            col("`3-MEDIUM`").as("medium_cents"),
            col("`4-NOT SPECIFIED`").as("notspec_cents"),
            col("`5-LOW`").as("low_cents"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
               CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT) AS urgent_cents,
               CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT) AS high_cents,
               CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT) AS medium_cents,
               CAST(sum(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT) AS notspec_cents,
               CAST(sum(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(round(o_totalprice*100) AS BIGINT) END) AS BIGINT) AS low_cents
              FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""")),

    // Rollup with grouping labels.
    QEntry("q40_rollup_pricing",
      (s, d) => Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
          count(lit(1)).as("cnt"))
        .select(coalesce(col("l_returnflag"), lit("(all)")).as("rf"),
          coalesce(col("l_linestatus"), lit("(all)")).as("ls"),
          col("sum_qty"), col("cnt"))
        .orderBy(col("rf"), col("ls")),
      Some("""SELECT coalesce(l_returnflag, '(all)') AS rf,
               coalesce(l_linestatus, '(all)') AS ls,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               count(*) AS cnt
              FROM lineitem
              GROUP BY ROLLUP (l_returnflag, l_linestatus)
              ORDER BY rf, ls""")),

    // As-of join (event-time): for each click, the most recent prior
    // purchase by the same user. Spark-first formulation: running
    // last(ignoreNulls) over the per-user event-time order — one shuffle
    // on user_id, no join at all (the classic sort-merge as-of collapses
    // into a window when both sides share the partition key).
    QEntry("q41_asof_purchase_before_click",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("ts div 1000").as("us"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("prev_purchase_id",
            last(when(col("event_type") === "purchase", col("event_id")), ignoreNulls = true).over(w))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("prev_purchase_id"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, prev_purchase_id FROM (
                SELECT event_id, user_id, event_type,
                  last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_id
                FROM events)
              WHERE event_type = 'click'
              ORDER BY event_id""")),

    // The spark.sql entry point end-to-end: same engine, SQL text in —
    // revenue by nation through two joins (dims broadcast by size), with
    // the identical statement (modulo money casting) as its own oracle.
    QEntry("q46_sql_surface",
      (s, d) => {
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.orders(s, d).createOrReplaceTempView("g_orders")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name,
                  sum(CAST(round(o_totalprice*100) AS BIGINT)) AS revenue_cents,
                  count(*) AS n_orders
                 FROM g_orders
                 JOIN g_customer ON o_custkey = c_custkey
                 JOIN g_nation ON c_nationkey = n_nationkey
                 GROUP BY n_name
                 ORDER BY n_name""")
      },
      Some("""SELECT n_name,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_orders
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              GROUP BY n_name
              ORDER BY n_name""")),

    // CUBE: all grouping-set combinations in one pass; null group markers
    // tagged 'ALL' via grouping() so both engines order identically.
    QEntry("q48_cube_pricing",
      (s, d) => Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("l_extendedprice") * 100, 0).cast("long")).as("sum_cents"),
          grouping(col("l_returnflag")).as("g_r"),
          grouping(col("l_linestatus")).as("g_l"))
        .select(
          when(col("g_r") === 1, "ALL").otherwise(col("l_returnflag")).as("rflag"),
          when(col("g_l") === 1, "ALL").otherwise(col("l_linestatus")).as("lstatus"),
          col("n"), col("sum_cents"))
        .orderBy(col("rflag"), col("lstatus")),
      Some("""SELECT
               CASE WHEN GROUPING(l_returnflag) = 1 THEN 'ALL' ELSE l_returnflag END AS rflag,
               CASE WHEN GROUPING(l_linestatus) = 1 THEN 'ALL' ELSE l_linestatus END AS lstatus,
               count(*) AS n,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_cents
              FROM lineitem
              GROUP BY CUBE (l_returnflag, l_linestatus)
              ORDER BY rflag, lstatus""")),

    // Exact interpolated percentiles (R-7, both engines' continuous
    // quantile): p in {.25,.5,.75} over integer cents interpolates on
    // quarter fractions — exactly representable doubles, so the oracle
    // hash-matches without rounding games.
    QEntry("q49_percentiles",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderpriority"),
          round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
        .groupBy(col("o_orderpriority"))
        .agg(
          expr("percentile(cents, 0.25)").as("p25"),
          expr("percentile(cents, 0.5)").as("p50"),
          expr("percentile(cents, 0.75)").as("p75"),
          count(lit(1)).as("n"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority,
               quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.25) AS p25,
               quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.5) AS p50,
               quantile_cont(CAST(round(o_totalprice*100) AS BIGINT), 0.75) AS p75,
               count(*) AS n
              FROM orders
              GROUP BY o_orderpriority
              ORDER BY o_orderpriority"""))
  )
}
