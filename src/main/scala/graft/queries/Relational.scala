package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** One named query: Spark plan + optional DuckDB oracle SQL. */
case class QEntry(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Per-run scratch sink paths for roundtrip queries (q56/q90/q94/q95/
  * q97): suffixed with the Spark application id so two suites running
  * concurrently on one machine never overwrite each other's sink
  * mid-read (fixed literals produced spurious hash mismatches). */
object Scratch {
  def dir(s: SparkSession, name: String): String =
    s"/tmp/graft_${name}_${s.sparkContext.applicationId}"
}

/** Core relational operator coverage (SURVEY.md §2a O1–O17 mappings).
  *
  * Oracle-parity rules (SURVEY.md §5/§7): every query is totally ordered
  * on a unique key; doubles never cross the aggregation boundary — money
  * flows as exact integer cents (`cast(round(x*100) as bigint)`), which
  * both engines compute identically from identical IEEE inputs; dates are
  * emitted as formatted strings.
  */
object Relational {

  /** Exact integer cents from a 2-decimal double — order-independent
    * aggregation, no float drift vs DuckDB. */
  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  val entries: Seq[QEntry] = Seq(

    // O1/O9/O10: scan → pushed filter → pruned projection.
    QEntry("q01_scan_filter_project",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        li.filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
            col("l_discount") > 0.05)
          .select(col("l_orderkey"), col("l_linenumber"),
            round(col("l_quantity"), 0).cast("long").as("qty"),
            cents(col("l_extendedprice")).as("price_cents"),
            date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"))
          .orderBy(col("l_orderkey"), col("l_linenumber"))
      },
      Some("""SELECT l_orderkey, l_linenumber,
               CAST(round(l_quantity) AS BIGINT) AS qty,
               CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_date
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                AND l_shipdate < TIMESTAMP '1998-01-01'
                AND l_discount > 0.05
              ORDER BY l_orderkey, l_linenumber""")),

    // O8: partial+final hash aggregation (TPC-H Q1 shape).
    QEntry("q02_agg_pricing_summary",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(round(col("l_quantity"), 0).cast("long")).as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100, 0)
            .cast("long")).as("sum_disc_cents"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
               CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
               count(*) AS cnt
              FROM lineitem
              GROUP BY l_returnflag, l_linestatus
              ORDER BY l_returnflag, l_linestatus""")),

    // O8+O9: aggregation + HAVING.
    QEntry("q03_agg_having",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_suppkey"))
        .agg(sum(cents(col("l_extendedprice"))).as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .filter(col("n_items") >= 10 && col("revenue_cents") > 1000000L)
        .orderBy(col("l_suppkey")),
      Some("""SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n_items
              FROM lineitem
              GROUP BY l_suppkey
              HAVING count(*) >= 10
                 AND sum(CAST(round(l_extendedprice*100) AS BIGINT)) > 1000000
              ORDER BY l_suppkey""")),

    // O12 + top-k: total sort with deterministic tie-break, limit.
    QEntry("q04_topk_orders",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderkey"), cents(col("o_totalprice")).as("total_cents"))
        .orderBy(col("total_cents").desc, col("o_orderkey"))
        .limit(100),
      Some("""SELECT o_orderkey,
               CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
              FROM orders
              ORDER BY total_cents DESC, o_orderkey
              LIMIT 100""")),

    // O3: row identity — global rank via the two-pass partition-offset
    // operator (no single-partition window; see GlobalRank), per-user
    // rank via an ordinary partitioned window.
    QEntry("q05_row_number",
      (s, d) => {
        val ev = Tables.events(s, d)
        val withUser = ev.select(col("event_id"), col("user_id"),
          row_number().over(
            Window.partitionBy(col("user_id")).orderBy(col("event_id"))).as("rn_user"))
        graft.operators.GlobalRank.rowNumber(withUser, "rn", col("event_id"))
          .select(col("event_id"), col("user_id"), col("rn"), col("rn_user"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id,
               row_number() OVER (ORDER BY event_id) AS rn,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn_user
              FROM events
              ORDER BY event_id""")),

    // Window aggregate: per-user running sum (exact integer cents).
    QEntry("q06_window_running",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            sum(cents(col("value"))).over(w).as("running_cents"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
               CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
                 PARTITION BY user_id ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
              FROM events
              ORDER BY user_id, event_id""")),

    // O13: group + collect_list + in-group sort (emitted as CSV string).
    QEntry("q07_group_collect_sorted",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(array_join(sort_array(collect_list(col("o_orderkey").cast("string"))), ",")
          .as("orderkeys_csv"),
          count(lit(1)).as("n_orders"))
        .orderBy(col("o_custkey")),
      Some("""SELECT o_custkey,
               array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',') AS orderkeys_csv,
               count(*) AS n_orders
              FROM orders
              GROUP BY o_custkey
              ORDER BY o_custkey""")),

    // O16 shape: hash semi-join (EXISTS).
    QEntry("q08_semi_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // Anti-join (NOT EXISTS).
    QEntry("q09_anti_join",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_mktsegment"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, c_mktsegment FROM customer
              WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
              ORDER BY c_custkey""")),

    // Broadcast dim joins: fact ⋈ small dims never shuffles the dims.
    QEntry("q10_join_dims",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"), col("n_name"), col("r_name"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, n_name, r_name
              FROM customer
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              ORDER BY c_custkey""")),

    // O17: edit-distance typo check (built-in levenshtein, no UDF).
    QEntry("q11_levenshtein",
      (s, d) => Tables.nation(s, d)
        .select(col("n_nationkey"), col("n_name"),
          levenshtein(lower(col("n_name")), lit("united states")).as("dist"))
        .orderBy(col("n_nationkey")),
      Some("""SELECT n_nationkey, n_name,
               levenshtein(lower(n_name), 'united states') AS dist
              FROM nation
              ORDER BY n_nationkey""")),

    // Set operations: intersect / except with tags.
    QEntry("q12_set_ops",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("k")).distinct()
        val su = Tables.supplier(s, d).select(col("s_nationkey").as("k")).distinct()
        c.intersect(su).select(lit("both").as("tag"), col("k"))
          .unionAll(c.exceptAll(su).select(lit("cust_only").as("tag"), col("k")))
          .orderBy(col("tag"), col("k"))
      },
      Some("""SELECT 'both' AS tag, k FROM (
                SELECT DISTINCT c_nationkey AS k FROM customer
                INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
              UNION ALL
              SELECT 'cust_only' AS tag, k FROM (
                SELECT DISTINCT c_nationkey AS k FROM customer
                EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
              ORDER BY tag, k""")),

    // JSON path extraction from the events.props payload.
    QEntry("q13_json_extract",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k_val"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
              FROM events
              ORDER BY event_id""")),

    // Tumbling-hour window aggregation (batch twin of the Structured
    // Streaming profile in graft.streaming): exact integer hour buckets.
    QEntry("q14_events_window",
      (s, d) => Tables.events(s, d)
        .select(expr("(ts div 1000) div 3600000000").as("hour_bucket"),
          col("event_type"), col("value"))
        .groupBy(col("hour_bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
        .orderBy(col("hour_bucket"), col("event_type")),
      Some("""SELECT epoch_us(ts) // 3600000000 AS hour_bucket, event_type,
               count(*) AS n,
               CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_cents
              FROM events
              GROUP BY 1, 2
              ORDER BY hour_bucket, event_type""")),

    // O4/O5: deterministic head-N sample, aggregated.
    QEntry("q15_sample_head",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_orderkey")).limit(100)
        .agg(count(lit(1)).as("n"),
          sum(cents(col("o_totalprice"))).as("sum_cents"),
          min(col("o_orderkey")).as("min_key"),
          max(col("o_orderkey")).as("max_key")),
      Some("""SELECT count(*) AS n,
               CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS sum_cents,
               min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
              FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 100)""")),

    // O6/D1: row→(column,value) transpose + per-column stats, one pass.
    QEntry("q16_transpose_stats",
      (s, d) => Tables.customer(s, d)
        .filter(col("c_custkey") < 100)
        .select(explode(array(
          struct(lit("c_name").as("col_name"), col("c_name").cast("string").as("value")),
          struct(lit("c_mktsegment").as("col_name"), col("c_mktsegment").cast("string").as("value")),
          struct(lit("c_nationkey").as("col_name"), col("c_nationkey").cast("string").as("value"))
        )).as("p"))
        .select(col("p.col_name").as("col_name"), col("p.value").as("value"))
        .groupBy(col("col_name"))
        .agg(count(lit(1)).as("n"), countDistinct(col("value")).as("n_distinct"))
        .orderBy(col("col_name")),
      Some("""SELECT col_name, count(*) AS n, count(DISTINCT value) AS n_distinct
              FROM (
                SELECT 'c_name' AS col_name, CAST(c_name AS VARCHAR) AS value
                  FROM customer WHERE c_custkey < 100
                UNION ALL
                SELECT 'c_mktsegment', CAST(c_mktsegment AS VARCHAR)
                  FROM customer WHERE c_custkey < 100
                UNION ALL
                SELECT 'c_nationkey', CAST(c_nationkey AS VARCHAR)
                  FROM customer WHERE c_custkey < 100)
              GROUP BY col_name
              ORDER BY col_name"""))
  )
}
