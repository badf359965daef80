package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, twelfth pack: the forecasting feature matrix
  * (multi-horizon lags + rolling stats + next-day target), per-user
  * behavioral entropy rate, degree assortativity of the co-purchase
  * graph, and the numeric-column correlation screen. Conventions
  * unchanged.
  */
object Pipeline33 {

  val entries: Seq[QEntry] = Seq(

    // Forecasting feature matrix: per (type, day) — lag-1, lag-7,
    // trailing-7 mean (integer centi), and the NEXT-day target the
    // model trains against; rows where every feature exists. The
    // standard supervised reshape of a series, built with four
    // type-partitioned windows on the (type, day) dimension — the
    // leakage discipline is structural (features strictly precede the
    // target).
    QEntry("q276_forecast_features",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type")).orderBy(col("day"))
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
        daily
          .withColumn("lag1", lag(col("cnt"), 1).over(w))
          .withColumn("lag7", lag(col("cnt"), 7).over(w))
          .withColumn("n7", count(lit(1)).over(w.rowsBetween(-7, -1)))
          .withColumn("sum7", sum(col("cnt")).over(w.rowsBetween(-7, -1)))
          .withColumn("target", lead(col("cnt"), 1).over(w))
          .filter(col("lag7").isNotNull && col("target").isNotNull &&
            col("n7") === 7)
          .select(col("event_type"), col("day"), col("cnt"),
            col("lag1"), col("lag7"),
            expr("(sum7 * 100) div 7").as("mean7_centi"),
            col("target"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              f AS (
                SELECT event_type, day, cnt,
                  lag(cnt, 1) OVER wt AS lag1,
                  lag(cnt, 7) OVER wt AS lag7,
                  count(*) OVER wr AS n7,
                  sum(cnt) OVER wr AS sum7,
                  lead(cnt, 1) OVER wt AS target
                FROM daily
                WINDOW wt AS (PARTITION BY event_type ORDER BY day),
                  wr AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
              SELECT event_type, CAST(day AS BIGINT) AS day,
                CAST(cnt AS BIGINT) AS cnt,
                CAST(lag1 AS BIGINT) AS lag1,
                CAST(lag7 AS BIGINT) AS lag7,
                CAST((sum7 * 100) // 7 AS BIGINT) AS mean7_centi,
                CAST(target AS BIGINT) AS target
              FROM f
              WHERE lag7 IS NOT NULL AND target IS NOT NULL AND n7 = 7
              ORDER BY event_type, day""")),

    // Behavioral entropy rate: per-user first-order (bigram
    // conditional) entropy of the event-type sequence in micro-nats —
    // H(next | current) = sum over transitions of
    // c_xy·round(1e6·ln(c_x·/c_xy)) div n. Low = predictable routine,
    // high = erratic (bot screens, UX research). Transitions from one
    // user-keyed lag; entropies on the per-user transition dimension
    // (<= 25 cells per user). Top 15 most erratic users.
    QEntry("q277_sequence_entropy",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("user_id"), col("prev"), col("event_type"))
          .agg(count(lit(1)).as("cxy"))
        val marg = trans.groupBy(col("user_id"), col("prev"))
          .agg(sum(col("cxy")).as("cx"))
        trans.join(marg, Seq("user_id", "prev"))
          .select(col("user_id"), col("cxy"),
            expr("cxy * CAST(round(ln(CAST(cx AS DOUBLE) / cxy) * 1e6) " +
              "AS BIGINT)").as("term"))
          .groupBy(col("user_id"))
          .agg(sum(col("cxy")).as("n_trans"),
            expr("sum(term) div sum(cxy)").as("entropy_unats"))
          .orderBy(col("entropy_unats").desc, col("user_id"))
          .limit(15)
      },
      Some("""WITH seq AS (
                SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
                FROM events),
              trans AS (
                SELECT user_id, prev, event_type, count(*) AS cxy
                FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2, 3),
              marg AS (
                SELECT user_id, prev, sum(cxy) AS cx
                FROM trans GROUP BY 1, 2)
              SELECT t.user_id, CAST(sum(t.cxy) AS BIGINT) AS n_trans,
                CAST(sum(t.cxy * CAST(round(ln(CAST(m.cx AS DOUBLE) /
                  t.cxy) * 1e6) AS BIGINT)) // sum(t.cxy) AS BIGINT)
                  AS entropy_unats
              FROM trans t JOIN marg m
                ON m.user_id = t.user_id AND m.prev = t.prev
              GROUP BY t.user_id
              ORDER BY entropy_unats DESC, t.user_id LIMIT 15""")),

    // Degree assortativity of the co-purchase graph (q241's support
    // >= 3 edges): the Pearson correlation between endpoint degrees
    // over directed edge ends, in ppm — "do popular parts co-sell with
    // popular parts". Exact integer moment sums on the edge dimension;
    // the one sqrt rounds once. Negative = hub-and-spoke, positive =
    // rich-club.
    QEntry("q278_assortativity",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val pairs = li.alias("a")
          .join(li.alias("b"),
            col("b.o") === col("a.o") && col("b.p") > col("a.p"))
          .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 3)
          .select(col("pa"), col("pb"))
          .localCheckpoint() // edge dim feeds degrees + moments
        val dirEnds = pairs.select(col("pa").as("x"), col("pb").as("y"))
          .unionByName(pairs.select(col("pb").as("x"), col("pa").as("y")))
        val deg = dirEnds.groupBy(col("x")).agg(count(lit(1)).as("d"))
        val ends = dirEnds
          .join(deg.select(col("x"), col("d").as("dx")), "x")
          .join(deg.select(col("x").as("y"), col("d").as("dy")), "y")
        ends.agg(count(lit(1)).as("m2"),
            coalesce(sum(col("dx")), lit(0L)).as("sx"),
            coalesce(sum(col("dy")), lit(0L)).as("sy"),
            coalesce(sum(col("dx") * col("dy")), lit(0L)).as("sxy"),
            coalesce(sum(col("dx") * col("dx")), lit(0L)).as("sxx"),
            coalesce(sum(col("dy") * col("dy")), lit(0L)).as("syy"))
          // zero-variance guard: at small SF the thresholded graph can
          // collapse to a few degree-1 edges — the correlation is then
          // undefined; report 0 instead of dividing by zero under ANSI
          .select(col("m2"),
            expr("CASE WHEN m2 * sxx - sx * sx > 0 AND " +
              "m2 * syy - sy * sy > 0 THEN " +
              "CAST(round((CAST(m2 AS DOUBLE) * sxy - " +
              "CAST(sx AS DOUBLE) * sy) / " +
              "(sqrt(CAST(m2 AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx) " +
              "* sqrt(CAST(m2 AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)) " +
              "* 1e6) AS BIGINT) ELSE 0L END").as("assortativity_ppm"))
      },
      Some("""WITH li AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
              pairs AS (
                SELECT a.p AS pa, b.p AS pb
                FROM li a JOIN li b ON b.o = a.o AND b.p > a.p
                GROUP BY 1, 2 HAVING count(*) >= 3),
              de AS (
                SELECT pa AS x, pb AS y FROM pairs
                UNION ALL SELECT pb, pa FROM pairs),
              deg AS (SELECT x, count(*) AS d FROM de GROUP BY x),
              ends AS (
                SELECT dx.d AS dx, dy.d AS dy
                FROM de JOIN deg dx ON dx.x = de.x
                JOIN deg dy ON dy.x = de.y),
              mo AS (
                SELECT count(*) AS m2, sum(dx) AS sx, sum(dy) AS sy,
                  sum(dx * dy) AS sxy, sum(dx * dx) AS sxx,
                  sum(dy * dy) AS syy
                FROM ends)
              SELECT CAST(m2 AS BIGINT) AS m2,
                CAST(CASE WHEN m2 * sxx - sx * sx > 0 AND
                    m2 * syy - sy * sy > 0 THEN
                  round((CAST(m2 AS DOUBLE) * sxy -
                    CAST(sx AS DOUBLE) * sy) /
                    (sqrt(CAST(m2 AS DOUBLE) * sxx -
                      CAST(sx AS DOUBLE) * sx) *
                     sqrt(CAST(m2 AS DOUBLE) * syy -
                      CAST(sy AS DOUBLE) * sy)) * 1e6)
                  ELSE 0 END AS BIGINT) AS assortativity_ppm
              FROM mo""")),

    // Numeric-column correlation screen over lineitem: pairwise
    // Pearson in ppm between quantity / extended price / discount /
    // tax (cents-integer columns), from ONE pass of exact integer
    // moment sums (each pair reuses the shared per-column sums; only
    // the cross-products are pair-specific). The profiler's "which
    // columns move together" report.
    QEntry("q279_column_correlation",
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .select(
            expr("CAST(l_quantity AS BIGINT)").as("c0"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100")
              .as("c1"),
            expr("CAST(round(l_discount * 100) AS BIGINT)").as("c2"),
            expr("CAST(round(l_tax * 100) AS BIGINT)").as("c3"))
        val m = base.agg(
          count(lit(1)).as("n"),
          sum(col("c0")).as("s0"), sum(col("c1")).as("s1"),
          sum(col("c2")).as("s2"), sum(col("c3")).as("s3"),
          sum(col("c0") * col("c0")).as("ss0"),
          sum(col("c1") * col("c1")).as("ss1"),
          sum(col("c2") * col("c2")).as("ss2"),
          sum(col("c3") * col("c3")).as("ss3"),
          sum(col("c0") * col("c1")).as("x01"),
          sum(col("c0") * col("c2")).as("x02"),
          sum(col("c0") * col("c3")).as("x03"),
          sum(col("c1") * col("c2")).as("x12"),
          sum(col("c1") * col("c3")).as("x13"),
          sum(col("c2") * col("c3")).as("x23"))
        def corr2(a: Int, b: Int) = expr(
          s"CAST(round((CAST(n AS DOUBLE) * x$a$b - " +
            s"CAST(s$a AS DOUBLE) * s$b) / " +
            s"(sqrt(CAST(n AS DOUBLE) * ss$a - CAST(s$a AS DOUBLE) * s$a) " +
            s"* sqrt(CAST(n AS DOUBLE) * ss$b - CAST(s$b AS DOUBLE) * s$b)) " +
            "* 1e6) AS BIGINT)")
        val names = Map(0 -> "quantity", 1 -> "price_dollars",
          2 -> "discount_pct", 3 -> "tax_pct")
        val rows = for ((a, b) <- Seq((0, 1), (0, 2), (0, 3), (1, 2),
          (1, 3), (2, 3))) yield
          m.select(lit(s"${names(a)}__${names(b)}").as("pair"),
            col("n"), corr2(a, b).as("corr_ppm"))
        rows.reduce(_.unionByName(_)).orderBy(col("pair"))
      },
      Some("""WITH base AS (
                SELECT CAST(l_quantity AS BIGINT) AS c0,
                  CAST(round(l_extendedprice * 100) AS BIGINT) // 100
                    AS c1,
                  CAST(round(l_discount * 100) AS BIGINT) AS c2,
                  CAST(round(l_tax * 100) AS BIGINT) AS c3
                FROM lineitem),
              m AS (
                SELECT count(*) AS n,
                  sum(c0) AS s0, sum(c1) AS s1, sum(c2) AS s2,
                  sum(c3) AS s3,
                  sum(c0*c0) AS ss0, sum(c1*c1) AS ss1,
                  sum(c2*c2) AS ss2, sum(c3*c3) AS ss3,
                  sum(c0*c1) AS x01, sum(c0*c2) AS x02,
                  sum(c0*c3) AS x03, sum(c1*c2) AS x12,
                  sum(c1*c3) AS x13, sum(c2*c3) AS x23
                FROM base),
              rows AS (
                SELECT 'quantity__price_dollars' AS pair, n,
                  (CAST(n AS DOUBLE) * x01 - CAST(s0 AS DOUBLE) * s1) /
                  (sqrt(CAST(n AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
                   * sqrt(CAST(n AS DOUBLE) * ss1 -
                     CAST(s1 AS DOUBLE) * s1)) AS r
                FROM m
                UNION ALL SELECT 'quantity__discount_pct', n,
                  (CAST(n AS DOUBLE) * x02 - CAST(s0 AS DOUBLE) * s2) /
                  (sqrt(CAST(n AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
                   * sqrt(CAST(n AS DOUBLE) * ss2 -
                     CAST(s2 AS DOUBLE) * s2)) FROM m
                UNION ALL SELECT 'quantity__tax_pct', n,
                  (CAST(n AS DOUBLE) * x03 - CAST(s0 AS DOUBLE) * s3) /
                  (sqrt(CAST(n AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
                   * sqrt(CAST(n AS DOUBLE) * ss3 -
                     CAST(s3 AS DOUBLE) * s3)) FROM m
                UNION ALL SELECT 'price_dollars__discount_pct', n,
                  (CAST(n AS DOUBLE) * x12 - CAST(s1 AS DOUBLE) * s2) /
                  (sqrt(CAST(n AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)
                   * sqrt(CAST(n AS DOUBLE) * ss2 -
                     CAST(s2 AS DOUBLE) * s2)) FROM m
                UNION ALL SELECT 'price_dollars__tax_pct', n,
                  (CAST(n AS DOUBLE) * x13 - CAST(s1 AS DOUBLE) * s3) /
                  (sqrt(CAST(n AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)
                   * sqrt(CAST(n AS DOUBLE) * ss3 -
                     CAST(s3 AS DOUBLE) * s3)) FROM m
                UNION ALL SELECT 'discount_pct__tax_pct', n,
                  (CAST(n AS DOUBLE) * x23 - CAST(s2 AS DOUBLE) * s3) /
                  (sqrt(CAST(n AS DOUBLE) * ss2 - CAST(s2 AS DOUBLE) * s2)
                   * sqrt(CAST(n AS DOUBLE) * ss3 -
                     CAST(s3 AS DOUBLE) * s3)) FROM m)
              SELECT pair, CAST(n AS BIGINT) AS n,
                CAST(round(r * 1e6) AS BIGINT) AS corr_ppm
              FROM rows ORDER BY pair"""))
  )
}
