package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, twelfth batch — distribution-free guarantees and
  * join planning:
  *  - q324: split-conformal prediction thresholds for the linear probe
  *    (the finite-sample ⌈(n+1)(1−α)⌉ quantile, exact integer ranks on
  *    the residual dimension) with held-out coverage readout;
  *  - q325: join-strategy advisor — per join, the broadcast / salted /
  *    plain-shuffle recommendation from measured sizes and key skew,
  *    i.e. the rules this suite applies by hand, as a queryable table.
  */
object Pipeline48 {

  val entries: Seq[QEntry] = Seq(

    // Split-conformal thresholds: calibration split vec_id % 3 = 0,
    // nonconformity = |normalized probe confidence − y·1e6| in ppm
    // (exact integers — the q249 normalization). For α ∈ {10%, 5%}
    // the threshold is the k-th smallest calibration residual with
    // k = ⌈(n_cal+1)(1−α)⌉ — computed on the residual-VALUE dimension
    // via one cumulative count (two-pass GlobalCumSum), no corpus
    // sort. The held-out split then reads empirical coverage, the
    // ≥ 1−α finite-sample guarantee this construction carries.
    QEntry("q324_conformal_threshold",
      (s, d) => {
        val scored = Pipeline25.probeScores(s, d)
          .withColumn("cal", (col("vec_id") % 3 === 0).cast("int"))
        val mm = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        val resid = scored.crossJoin(broadcast(mm))
          .withColumn("conf_ppm",
            expr("((s - lo) * 1000000) div (hi - lo)"))
          .withColumn("r", abs(col("conf_ppm") - col("y") * 1000000L))
          .localCheckpoint() // feeds the dim, n_cal, and coverage
        val dim = resid.filter(col("cal") === 1)
          .groupBy(col("r")).agg(count(lit(1)).as("cnt"))
        val cum = graft.operators.GlobalCumSum
          .runningSum(dim, col("cnt"), "cum", col("r"))
          .localCheckpoint() // residual-value dim, probed per alpha
        val nCal = resid.filter(col("cal") === 1)
          .agg(count(lit(1)).as("n_cal"))
        import s.implicits._
        val alphas = Seq(100000L, 50000L).toDF("alpha_ppm")
        val k = broadcast(alphas).crossJoin(broadcast(nCal))
          .withColumn("k",
            expr("((n_cal + 1) * (1000000 - alpha_ppm) + 999999) " +
              "div 1000000"))
        // qhat: smallest residual value whose cumulative count reaches k
        // (k can exceed n_cal at small alpha: threshold = +inf — report
        // the max residual and full coverage, the standard convention)
        val qhat = k.join(cum, col("cum") >= col("k"), "left")
          .groupBy(col("alpha_ppm"), col("n_cal"), col("k"))
          .agg(min(col("r")).as("qhat_raw"))
          .crossJoin(broadcast(resid.agg(max(col("r")).as("rmax"))))
          .select(col("alpha_ppm"), col("n_cal"), col("k"),
            coalesce(col("qhat_raw"), col("rmax")).as("qhat_ppm"))
        val cov = resid.filter(col("cal") === 0)
          .crossJoin(broadcast(qhat.select(col("alpha_ppm").as("a2"),
            col("qhat_ppm").as("q2"))))
          .groupBy(col("a2"))
          .agg(count(lit(1)).as("n_test"),
            sum((col("r") <= col("q2")).cast("long")).as("covered"))
        qhat.join(cov, col("alpha_ppm") === col("a2"))
          .select(col("alpha_ppm"), col("n_cal"), col("k"),
            col("qhat_ppm"), col("n_test"),
            expr("covered * 1000000 div n_test").as("coverage_ppm"))
          .orderBy(col("alpha_ppm"))
      },
      Some(s"""WITH ${Pipeline25.ProbeSql},
              mm AS (SELECT min(s) AS lo, max(s) AS hi FROM scored),
              resid AS (
                SELECT CASE WHEN vec_id % 3 = 0 THEN 1 ELSE 0 END AS cal,
                  abs(((s - mm.lo) * 1000000) // (mm.hi - mm.lo)
                    - y * 1000000) AS r
                FROM scored, mm),
              dim AS (
                SELECT r, count(*) AS cnt,
                  sum(count(*)) OVER (ORDER BY r
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM resid WHERE cal = 1 GROUP BY r),
              nc AS (SELECT count(*) AS n_cal FROM resid WHERE cal = 1),
              al AS (SELECT CAST(unnest([100000, 50000]) AS BIGINT)
                       AS alpha_ppm),
              kk AS (
                SELECT alpha_ppm, n_cal,
                  ((n_cal + 1) * (1000000 - alpha_ppm) + 999999)
                    // 1000000 AS k
                FROM al, nc),
              qh AS (
                SELECT kk.alpha_ppm, kk.n_cal, kk.k,
                  coalesce(min(dim.r) FILTER (WHERE dim.cum >= kk.k),
                    (SELECT max(r) FROM resid)) AS qhat_ppm
                FROM kk LEFT JOIN dim ON dim.cum >= kk.k
                GROUP BY 1, 2, 3),
              cov AS (
                SELECT qh.alpha_ppm, count(*) AS n_test,
                  sum(CASE WHEN resid.r <= qh.qhat_ppm THEN 1 ELSE 0 END)
                    AS covered
                FROM qh, resid WHERE resid.cal = 0 GROUP BY 1)
              SELECT qh.alpha_ppm, CAST(qh.n_cal AS BIGINT) AS n_cal,
                CAST(qh.k AS BIGINT) AS k,
                CAST(qh.qhat_ppm AS BIGINT) AS qhat_ppm,
                CAST(cov.n_test AS BIGINT) AS n_test,
                CAST(cov.covered * 1000000 // cov.n_test AS BIGINT)
                  AS coverage_ppm
              FROM qh JOIN cov USING (alpha_ppm)
              ORDER BY qh.alpha_ppm""")),

    // Join-strategy advisor: for each fact⋈dim join in the schema,
    // measure both sides and the build-side key skew, then emit the
    // recommendation this suite's own operators encode by hand —
    // broadcast when the build side is small (the AQE
    // autoBroadcastJoinThreshold call, here as a row bound), salted
    // two-phase when the probe side's hottest key holds >5% of rows
    // (the q45/q68 transition), plain shuffle otherwise. The planner
    // the 100 TB version reads before picking a physical join.
    QEntry("q325_join_advisor",
      (s, d) => {
        def side(df: org.apache.spark.sql.DataFrame, key: String,
            join: String, fact: String) = {
          val keyed = df.select(col(key).cast("long").as("k"))
          val n = keyed.agg(count(lit(1)).as("probe_rows"))
          val hot = keyed.groupBy(col("k")).agg(count(lit(1)).as("c"))
            .agg(max(col("c")).as("hot"), count(lit(1)).as("build_keys"))
          n.crossJoin(broadcast(hot))
            .select(lit(join).as("join_id"), lit(fact).as("probe"),
              col("probe_rows"), col("build_keys"), col("hot"))
        }
        val sides = Seq(
          side(Tables.orders(s, d), "o_custkey",
            "orders_customer", "orders"),
          side(Tables.lineitem(s, d), "l_orderkey",
            "lineitem_orders", "lineitem"),
          side(Tables.lineitem(s, d), "l_partkey",
            "lineitem_part", "lineitem"),
          side(Tables.events(s, d), "user_id",
            "events_users", "events")).reduce(_ union _)
        sides
          .withColumn("skew_ppm", expr("hot * 1000000 div probe_rows"))
          .withColumn("strategy",
            when(col("build_keys") <= 10000L, "broadcast")
              .when(col("skew_ppm") > 50000L, "salted_shuffle")
              .otherwise("shuffle"))
          .select(col("join_id"), col("probe"), col("probe_rows"),
            col("build_keys"), col("hot"), col("skew_ppm"),
            col("strategy"))
          .orderBy(col("join_id"))
      },
      Some("""WITH s1 AS (
                SELECT 'orders_customer' AS join_id, 'orders' AS probe,
                  count(*) AS probe_rows,
                  count(DISTINCT o_custkey) AS build_keys,
                  max(c) AS hot
                FROM (SELECT o_custkey, count(*) OVER
                        (PARTITION BY o_custkey) AS c FROM orders)),
              s2 AS (
                SELECT 'lineitem_orders', 'lineitem', count(*),
                  count(DISTINCT l_orderkey),
                  max(c)
                FROM (SELECT l_orderkey, count(*) OVER
                        (PARTITION BY l_orderkey) AS c FROM lineitem)),
              s3 AS (
                SELECT 'lineitem_part', 'lineitem', count(*),
                  count(DISTINCT l_partkey),
                  max(c)
                FROM (SELECT l_partkey, count(*) OVER
                        (PARTITION BY l_partkey) AS c FROM lineitem)),
              s4 AS (
                SELECT 'events_users', 'events', count(*),
                  count(DISTINCT user_id),
                  max(c)
                FROM (SELECT user_id, count(*) OVER
                        (PARTITION BY user_id) AS c FROM events)),
              u AS (
                SELECT * FROM s1 UNION ALL SELECT * FROM s2
                UNION ALL SELECT * FROM s3 UNION ALL SELECT * FROM s4)
              SELECT join_id, probe,
                CAST(probe_rows AS BIGINT) AS probe_rows,
                CAST(build_keys AS BIGINT) AS build_keys,
                CAST(hot AS BIGINT) AS hot,
                CAST(hot * 1000000 // probe_rows AS BIGINT) AS skew_ppm,
                CASE WHEN build_keys <= 10000 THEN 'broadcast'
                     WHEN hot * 1000000 // probe_rows > 50000
                       THEN 'salted_shuffle'
                     ELSE 'shuffle' END AS strategy
              FROM u ORDER BY join_id"""))
  )
}
