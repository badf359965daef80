package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, sixth pack: privacy engineering (DP-shaped
  * noised release, k-anonymity audit), revenue concentration (Lorenz/
  * Pareto deciles), and graph partition quality (modularity of a
  * metadata partition over the co-purchase graph). Conventions
  * unchanged; the Laplace sampler uses hash-derived pseudo-noise (the
  * multimodal-stub precedent: real plumbing, deterministic stand-in
  * for the one genuinely random step, replayed exactly by the oracle).
  */
object Pipeline26 {

  val entries: Seq[QEntry] = Seq(

    // Differentially-private-SHAPED histogram release: per-type event
    // counts + Laplace(b = 1/eps = 2) noise via inverse-CDF transform
    // of a hash-uniform u in (0,1): noise = -b·sgn(u-1/2)·ln(1-2|u-1/2|).
    // u comes from md5(type) ppm (deterministic pseudo-noise — the
    // gate needs replayability; a production release swaps ONE
    // expression for a real sampler, every other part of the pipeline
    // is unchanged). ln rounded once to micro-nats from an exact
    // integer ratio. Scale shape: one keyed agg to the type dimension;
    // the noise column is a zero-shuffle projection.
    QEntry("q251_dp_noised_release",
      (s, d) => {
        val cnt = Tables.events(s, d)
          .groupBy(col("event_type")).agg(count(lit(1)).as("n_true"))
        cnt
          .withColumn("u_ppm",
            conv(substring(md5(concat(col("event_type"), lit(":dp"))),
              1, 8), 16, 10).cast("long") % 999999 + 1)
          .withColumn("t_ppm", abs(lit(2L) * col("u_ppm") - 1000000L))
          .withColumn("noise_micro", expr(
            "CAST(round(-2.0 * sign(CAST(2 * u_ppm - 1000000 AS DOUBLE)) " +
              "* ln((1000000.0 - t_ppm) / 1000000.0) * 1e6) AS BIGINT)"))
          .select(col("event_type"), col("n_true"), col("noise_micro"),
            (col("n_true") * 1000000L + col("noise_micro"))
              .as("released_micro"),
            abs(col("noise_micro")).as("err_micro"))
          .orderBy(col("event_type"))
      },
      Some("""WITH cnt AS (
                SELECT event_type, count(*) AS n_true
                FROM events GROUP BY 1),
              nz AS (
                SELECT event_type, n_true,
                  ('0x' || substr(md5(event_type || ':dp'), 1, 8))
                    ::BIGINT % 999999 + 1 AS u_ppm
                FROM cnt),
              t AS (
                SELECT *, abs(2 * u_ppm - 1000000) AS t_ppm FROM nz),
              n AS (
                SELECT event_type, n_true,
                  CAST(round(-2.0 * sign(CAST(2 * u_ppm - 1000000
                    AS DOUBLE)) * ln((1000000.0 - t_ppm) / 1000000.0)
                    * 1e6) AS BIGINT) AS noise_micro
                FROM t)
              SELECT event_type, CAST(n_true AS BIGINT) AS n_true,
                noise_micro,
                CAST(n_true * 1000000 + noise_micro AS BIGINT)
                  AS released_micro,
                CAST(abs(noise_micro) AS BIGINT) AS err_micro
              FROM n ORDER BY event_type""")),

    // k-anonymity audit over the quasi-identifier (nation, $2k account
    // balance bucket): the re-identification risk census a privacy
    // review runs before any data share. Group-size histogram plus the
    // partition-level k (minimum group size) and the share of rows in
    // groups below the k=5 policy line. Scale shape: one keyed agg to
    // the QI dimension, a second to its size histogram; both bounded
    // by the QI value space, never corpus rows.
    QEntry("q252_k_anonymity",
      (s, d) => {
        val groups = Tables.customer(s, d)
          .select(col("c_nationkey"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT) div 200000")
              .as("bal_bucket"))
          .groupBy(col("c_nationkey"), col("bal_bucket"))
          .agg(count(lit(1)).as("gsize"))
          .localCheckpoint() // QI dimension feeds histogram + summary
        val hist = groups.groupBy(col("gsize"))
          .agg(count(lit(1)).as("n_groups"),
            sum(col("gsize")).as("n_rows"))
        val summary = groups.agg(
          min(col("gsize")).as("k_anonymity"),
          sum(col("gsize")).as("total_rows"),
          sum(when(col("gsize") < 5, col("gsize")).otherwise(0L))
            .as("risky_rows"))
          .select(col("k_anonymity"), col("total_rows"), col("risky_rows"),
            expr("(risky_rows * 10000) div total_rows").as("risky_bp"))
        hist.crossJoin(broadcast(summary))
          .select(col("gsize"), col("n_groups"), col("n_rows"),
            col("k_anonymity"), col("risky_rows"), col("risky_bp"))
          .orderBy(col("gsize"))
      },
      Some("""WITH g AS (
                SELECT c_nationkey,
                  CAST(round(c_acctbal * 100) AS BIGINT) // 200000
                    AS bal_bucket,
                  count(*) AS gsize
                FROM customer GROUP BY 1, 2),
              hist AS (
                SELECT gsize, count(*) AS n_groups, sum(gsize) AS n_rows
                FROM g GROUP BY gsize),
              sm AS (
                SELECT min(gsize) AS k_anonymity,
                  sum(gsize) AS total_rows,
                  sum(CASE WHEN gsize < 5 THEN gsize ELSE 0 END)
                    AS risky_rows
                FROM g)
              SELECT CAST(gsize AS BIGINT) AS gsize,
                CAST(n_groups AS BIGINT) AS n_groups,
                CAST(n_rows AS BIGINT) AS n_rows,
                CAST(sm.k_anonymity AS BIGINT) AS k_anonymity,
                CAST(sm.risky_rows AS BIGINT) AS risky_rows,
                CAST((sm.risky_rows * 10000) // sm.total_rows AS BIGINT)
                  AS risky_bp
              FROM hist, sm ORDER BY gsize""")),

    // Revenue Lorenz/Pareto deciles: customers ranked by revenue
    // (descending) via two-pass GlobalCumSum over the (revenue,
    // custkey) order — no corpus sort funnel — then folded into 10
    // rank deciles with per-decile and cumulative revenue shares in
    // bp. The "top 10% of customers carry X% of revenue" card, exact.
    QEntry("q253_revenue_pareto",
      (s, d) => {
        val rev = Tables.orders(s, d)
          .groupBy(col("o_custkey"))
          .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))")
            .as("rev"))
        val ranked = graft.operators.GlobalCumSum
          .runningSum(rev.withColumn("neg", -col("rev")),
            lit(1L), "rk", col("neg"), col("o_custkey"))
        val tot = rev.agg(count(lit(1)).as("n"), sum(col("rev")).as("tr"))
        val dec = ranked.crossJoin(broadcast(tot))
          .withColumn("decile", expr("((rk - 1) * 10) div n"))
          .groupBy(col("decile"))
          .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("rev"),
            max(col("tr")).as("tr"))
          .withColumn("share_bp", expr("(rev * 10000) div tr"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("decile")) // 10-row decile dimension
        dec
          .withColumn("cum_share_bp",
            expr("sum(rev) OVER (ORDER BY decile ROWS BETWEEN " +
              "UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 div tr"))
          .select(col("decile"), col("n_customers"), col("rev")
            .as("rev_cents"), col("share_bp"), col("cum_share_bp"))
          .orderBy(col("decile"))
      },
      Some("""WITH rev AS (
                SELECT o_custkey,
                  sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev
                FROM orders GROUP BY 1),
              ranked AS (
                SELECT *, row_number() OVER (ORDER BY rev DESC,
                  o_custkey) AS rk
                FROM rev),
              tot AS (SELECT count(*) AS n, sum(rev) AS tr FROM rev),
              dec AS (
                SELECT ((rk - 1) * 10) // tot.n AS decile,
                  count(*) AS n_customers, sum(rev) AS rev,
                  max(tot.tr) AS tr
                FROM ranked, tot GROUP BY 1)
              SELECT CAST(decile AS BIGINT) AS decile,
                CAST(n_customers AS BIGINT) AS n_customers,
                CAST(rev AS BIGINT) AS rev_cents,
                CAST((rev * 10000) // tr AS BIGINT) AS share_bp,
                CAST(sum(rev) OVER (ORDER BY decile ROWS BETWEEN
                  UNBOUNDED PRECEDING AND CURRENT ROW) * 10000 // tr
                  AS BIGINT) AS cum_share_bp
              FROM dec ORDER BY decile""")),

    // Modularity of the BRAND partition over the co-purchase graph
    // (q241's support >= 3 pair edges): Q = sum_c [e_c/m - (d_c/2m)^2]
    // in ppm with per-community integer divs (order-independent sums)
    // — "do baskets cluster within brands?" answered exactly. The
    // graph-quality eval that closes the graph family (components,
    // PageRank, HITS, k-core, triangles, label-prop → partition
    // SCORING). Scale shape: edges from the bounded basket self-join;
    // everything after lives on the edge/brand dimensions.
    QEntry("q254_graph_modularity",
      (s, d) => {
        val li = Tables.load(s, d, "lineitem")
          .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
          .distinct()
        val pairs = li.alias("a")
          .join(li.alias("b"),
            col("b.o") === col("a.o") && col("b.p") > col("a.p"))
          .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
          .agg(count(lit(1)).as("cab"))
          .filter(col("cab") >= 3)
          .select(col("pa"), col("pb"))
          .localCheckpoint() // edge dim feeds m, degrees, intra census
        val brand = Tables.part(s, d)
          .select(col("p_partkey"), col("p_brand"))
        val withBrands = pairs
          .join(brand.select(col("p_partkey").as("pa"),
            col("p_brand").as("ba")), "pa")
          .join(brand.select(col("p_partkey").as("pb"),
            col("p_brand").as("bb")), "pb")
        val m = pairs.agg(count(lit(1)).as("m"))
        val intra = withBrands.filter(col("ba") === col("bb"))
          .groupBy(col("ba").as("c")).agg(count(lit(1)).as("e_c"))
        val deg = withBrands
          .select(col("ba").as("c")).unionByName(
            withBrands.select(col("bb").as("c")))
          .groupBy(col("c")).agg(count(lit(1)).as("d_c"))
        val terms = deg.join(intra, Seq("c"), "left")
          .crossJoin(broadcast(m))
          .select(col("c"),
            expr("(coalesce(e_c, 0) * 1000000) div m").as("e_term"),
            expr("(d_c * d_c * 1000000) div (4 * m * m)").as("d_term"))
        terms.agg(count(lit(1)).as("n_communities"),
            sum(col("e_term")).as("se"), sum(col("d_term")).as("sd"))
          .crossJoin(broadcast(m))
          .select(col("n_communities"), col("m").as("m_edges"),
            col("se").as("intra_ppm"),
            (col("se") - col("sd")).as("q_ppm"))
      },
      Some("""WITH li AS (
                SELECT DISTINCT l_orderkey AS o, l_partkey AS p
                FROM lineitem),
              pairs AS (
                SELECT a.p AS pa, b.p AS pb
                FROM li a JOIN li b ON b.o = a.o AND b.p > a.p
                GROUP BY 1, 2 HAVING count(*) >= 3),
              wb AS (
                SELECT p1.p_brand AS ba, p2.p_brand AS bb
                FROM pairs
                JOIN part p1 ON p1.p_partkey = pairs.pa
                JOIN part p2 ON p2.p_partkey = pairs.pb),
              m AS (SELECT count(*) AS m FROM pairs),
              intra AS (
                SELECT ba AS c, count(*) AS e_c FROM wb
                WHERE ba = bb GROUP BY 1),
              deg AS (
                SELECT c, count(*) AS d_c FROM (
                  SELECT ba AS c FROM wb
                  UNION ALL SELECT bb FROM wb) GROUP BY 1),
              terms AS (
                SELECT deg.c,
                  (coalesce(intra.e_c, 0) * 1000000) // m.m AS e_term,
                  (deg.d_c * deg.d_c * 1000000) // (4 * m.m * m.m)
                    AS d_term
                FROM deg LEFT JOIN intra ON intra.c = deg.c
                CROSS JOIN m)
              SELECT CAST(count(*) AS BIGINT) AS n_communities,
                CAST(max(m.m) AS BIGINT) AS m_edges,
                CAST(sum(e_term) AS BIGINT) AS intra_ppm,
                CAST(sum(e_term) - sum(d_term) AS BIGINT) AS q_ppm
              FROM terms, m"""))
  )
}
