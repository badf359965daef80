package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, eleventh pack: the join-skew advisor (degree
  * diagnostics + recommended salt factor), embedding whitening
  * statistics, personalized PageRank, and a data-quality expectation
  * suite. Conventions unchanged.
  */
object Pipeline31 {

  val entries: Seq[QEntry] = Seq(

    // Join-skew advisor: the pre-flight a pipeline runs before a big
    // join — the build-side key degree distribution (p50/p99/max via
    // the q206 cum-block discipline on the degree DIMENSION), the
    // skew ratio, and the salt factor q68's salted join would need
    // (max degree over p50, the "spread the hot key over this many
    // reducers" number). One keyed agg to degrees; everything after is
    // dimension-sized.
    QEntry("q271_skew_advisor",
      (s, d) => {
        val deg = Tables.lineitem(s, d)
          .groupBy(col("l_partkey")).agg(count(lit(1)).as("deg"))
        // degree-DIMENSION contract, guarded (VERDICT r11 item 4): the
        // distinct-degree frame must stay one-task-sortable.
        val dim = graft.pipeline.Stats.boundedDim(
          deg.groupBy(col("deg")).agg(count(lit(1)).as("cnt")),
          "q271_skew_advisor degree dimension")
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("deg"))
        val cum = dim
          .withColumn("cum", sum(col("cnt")).over(w.rowsBetween(
            org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)))
          .withColumn("n", sum(col("cnt")).over(
            org.apache.spark.sql.expressions.Window.partitionBy(lit(1))))
        cum.agg(max(col("n")).as("n_keys"),
            min(when(col("cum") >= expr("(n + 1) div 2"), col("deg")))
              .as("p50_deg"),
            min(when(col("cum") * 100 >= expr("n * 99"), col("deg")))
              .as("p99_deg"),
            max(col("deg")).as("max_deg"))
          .select(col("n_keys"), col("p50_deg"), col("p99_deg"),
            col("max_deg"),
            expr("(max_deg * 100) div p50_deg").as("skew_ratio_centi"),
            expr("greatest(1L, (max_deg + p50_deg - 1) div p50_deg)")
              .as("recommended_salt"))
      },
      Some("""WITH deg AS (
                SELECT l_partkey, count(*) AS deg
                FROM lineitem GROUP BY 1),
              dim AS (
                SELECT deg, count(*) AS cnt FROM deg GROUP BY deg),
              cum AS (
                SELECT *, sum(cnt) OVER (ORDER BY deg
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum,
                  sum(cnt) OVER () AS n
                FROM dim)
              SELECT CAST(max(n) AS BIGINT) AS n_keys,
                CAST(min(CASE WHEN cum >= (n + 1) // 2 THEN deg END)
                  AS BIGINT) AS p50_deg,
                CAST(min(CASE WHEN cum * 100 >= n * 99 THEN deg END)
                  AS BIGINT) AS p99_deg,
                CAST(max(deg) AS BIGINT) AS max_deg,
                CAST((max(deg) * 100) //
                  min(CASE WHEN cum >= (n + 1) // 2 THEN deg END)
                  AS BIGINT) AS skew_ratio_centi,
                CAST(greatest(1, (max(deg) +
                  min(CASE WHEN cum >= (n + 1) // 2 THEN deg END) - 1) //
                  min(CASE WHEN cum >= (n + 1) // 2 THEN deg END))
                  AS BIGINT) AS recommended_salt
              FROM cum""")),

    // Embedding whitening statistics: per-dimension mean (exact
    // integer quantized units) and variance (the integer pair
    // n·SS - S² over n²-scale), with the rounded standard deviation in
    // milli — the table a whitening/normalization layer is built from,
    // computed in ONE corpus pass onto the 64-row dim frame (posexplode
    // + keyed agg, map-side combinable at any corpus size). Overflow
    // note: the raw n·SS pair holds to ~1e6 vectors at this quantize
    // scale; beyond that a deployment switches to the q235 centered
    // deviations (shift-invariant variance) — same discipline.
    QEntry("q272_whitening_stats",
      (s, d) => {
        val dims = Tables.embeddings(s, d)
          .select(posexplode(
            graft.pipeline.Similarity.quantize(col("embedding")))
            .as(Seq("i", "v")))
          .groupBy(col("i"))
          .agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
            sum(col("v") * col("v")).as("ss"))
        dims
          .select(col("i").cast("long").as("dim"), col("n"),
            expr("s div n").as("mean_q"),
            expr("(n * ss - s * s) div (n * n)").as("var_q"),
            expr("CAST(round(sqrt(CAST((n * ss - s * s) AS DOUBLE) / " +
              "(CAST(n AS DOUBLE) * n)) * 1000) AS BIGINT)")
              .as("sd_milli"))
          .orderBy(col("dim"))
      },
      Some("""WITH qz AS (
                SELECT list_transform(embedding, v -> CAST(round(
                  CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              dims AS (
                SELECT i, count(*) AS n, sum(qe[i+1]) AS s,
                  sum(qe[i+1] * qe[i+1]) AS ss
                FROM qz, range(64) r(i) GROUP BY i)
              SELECT CAST(i AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
                CAST(s // n AS BIGINT) AS mean_q,
                CAST((n * ss - s * s) // (n * n) AS BIGINT) AS var_q,
                CAST(round(sqrt(CAST((n * ss - s * s) AS DOUBLE) /
                  (CAST(n AS DOUBLE) * n)) * 1000) AS BIGINT)
                  AS sd_milli
              FROM dims ORDER BY dim""")),

    // Personalized PageRank: the q178 derived link graph, but the 15%
    // restart mass teleports only to the doc_id % 50 = 0 seed set —
    // relevance TO THE SEEDS ("similar pages to these", seed-expanded
    // crawl frontiers) instead of global authority. Same integer
    // per-edge floors, same per-round checkpoint; top 25 by rank.
    QEntry("q273_ppr",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
          .localCheckpoint()
        val n = docs.count()
        // (d·d) mod n == ((d mod n)·(d mod n)) mod n — oracle-identical,
        // but survives replica-scale ids (the q178 sf≈10 overflow)
        val m = pmod(col("doc_id"), lit(n))
        val edges = docs.select(col("doc_id").as("src"),
            ((m * 7 + 1) % n).as("dst"))
          .union(docs.select(col("doc_id"), (m * m) % n))
          .union(docs.select(col("doc_id"), expr("doc_id div 2")))
        val seeds = docs.filter(col("doc_id") % 50 === 0)
          .select(col("doc_id").as("id"))
        graft.operators.PageRank.runPersonalized(
            edges, docs.select(col("doc_id").as("id")), seeds, iters = 3)
          .select(col("id").as("doc_id"), col("pr").as("ppr_units"))
          .orderBy(col("ppr_units").desc, col("doc_id"))
          .limit(25)
      },
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
              ns AS (SELECT count(*) AS k FROM documents
                WHERE doc_id % 50 = 0),
              e0 AS (
                SELECT doc_id AS src,
                  (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
                FROM documents
                UNION
                SELECT doc_id,
                  (doc_id * doc_id) % (SELECT n FROM nn)
                FROM documents
                UNION
                SELECT doc_id, doc_id // 2 FROM documents),
              e AS (SELECT src, dst FROM e0 WHERE src <> dst),
              od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
              p0 AS (
                SELECT doc_id AS id,
                  CASE WHEN doc_id % 50 = 0
                    THEN 1000000000000 // (SELECT k FROM ns)
                    ELSE 0 END AS pr
                FROM documents),
              c1 AS (
                SELECT e.dst, sum((p0.pr * 85) // (100 * od.od)) AS cs
                FROM e JOIN od USING (src) JOIN p0 ON p0.id = e.src
                GROUP BY e.dst),
              p1 AS (
                SELECT d.doc_id AS id,
                  CASE WHEN d.doc_id % 50 = 0 THEN
                    (1000000000000 * 15) // (100 * (SELECT k FROM ns))
                    ELSE 0 END + coalesce(c1.cs, 0) AS pr
                FROM documents d LEFT JOIN c1 ON c1.dst = d.doc_id),
              c2 AS (
                SELECT e.dst, sum((p1.pr * 85) // (100 * od.od)) AS cs
                FROM e JOIN od USING (src) JOIN p1 ON p1.id = e.src
                GROUP BY e.dst),
              p2 AS (
                SELECT d.doc_id AS id,
                  CASE WHEN d.doc_id % 50 = 0 THEN
                    (1000000000000 * 15) // (100 * (SELECT k FROM ns))
                    ELSE 0 END + coalesce(c2.cs, 0) AS pr
                FROM documents d LEFT JOIN c2 ON c2.dst = d.doc_id),
              c3 AS (
                SELECT e.dst, sum((p2.pr * 85) // (100 * od.od)) AS cs
                FROM e JOIN od USING (src) JOIN p2 ON p2.id = e.src
                GROUP BY e.dst),
              p3 AS (
                SELECT d.doc_id AS id,
                  CASE WHEN d.doc_id % 50 = 0 THEN
                    (1000000000000 * 15) // (100 * (SELECT k FROM ns))
                    ELSE 0 END + coalesce(c3.cs, 0) AS pr
                FROM documents d LEFT JOIN c3 ON c3.dst = d.doc_id)
              SELECT id AS doc_id, CAST(pr AS BIGINT) AS ppr_units
              FROM p3 ORDER BY ppr_units DESC, doc_id LIMIT 25""")),

    // Data-quality expectation suite over the orders landing table —
    // the Great-Expectations-style contract check: uniqueness, FK
    // integrity, range, domain membership, null rate — one row per
    // expectation with violation counts. Each check is a keyed agg or
    // broadcast/anti join; the report is a handful of union'd scalars.
    QEntry("q274_dq_report",
      (s, d) => {
        val o = Tables.orders(s, d).localCheckpoint()
        val n = o.count()
        def row(name: String, violations: org.apache.spark.sql.DataFrame) =
          violations.select(lit(name).as("expectation"),
            col("v").as("n_violations"), lit(n).as("n_rows"),
            (col("v") === 0).cast("long").as("pass"))
        val unique = row("a_orderkey_unique",
          o.agg((count(lit(1)) - countDistinct(col("o_orderkey")))
            .as("v")))
        val fk = row("b_custkey_fk",
          o.join(Tables.customer(s, d)
              .select(col("c_custkey").as("o_custkey")),
            Seq("o_custkey"), "left_anti")
            .agg(count(lit(1)).as("v")))
        val range = row("c_totalprice_range",
          o.agg(sum((col("o_totalprice") <= 0 ||
            col("o_totalprice") > 600000).cast("long")).as("v")))
        val dom = row("d_priority_domain",
          o.agg(sum((!col("o_orderpriority").isin("1-URGENT", "2-HIGH",
            "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")).cast("long"))
            .as("v")))
        val nulls = row("e_no_nulls",
          o.agg(sum((col("o_orderkey").isNull ||
            col("o_custkey").isNull || col("o_totalprice").isNull ||
            col("o_orderdate").isNull).cast("long")).as("v")))
        val dates = row("f_orderdate_range",
          o.agg(sum((col("o_orderdate") < "1992-01-01" ||
            col("o_orderdate") > "1998-12-31").cast("long")).as("v")))
        unique.unionByName(fk).unionByName(range).unionByName(dom)
          .unionByName(nulls).unionByName(dates)
          .orderBy(col("expectation"))
      },
      Some("""WITH n AS (SELECT count(*) AS n FROM orders),
              checks AS (
                SELECT 'a_orderkey_unique' AS expectation,
                  (SELECT count(*) - count(DISTINCT o_orderkey)
                   FROM orders) AS v
                UNION ALL
                SELECT 'b_custkey_fk',
                  (SELECT count(*) FROM orders o
                   WHERE NOT EXISTS (SELECT 1 FROM customer c
                     WHERE c.c_custkey = o.o_custkey))
                UNION ALL
                SELECT 'c_totalprice_range',
                  (SELECT count(*) FROM orders
                   WHERE o_totalprice <= 0 OR o_totalprice > 600000)
                UNION ALL
                SELECT 'd_priority_domain',
                  (SELECT count(*) FROM orders
                   WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH',
                     '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW'))
                UNION ALL
                SELECT 'e_no_nulls',
                  (SELECT count(*) FROM orders
                   WHERE o_orderkey IS NULL OR o_custkey IS NULL
                     OR o_totalprice IS NULL OR o_orderdate IS NULL)
                UNION ALL
                SELECT 'f_orderdate_range',
                  (SELECT count(*) FROM orders
                   WHERE CAST(o_orderdate AS VARCHAR) < '1992-01-01'
                     OR CAST(o_orderdate AS VARCHAR) > '1998-12-31'))
              SELECT expectation, CAST(v AS BIGINT) AS n_violations,
                CAST(n.n AS BIGINT) AS n_rows,
                CAST(CASE WHEN v = 0 THEN 1 ELSE 0 END AS BIGINT)
                  AS pass
              FROM checks, n ORDER BY expectation"""))
  )
}
