package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-12 pack, fourth batch: time-series and graph diagnostics plus
  * ranking agreement — autocorrelation of the event arrival series
  * (q298), per-vertex clustering coefficients on the shared link graph
  * (q299), TextRank keyword extraction as integer-damped power
  * iteration on the word co-occurrence graph (q300), and rank-biased
  * overlap between two top-k rankings (q301). All follow the suite's
  * dimension discipline: the corpus is touched once per operator (one
  * keyed agg / one tokenize pass); everything downstream is
  * dimension-sized joins, so the shapes hold at 100 TB.
  */
object Pipeline40 {

  def entries: Seq[QEntry] = Seq(

    // Autocorrelation function of the per-(type, day) arrival counts at
    // lags 1..7 — the seasonality diagnostic run before trusting any
    // daily drift monitor (q240's CUSUM assumes exchangeable days; ACF
    // is the check). Integer-exact core: with n days and S total
    // events, dev_t = n·cnt_t − S (the mean-centered count scaled by
    // n), num_ℓ = Σ dev_t·dev_{t+ℓ}, den = Σ dev_t² — all int64 at
    // gate scale; the ratio alone is a rounded double. Lag alignment
    // is an equi-join on day+ℓ (gap-safe — missing days simply pair
    // nothing), never a window over the corpus.
    QEntry("q298_acf_daily",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // (type, day) dimension, feeds stats + both join sides
        val st = daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("cnt")).as("s"))
        val dev = daily.join(st, "event_type")
          .select(col("event_type"), col("day"),
            (col("cnt") * col("n") - col("s")).as("dev"))
          .localCheckpoint() // feeds den + both sides of the lag join
        val den = dev.groupBy(col("event_type"))
          .agg(sum(col("dev") * col("dev")).as("den"))
        val lags = s.range(1, 8).select(col("id").as("lag"))
        val num = dev.crossJoin(broadcast(lags))
          .join(dev.select(col("event_type"), col("day").as("day_b"),
            col("dev").as("dev_b")),
            Seq("event_type"))
          .filter(col("day_b") === col("day") + col("lag"))
          .groupBy(col("event_type"), col("lag"))
          .agg(sum(col("dev") * col("dev_b")).as("num"))
        st.select(col("event_type")).crossJoin(broadcast(lags))
          .join(num, Seq("event_type", "lag"), "left")
          .join(den, "event_type")
          .select(col("event_type"), col("lag"),
            coalesce(col("num"), lit(0L)).as("num"), col("den"),
            round(coalesce(col("num"), lit(0L)).cast("double") /
              col("den"), 6).as("acf"))
          .orderBy(col("event_type"), col("lag"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              st AS (
                SELECT event_type, count(*) AS n, sum(cnt) AS s
                FROM daily GROUP BY 1),
              dev AS (
                SELECT d.event_type, d.day, d.cnt * st.n - st.s AS dev
                FROM daily d JOIN st USING (event_type)),
              dn AS (
                SELECT event_type, sum(dev * dev) AS den
                FROM dev GROUP BY 1),
              lags AS (SELECT unnest(generate_series(1, 7)) AS lag),
              nm AS (
                SELECT a.event_type, l.lag, sum(a.dev * b.dev) AS num
                FROM dev a CROSS JOIN lags l
                JOIN dev b ON b.event_type = a.event_type
                 AND b.day = a.day + l.lag
                GROUP BY 1, 2)
              SELECT st.event_type, CAST(l.lag AS BIGINT) AS lag,
                CAST(coalesce(nm.num, 0) AS BIGINT) AS num,
                CAST(dn.den AS BIGINT) AS den,
                round(CAST(coalesce(nm.num, 0) AS DOUBLE) / dn.den, 6)
                  AS acf
              FROM st CROSS JOIN lags l
              LEFT JOIN nm ON nm.event_type = st.event_type
                AND nm.lag = l.lag
              JOIN dn ON dn.event_type = st.event_type
              ORDER BY st.event_type, lag""")),

    // Per-vertex local clustering coefficient + degree on the shared
    // DocGraph — cc = 2·tri/(dg·(dg−1)) reported as exact integer ppm
    // (numerator and denominator are both int64; div truncation is
    // identical in both engines). Reuses q185's degree-ordered forward
    // triangle count; the per-vertex join is dimension-sized.
    QEntry("q299_clustering_coeff",
      (s, d) => {
        val (docs, und) = DocGraph.docsAndUnd(s, d)
        val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("dg"))
          .localCheckpoint() // feeds orientation + the final join
        val oriented = und
          .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
          .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
          .select(
            when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
              struct(col("u").as("a"), col("v").as("b")))
              .otherwise(struct(col("v").as("a"), col("u").as("b")))
              .as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .localCheckpoint()
        val wedges = oriented.select(col("a"), col("b").as("w1"))
          .join(oriented.select(col("a"), col("b").as("w2")), "a")
          .filter(col("w1") < col("w2"))
        val tri = wedges.join(und,
          col("u") === col("w1") && col("v") === col("w2"))
        val perv = tri
          .select(explode(array(col("a"), col("w1"), col("w2"))).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
        docs
          .join(deg.select(col("x").as("doc_id"), col("dg")),
            Seq("doc_id"), "left")
          .join(perv, Seq("doc_id"), "left")
          .select(col("doc_id"),
            coalesce(col("dg"), lit(0L)).as("dg"),
            coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
          .select(col("doc_id"), col("dg"), col("n_triangles"),
            when(col("dg") >= 2,
              expr("(2000000 * n_triangles) div (dg * (dg - 1))"))
              .otherwise(lit(0L)).as("cc_ppm"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${DocGraph.undSql},
              deg AS (
                SELECT x, count(*) AS dg FROM (
                  SELECT u AS x FROM und UNION ALL SELECT v FROM und)
                GROUP BY x),
              ori AS (
                SELECT CASE WHEN (du.dg, und.u) < (dv.dg, und.v)
                       THEN und.u ELSE und.v END AS a,
                  CASE WHEN (du.dg, und.u) < (dv.dg, und.v)
                       THEN und.v ELSE und.u END AS b
                FROM und
                JOIN deg du ON du.x = und.u
                JOIN deg dv ON dv.x = und.v),
              wedge AS (
                SELECT o1.a, o1.b AS w1, o2.b AS w2
                FROM ori o1 JOIN ori o2 ON o1.a = o2.a
                WHERE o1.b < o2.b),
              tri AS (
                SELECT w.a, w.w1, w.w2
                FROM wedge w JOIN und ON und.u = w.w1 AND und.v = w.w2),
              pern AS (
                SELECT x AS doc_id, count(*) AS n_triangles FROM (
                  SELECT a AS x FROM tri
                  UNION ALL SELECT w1 FROM tri
                  UNION ALL SELECT w2 FROM tri)
                GROUP BY x)
              SELECT d.doc_id,
                CAST(coalesce(g.dg, 0) AS BIGINT) AS dg,
                CAST(coalesce(p.n_triangles, 0) AS BIGINT) AS n_triangles,
                CAST(CASE WHEN coalesce(g.dg, 0) >= 2
                  THEN (2000000 * coalesce(p.n_triangles, 0))
                    // (g.dg * (g.dg - 1))
                  ELSE 0 END AS BIGINT) AS cc_ppm
              FROM documents d
              LEFT JOIN deg g ON g.x = d.doc_id
              LEFT JOIN pern p ON p.doc_id = d.doc_id
              ORDER BY d.doc_id""")),

    // TextRank keyword extraction (Mihalcea & Tarau 2004): undirected
    // word co-occurrence graph from ADJACENT token pairs (post
    // length-≥4 content filter), 3 damped power-iteration rounds in
    // pico-scale integer arithmetic (T = 1e12 total mass, d = 0.85 as
    // 85/100 integer ops, contributions weight·pr div wdeg) — every
    // intermediate is int64 and truncating division agrees between
    // engines, so the oracle replays the iteration bit-for-bit. One
    // tokenize pass over the corpus; the iteration runs on the word
    // dimension. Top 25 by (score, word) via TakeOrdered — no global
    // sort.
    QEntry("q300_textrank_keywords",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(filter(split(lower(col("text")), "\\s+"),
            t => length(t) >= 4).as("w"))
        graft.pipeline.TextAnalysis.textrankScores(toks, "w")
          .select(col("w"), col("wdeg"), col("pr").as("pr_pico"))
          .orderBy(col("pr_pico").desc, col("w")).limit(25)
      },
      Some("""WITH t AS (
                SELECT list_filter(string_split_regex(lower(text), '\s+'),
                  x -> len(x) >= 4) AS w
                FROM documents),
              pr0 AS (
                SELECT unnest(list_transform(range(1, len(w)),
                  i -> {'w1': least(w[i], w[i+1]),
                        'w2': greatest(w[i], w[i+1])})) AS p
                FROM t WHERE len(w) >= 2),
              adj AS (
                SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c
                FROM pr0 WHERE p.w1 <> p.w2 GROUP BY 1, 2),
              edges AS (
                SELECT w1 AS src, w2 AS dst, c FROM adj
                UNION ALL SELECT w2, w1, c FROM adj),
              wdeg AS (
                SELECT src, sum(c) AS wdeg FROM edges GROUP BY 1),
              nn AS (SELECT count(*) AS n FROM wdeg),
              cst AS (SELECT n,
                  (15 * 1000000000000) // (100 * n) AS base,
                  1000000000000 // n AS init
                FROM nn),
              it0 AS (SELECT src AS w, (SELECT init FROM cst) AS pr
                      FROM wdeg),
              it1 AS (
                SELECT wd.src AS w, (SELECT base FROM cst) +
                  (85 * coalesce(f.inflow, 0)) // 100 AS pr
                FROM wdeg wd LEFT JOIN (
                  SELECT e.dst, sum((e.c * p.pr) // w2.wdeg) AS inflow
                  FROM edges e JOIN it0 p ON p.w = e.src
                  JOIN wdeg w2 ON w2.src = e.src
                  GROUP BY e.dst) f ON f.dst = wd.src),
              it2 AS (
                SELECT wd.src AS w, (SELECT base FROM cst) +
                  (85 * coalesce(f.inflow, 0)) // 100 AS pr
                FROM wdeg wd LEFT JOIN (
                  SELECT e.dst, sum((e.c * p.pr) // w2.wdeg) AS inflow
                  FROM edges e JOIN it1 p ON p.w = e.src
                  JOIN wdeg w2 ON w2.src = e.src
                  GROUP BY e.dst) f ON f.dst = wd.src),
              it3 AS (
                SELECT wd.src AS w, (SELECT base FROM cst) +
                  (85 * coalesce(f.inflow, 0)) // 100 AS pr
                FROM wdeg wd LEFT JOIN (
                  SELECT e.dst, sum((e.c * p.pr) // w2.wdeg) AS inflow
                  FROM edges e JOIN it2 p ON p.w = e.src
                  JOIN wdeg w2 ON w2.src = e.src
                  GROUP BY e.dst) f ON f.dst = wd.src)
              SELECT wd.src AS w, CAST(wd.wdeg AS BIGINT) AS wdeg,
                CAST(it3.pr AS BIGINT) AS pr_pico
              FROM wdeg wd JOIN it3 ON it3.w = wd.src
              ORDER BY pr_pico DESC, w LIMIT 25""")),

    // Rank-biased overlap (Webber/Moffat/Zobel 2010, truncated, p=0.9)
    // between the revenue top-10 and quantity top-10 part rankings —
    // the "did my reranker change anything" eval. Both rankings come
    // from one keyed agg + TakeOrdered(10) (no global sort); the
    // depth×overlap grid and the cumulative RBO prefix live on a
    // ≤10-row dimension (boundedDim-guarded window). overlap is exact
    // integer; agreement/weights/rbo are rounded doubles.
    QEntry("q301_rbo_rankings",
      (s, d) => {
        val agg = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(expr("CAST(sum(CAST(round(l_extendedprice * " +
              "(1 - l_discount) * 100) AS BIGINT)) AS BIGINT)")
              .as("rev_cents"),
            expr("CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)")
              .as("qty"))
          .localCheckpoint() // feeds both top-10 extracts
        val topA = agg.orderBy(col("rev_cents").desc, col("l_partkey"))
          .limit(10)
        val topB = agg.orderBy(col("qty").desc, col("l_partkey"))
          .limit(10)
        val ra = graft.pipeline.Stats.boundedDim(topA, "q301 rev top-10", 100)
          .select(col("l_partkey"), row_number().over(
            Window.orderBy(col("rev_cents").desc, col("l_partkey")))
            .cast("long").as("ra"))
        val rb = graft.pipeline.Stats.boundedDim(topB, "q301 qty top-10", 100)
          .select(col("l_partkey"), row_number().over(
            Window.orderBy(col("qty").desc, col("l_partkey")))
            .cast("long").as("rb"))
        val both = ra.join(rb, "l_partkey").localCheckpoint()
        graft.pipeline.Retrieval
          .rboGrid(both.select(col("ra"), col("rb")), p = 0.9, maxDepth = 10)
          .orderBy(col("depth"))
      },
      Some("""WITH agg AS (
                SELECT l_partkey,
                  CAST(sum(CAST(round(l_extendedprice * (1 - l_discount)
                    * 100) AS BIGINT)) AS BIGINT) AS rev_cents,
                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
                FROM lineitem GROUP BY 1),
              ra AS (
                SELECT l_partkey, CAST(row_number() OVER (
                  ORDER BY rev_cents DESC, l_partkey) AS BIGINT) AS ra
                FROM agg ORDER BY rev_cents DESC, l_partkey LIMIT 10),
              rb AS (
                SELECT l_partkey, CAST(row_number() OVER (
                  ORDER BY qty DESC, l_partkey) AS BIGINT) AS rb
                FROM agg ORDER BY qty DESC, l_partkey LIMIT 10),
              bo AS (
                SELECT ra.l_partkey, ra.ra, rb.rb
                FROM ra JOIN rb USING (l_partkey)),
              depths AS (SELECT unnest(generate_series(1, 10)) AS depth),
              ov AS (
                SELECT d.depth, count(*) AS overlap
                FROM depths d JOIN bo b
                  ON b.ra <= d.depth AND b.rb <= d.depth
                GROUP BY 1),
              grid AS (
                SELECT d.depth, coalesce(ov.overlap, 0) AS overlap,
                  pow(0.9, d.depth - 1) AS wt
                FROM depths d LEFT JOIN ov ON ov.depth = d.depth)
              SELECT CAST(depth AS BIGINT) AS depth,
                CAST(overlap AS BIGINT) AS overlap,
                round(CAST(overlap AS DOUBLE) / depth, 6) AS agreement,
                round(0.1 * sum(wt * overlap / depth) OVER (
                  ORDER BY depth ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW), 6) AS rbo_cum
              FROM grid ORDER BY depth"""))
  )
}
