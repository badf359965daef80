package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, twentieth batch — distributed weighted sampling
  * (Efraimidis–Spirakis) and the CBO's join-size estimation error
  * curve.
  */
object Pipeline72 {

  val entries: Seq[QEntry] = Seq(

    // Weighted sampling without replacement (Efraimidis–Spirakis): per
    // source the top-3 docs by key = ln(u)/w (u a deterministic md5
    // coin in (0,1), w = token count) — the distributed standard for
    // "sample k items with probability ∝ weight" because the key is a
    // pure projection and top-k by key is mergeable across partitions
    // (unlike sequential reservoir state). Keys land as nano-rounded
    // doubles (identical expression both engines); heavier docs float
    // up, pinned in spec.
    QEntry("q378_weighted_reservoir",
      (s, d) => {
        val keyed = Tables.documents(s, d)
          .select(col("source"), col("doc_id"),
            greatest(lit(1L),
              graft.pipeline.TextAnalysis.tokenCount(col("text"))
                .cast("long")).as("w"),
            expr("CAST(conv(substring(md5(concat('es:', " +
              "CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT) " +
              "% 999999 + 1").as("u_ppm"))
          .withColumn("k_nano",
            expr("CAST(round(ln(CAST(u_ppm AS DOUBLE) / 1000000.0) " +
              "/ w * 1000000000.0) AS BIGINT)"))
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
          .orderBy(col("k_nano").desc, col("doc_id").asc)
        keyed.withColumn("rank", row_number().over(win).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("source"), col("rank"), col("doc_id"), col("w"),
            col("k_nano"))
          .orderBy(col("source"), col("rank"))
      },
      Some("""WITH keyed AS (
                SELECT source, doc_id,
                  greatest(1, CAST(len(string_split_regex(lower(text),
                    '\s+')) AS BIGINT)) AS w,
                  ('0x' || substr(md5('es:' ||
                    CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                    % 999999 + 1 AS u_ppm
                FROM documents),
              k AS (
                SELECT source, doc_id, w,
                  CAST(round(ln(CAST(u_ppm AS DOUBLE) / 1000000.0)
                    / w * 1000000000.0) AS BIGINT) AS k_nano
                FROM keyed),
              r AS (
                SELECT source, doc_id, w, k_nano,
                  row_number() OVER (PARTITION BY source
                    ORDER BY k_nano DESC, doc_id) AS rank
                FROM k QUALIFY rank <= 3)
              SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, w,
                k_nano
              FROM r
              ORDER BY source, rank""")),

    // Join-size estimation error curve: the CBO primitive — estimate
    // |orders ⋈ lineitem| on the order key from hash-bucketed per-side
    // key histograms at {256, 1024, 4096} buckets (est = Σ_b a_b·b_b,
    // collision-biased HIGH) against the exact Σ_k a_k·b_k, error in
    // bp. Shows exactly what resolution a planner needs before the
    // estimate is trustworthy; everything runs on bucket dimensions
    // after two keyed counts. Sums in decimal(38,0) — bucket products
    // cross int64 at corpus scale.
    QEntry("q379_join_size_estimate",
      (s, d) => {
        val a = Tables.orders(s, d).groupBy(col("o_orderkey").as("k"))
          .agg(count(lit(1)).as("ca"))
        val b = Tables.lineitem(s, d).groupBy(col("l_orderkey").as("k"))
          .agg(count(lit(1)).as("cb"))
        val keyed = a.join(b, "k")
          .select(col("k"), col("ca"), col("cb"),
            expr("CAST(conv(substring(md5(CAST(k AS STRING)), " +
              "1, 15), 16, 10) AS BIGINT)").as("h"))
          .localCheckpoint() // key-dim counts feed exact + all buckets;
          // one md5 per key — the per-grid-cell hash ran 2.3× slower
        val exact = keyed
          .agg(sum(col("ca").cast("decimal(38,0)") * col("cb"))
            .cast("long").as("exact_rows"))
        val grid = s.range(0, 3)
          .select(expr("CAST(256 * pow(4, id) AS BIGINT)").as("n_buckets"))
        val est = keyed.crossJoin(broadcast(grid))
          .select(col("n_buckets"),
            pmod(col("h"), col("n_buckets")).as("b"),
            col("ca"), col("cb"))
          .groupBy(col("n_buckets"), col("b"))
          .agg(sum(col("ca")).as("sa"), sum(col("cb")).as("sb"))
          .groupBy(col("n_buckets"))
          .agg(sum(col("sa").cast("decimal(38,0)") * col("sb"))
            .cast("long").as("est_rows"))
        est.crossJoin(broadcast(exact))
          .select(col("n_buckets"), col("est_rows"), col("exact_rows"),
            expr("(est_rows - exact_rows) * 10000 div exact_rows")
              .as("over_bp"))
          .orderBy(col("n_buckets"))
      },
      Some("""WITH a AS (
                SELECT o_orderkey AS k, count(*) AS ca
                FROM orders GROUP BY 1),
              b AS (
                SELECT l_orderkey AS k, count(*) AS cb
                FROM lineitem GROUP BY 1),
              keyed AS (
                SELECT a.k, a.ca, b.cb FROM a JOIN b USING (k)),
              exact AS (
                SELECT CAST(sum(CAST(ca AS HUGEINT) * cb) AS BIGINT)
                  AS exact_rows
                FROM keyed),
              grid AS (
                SELECT CAST(unnest([256, 1024, 4096]) AS BIGINT)
                  AS n_buckets),
              bk AS (
                SELECT g.n_buckets,
                  ('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15))
                    ::BIGINT % g.n_buckets AS b,
                  sum(ca) AS sa, sum(cb) AS sb
                FROM keyed, grid g
                GROUP BY g.n_buckets, 2),
              est AS (
                SELECT n_buckets,
                  CAST(sum(CAST(sa AS HUGEINT) * sb) AS BIGINT)
                    AS est_rows
                FROM bk GROUP BY n_buckets)
              SELECT e.n_buckets, e.est_rows, x.exact_rows,
                CAST((e.est_rows - x.exact_rows) * 10000
                  // x.exact_rows AS BIGINT) AS over_bp
              FROM est e, exact x
              ORDER BY e.n_buckets"""))
  )
}
