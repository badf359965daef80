package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, final batch — the per-source lognormal length model.
  */
object Pipeline73 {

  val entries: Seq[QEntry] = Seq(

    // Lognormal length-model fit: per source the moment estimates of
    // ln(token count) — μ̂, σ̂ (micro-nats; per-row ln rounds to integer
    // micro FIRST, so the moments are exact integer sums in
    // decimal(38,0), one rounded sqrt at the end) — plus the implied
    // median (e^μ̂) and the third standardized moment as the
    // lognormality diagnostic (|skew| ≫ 0 says the model is wrong).
    // The capacity/synthetic-data planner: lengths at 100 TB are
    // sampled from exactly these two numbers.
    QEntry("q380_lognormal_fit",
      (s, d) => {
        val x = Tables.documents(s, d)
          .select(col("source"),
            expr("CAST(round(ln(CAST(greatest(1L, " +
              "CAST(size(split(lower(text), '\\\\s+')) AS BIGINT)) " +
              "AS DOUBLE)) * 1000000.0) AS BIGINT)").as("lx"))
        val m = x.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(col("lx")).as("s1"),
            sum(col("lx").cast("decimal(38,0)") * col("lx")).as("s2"),
            sum(col("lx").cast("decimal(38,0)") * col("lx") * col("lx"))
              .as("s3"))
          .localCheckpoint() // source dim
        m.select(col("source"), col("n"),
            expr("s1 div n").as("mu_micro"),
            expr("CAST(round(sqrt(CAST((CAST(n AS DECIMAL(38,0)) * s2 " +
              "- CAST(s1 AS DECIMAL(38,0)) * s1) AS DOUBLE)) / n) " +
              "AS BIGINT)").as("sigma_micro"),
            col("s1"), col("s2"), col("s3"))
          .withColumn("median_tokens",
            expr("CAST(round(exp(CAST(mu_micro AS DOUBLE) / 1e6)) " +
              "AS BIGINT)"))
          // skewness of lx: (n²·s3 − 3n·s1·s2 + 2s1³) / (n³·σ³) — σ in
          // micro, so scale by 1e18; milli precision output
          .withColumn("skew_milli",
            expr("CAST(round((CAST(n AS DOUBLE) * n * CAST(s3 AS DOUBLE) " +
              "- 3.0 * n * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) " +
              "+ 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * " +
              "CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * n * n * " +
              "CAST(sigma_micro AS DOUBLE) * sigma_micro * sigma_micro) " +
              "* 1000.0) AS BIGINT)"))
          .select(col("source"), col("n"), col("mu_micro"),
            col("sigma_micro"), col("median_tokens"), col("skew_milli"))
          .orderBy(col("source"))
      },
      Some("""WITH x AS (
                SELECT source,
                  CAST(round(ln(CAST(greatest(1,
                    len(string_split_regex(lower(text), '\s+')))
                    AS DOUBLE)) * 1000000.0) AS BIGINT) AS lx
                FROM documents),
              m AS (
                SELECT source, count(*) AS n, sum(lx) AS s1,
                  sum(CAST(lx AS HUGEINT) * lx) AS s2,
                  sum(CAST(lx AS HUGEINT) * lx * lx) AS s3
                FROM x GROUP BY source),
              f AS (
                SELECT source, n, s1 // n AS mu_micro,
                  CAST(round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
                    / n) AS BIGINT) AS sigma_micro,
                  s1, s2, s3
                FROM m)
              SELECT source, CAST(n AS BIGINT) AS n,
                CAST(mu_micro AS BIGINT) AS mu_micro, sigma_micro,
                CAST(round(exp(CAST(mu_micro AS DOUBLE) / 1e6))
                  AS BIGINT) AS median_tokens,
                CAST(round((CAST(n AS DOUBLE) * n * CAST(s3 AS DOUBLE)
                  - 3.0 * n * CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE)
                  + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) *
                  CAST(s1 AS DOUBLE)) / (CAST(n AS DOUBLE) * n * n *
                  CAST(sigma_micro AS DOUBLE) * sigma_micro *
                  sigma_micro) * 1000.0) AS BIGINT) AS skew_milli
              FROM f
              ORDER BY source"""))
  )
}
