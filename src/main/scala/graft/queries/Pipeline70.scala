package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, eighteenth batch — monitoring and annotation-budget
  * planners: the temporal mix-shift PSI, Neyman allocation, and the
  * CI-width sample-size table.
  */
object Pipeline70 {

  val entries: Seq[QEntry] = Seq(

    // Temporal mix-shift monitor: week-over-week PSI of the event-type
    // mix — Σ (p−q)·ln(p/q) per adjacent week pair, Laplace-smoothed
    // (+1 per cell over the full type census, so a type absent from
    // one window contributes a finite, visible term instead of a
    // div-0). Shares in ppm, ln rounded to micro-nats per term (q92),
    // psi_micro = Σ (p−q)·lnr div 1e6. Everything runs on the (week,
    // type) dimension; per-type contributions are the attribution.
    // The TEMPORAL member beside q184's two-slice PSI.
    QEntry("q373_weekly_mix_psi",
      (s, d) => {
        val wt = Tables.events(s, d)
          .select(expr("ts div 604800000000000").as("wk"),
            col("event_type"))
          .groupBy(col("wk"), col("event_type"))
          .agg(count(lit(1)).as("c"))
        val weeks = wt.select(col("wk")).distinct()
        val types = wt.select(col("event_type")).distinct()
        val dense = weeks.crossJoin(broadcast(types))
          .join(wt, Seq("wk", "event_type"), "left")
          .select(col("wk"), col("event_type"),
            (coalesce(col("c"), lit(0L)) + 1L).as("c"))
          .localCheckpoint() // dense (week, type) dim, Laplace +1
        val tot = dense.groupBy(col("wk")).agg(sum(col("c")).as("n"))
        val shares = dense.join(broadcast(tot), "wk")
          .select(col("wk"), col("event_type"),
            expr("c * 1000000 div n").as("p"))
          .localCheckpoint() // both sides of the adjacent-week join
        val terms = shares
          .join(shares.select((col("wk") + 1L).as("wk"),
            col("event_type"), col("p").as("q")),
            Seq("wk", "event_type"))
          .select(col("wk"), col("event_type"), col("p"), col("q"),
            expr("CAST(round(ln(CAST(p AS DOUBLE) / q) * 1000000.0) " +
              "AS BIGINT)").as("lnr"))
          .withColumn("contrib_micro",
            expr("(p - q) * lnr div 1000000"))
          .localCheckpoint()
        val psi = terms.groupBy(col("wk"))
          .agg(sum(col("contrib_micro")).as("psi_micro"))
        terms.join(broadcast(psi), "wk")
          .select(col("wk"), col("event_type"), col("p"), col("q"),
            col("contrib_micro"), col("psi_micro"))
          .orderBy(col("wk"), col("event_type"))
      },
      Some("""WITH wt AS (
                SELECT epoch_us(ts) * 1000 // 604800000000000 AS wk,
                  event_type, count(*) AS c
                FROM events GROUP BY 1, 2),
              dense AS (
                SELECT w.wk, t.event_type, coalesce(wt.c, 0) + 1 AS c
                FROM (SELECT DISTINCT wk FROM wt) w
                CROSS JOIN (SELECT DISTINCT event_type FROM wt) t
                LEFT JOIN wt ON wt.wk = w.wk
                  AND wt.event_type = t.event_type),
              tot AS (SELECT wk, sum(c) AS n FROM dense GROUP BY wk),
              sh AS (
                SELECT d.wk, d.event_type,
                  d.c * 1000000 // t.n AS p
                FROM dense d JOIN tot t USING (wk)),
              terms AS (
                SELECT a.wk, a.event_type, a.p, b.p AS q,
                  CAST(round(ln(CAST(a.p AS DOUBLE) / b.p) * 1000000.0)
                    AS BIGINT) AS lnr
                FROM sh a JOIN sh b
                  ON b.event_type = a.event_type AND b.wk = a.wk - 1),
              c2 AS (
                SELECT wk, event_type, p, q, lnr,
                  (p - q) * lnr // 1000000 AS contrib_micro
                FROM terms),
              psi AS (
                SELECT wk, sum(contrib_micro) AS psi_micro
                FROM c2 GROUP BY wk)
              SELECT c2.wk, c2.event_type, CAST(c2.p AS BIGINT) AS p,
                CAST(c2.q AS BIGINT) AS q,
                CAST(c2.contrib_micro AS BIGINT) AS contrib_micro,
                CAST(psi.psi_micro AS BIGINT) AS psi_micro
              FROM c2 JOIN psi USING (wk)
              ORDER BY c2.wk, c2.event_type""")),

    // Neyman annotation allocation: split a 10k-label budget across
    // sources ∝ N_h·σ_h (σ from exact integer token-count moments in
    // decimal(38,0), one rounded sqrt per stratum — the q283
    // discipline) vs plain proportional-to-size; diff_labels is what
    // the variance knowledge buys. High-variance sources get more
    // labels — the survey-sampling answer to "where do annotations go".
    QEntry("q374_neyman_allocation",
      (s, d) => {
        val m = Tables.documents(s, d)
          .select(col("source"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("x"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("x")).as("sx"),
            sum(col("x").cast("decimal(38,0)") * col("x")).as("sxx"))
          .select(col("source"), col("n_docs"),
            expr("CAST(round(sqrt(CAST((CAST(n_docs AS DECIMAL(38,0)) " +
              "* sxx - CAST(sx AS DECIMAL(38,0)) * sx) AS DOUBLE)) / " +
              "n_docs * 1000.0) AS BIGINT)").as("sigma_milli"))
          .withColumn("wgt", col("n_docs") * col("sigma_milli"))
          .localCheckpoint() // source dim
        val tot = m.agg(sum(col("wgt")).as("tw"),
          sum(col("n_docs")).as("tn"))
        m.crossJoin(broadcast(tot))
          .select(col("source"), col("n_docs"), col("sigma_milli"),
            expr("wgt * 10000 div greatest(1L, tw)").as("neyman_labels"),
            expr("n_docs * 10000 div tn").as("proportional_labels"))
          .withColumn("diff_labels",
            col("neyman_labels") - col("proportional_labels"))
          .orderBy(col("source"))
      },
      Some("""WITH m AS (
                SELECT source, count(*) AS n_docs,
                  sum(x) AS sx,
                  sum(CAST(x AS HUGEINT) * x) AS sxx
                FROM (
                  SELECT source,
                    CAST(len(string_split_regex(lower(text), '\s+'))
                      AS BIGINT) AS x
                  FROM documents)
                GROUP BY source),
              sig AS (
                SELECT source, n_docs,
                  CAST(round(sqrt(CAST(n_docs * sxx - sx * sx
                    AS DOUBLE)) / n_docs * 1000.0) AS BIGINT)
                    AS sigma_milli
                FROM m),
              w AS (
                SELECT source, n_docs, sigma_milli,
                  n_docs * sigma_milli AS wgt
                FROM sig),
              tot AS (SELECT sum(wgt) AS tw, sum(n_docs) AS tn FROM w)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                sigma_milli,
                CAST(wgt * 10000 // greatest(1, tw) AS BIGINT)
                  AS neyman_labels,
                CAST(n_docs * 10000 // tn AS BIGINT)
                  AS proportional_labels,
                CAST(wgt * 10000 // greatest(1, tw)
                  - n_docs * 10000 // tn AS BIGINT) AS diff_labels
              FROM w, tot
              ORDER BY source""")),

    // Sample-size table: labels needed per source for a ±{1%, 2%, 5%}
    // CI on its quality-pass rate (tok ≥ 20 as the gate) at z = 1.96 —
    // n = z²·p(1−p)/w², all integer ppm (z² as 38416/10⁴); `feasible`
    // says whether the source even has that many docs. The "can we
    // measure this at all" pre-annotation readout.
    QEntry("q375_sample_size_planner",
      (s, d) => {
        val rates = Tables.documents(s, d)
          .select(col("source"),
            (graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long") >= 20L).cast("long").as("pass"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("pass")).as("n_pass"))
          .withColumn("p_ppm", expr("n_pass * 1000000 div n_docs"))
          .localCheckpoint()
        val grid = s.range(0, 3)
          .select(expr("CAST(CASE id WHEN 0 THEN 10000 WHEN 1 " +
            "THEN 20000 ELSE 50000 END AS BIGINT)").as("w_ppm"))
        rates.crossJoin(broadcast(grid))
          .select(col("source"), col("n_docs"), col("p_ppm"),
            col("w_ppm"),
            expr("38416 * p_ppm * (1000000 - p_ppm) div " +
              "(10000 * w_ppm * w_ppm)").as("n_required"))
          .withColumn("feasible", col("n_required") <= col("n_docs"))
          .orderBy(col("source"), col("w_ppm"))
      },
      Some("""WITH r AS (
                SELECT source, count(*) AS n_docs,
                  sum(CASE WHEN
                    len(string_split_regex(lower(text), '\s+')) >= 20
                    THEN 1 ELSE 0 END) AS n_pass
                FROM documents GROUP BY source),
              p AS (
                SELECT source, n_docs,
                  n_pass * 1000000 // n_docs AS p_ppm
                FROM r),
              g AS (SELECT CAST(unnest([10000, 20000, 50000]) AS BIGINT)
                     AS w_ppm)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(p_ppm AS BIGINT) AS p_ppm,
                CAST(w_ppm AS BIGINT) AS w_ppm,
                CAST(38416 * p_ppm * (1000000 - p_ppm)
                  // (10000 * w_ppm * w_ppm) AS BIGINT) AS n_required,
                CAST(38416 * p_ppm * (1000000 - p_ppm)
                  // (10000 * w_ppm * w_ppm) AS BIGINT) <= n_docs
                  AS feasible
              FROM p, g
              ORDER BY source, w_ppm"""))
  )
}
