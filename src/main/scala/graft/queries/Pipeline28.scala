package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, eighth pack: the Pareto-frontier (skyline)
  * operator, SPRT sequential early-stopping, a binned spatial
  * self-join whose oracle is the brute-force all-pairs proof that the
  * binning is lossless (the q61 PPJoin discipline in 2D), and
  * burstiness/dispersion monitoring. Conventions unchanged.
  */
object Pipeline28 {

  val entries: Seq[QEntry] = Seq(

    // 2D skyline (Pareto frontier) of parts: minimize retail price,
    // maximize size. No all-pairs dominance test: reduce to the
    // (price, best-size) dimension, then a point survives iff its
    // size exceeds the EXCLUSIVE running max of best sizes over
    // strictly cheaper prices — one ordered pass over the price
    // dimension, which is bounded by the value range (the q239
    // saturating-dimension argument: TPC-H retail prices live in a
    // fixed band, so the dim stops growing with the corpus).
    QEntry("q259_skyline",
      (s, d) => {
        graft.pipeline.Stats.skyline2d(Tables.part(s, d),
            expr("CAST(round(p_retailprice * 100) AS BIGINT)"),
            col("p_size").cast("long"))
          .select(col("__x").as("price_cents"), col("__best").as("size"),
            col("n_rows").as("n_parts"))
          .orderBy(col("price_cents"))
      },
      Some("""WITH dim AS (
                SELECT CAST(round(p_retailprice * 100) AS BIGINT)
                    AS price_cents,
                  max(CAST(p_size AS BIGINT)) AS best_size,
                  count(*) AS n_parts
                FROM part GROUP BY 1),
              rm AS (
                SELECT *, max(best_size) OVER (ORDER BY price_cents
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  AS runmax_excl
                FROM dim)
              SELECT price_cents, best_size AS size,
                CAST(n_parts AS BIGINT) AS n_parts
              FROM rm
              WHERE runmax_excl IS NULL OR best_size > runmax_excl
              ORDER BY price_cents""")),

    // SPRT early-stopping audit: could the "are >=30% of events
    // high-value?" question have been answered before the batch ended?
    // Wald's sequential test (H0 p=0.3 vs H1 p=0.4, alpha=beta=0.05)
    // over events in ARRIVAL order: per-event log-LR is one of TWO
    // integer micro-nat constants, the trajectory is a GlobalCumSum
    // prefix sum (no sequential recursion), and the verdict is the
    // first boundary crossing — a dimension top-1. The batch-vs-
    // sequential sample-size story in one exact query.
    QEntry("q260_sprt_boundary",
      (s, d) => {
        // round(1e6·ln(0.4/0.3)) = 287682; round(1e6·ln(0.6/0.7)) =
        // -154151; bounds ±round(1e6·ln(0.95/0.05)) = ±2944439
        val ev = Tables.events(s, d)
          .select(col("ts"), col("event_id"),
            when(expr("CAST(round(value * 100) AS BIGINT)") >= 3000,
              287682L).otherwise(-154151L).as("llr_step"))
        val cum = graft.operators.GlobalCumSum
          .runningSum(ev, col("llr_step"), "llr", col("ts"), col("event_id"))
        val idx = graft.operators.GlobalCumSum
          .runningSum(cum, lit(1L), "idx", col("ts"), col("event_id"))
        val crossed = idx
          .filter(col("llr") >= 2944439L || col("llr") <= -2944439L)
          .orderBy(col("idx")).limit(1)
          .select(col("idx").as("first_cross_idx"),
            when(col("llr") >= 2944439L, lit("accept_h1"))
              .otherwise(lit("accept_h0")).as("decision"))
        val fin = idx.orderBy(col("idx").desc).limit(1)
          .select(col("idx").as("n_events"), col("llr").as("llr_final"))
        fin.crossJoin(crossed
            .unionByName(fin.select(lit(0L).as("first_cross_idx"),
              lit("no_decision").as("decision")).limit(1))
            .orderBy(col("first_cross_idx").desc).limit(1))
      },
      Some("""WITH ev AS (
                SELECT epoch_us(ts) AS t, event_id,
                  CASE WHEN CAST(round(value * 100) AS BIGINT) >= 3000
                    THEN 287682 ELSE -154151 END AS llr_step
                FROM events),
              cum AS (
                SELECT *,
                  sum(llr_step) OVER (ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS llr,
                  row_number() OVER (ORDER BY t, event_id) AS idx
                FROM ev),
              crossed AS (
                SELECT idx AS first_cross_idx,
                  CASE WHEN llr >= 2944439 THEN 'accept_h1'
                    ELSE 'accept_h0' END AS decision
                FROM cum
                WHERE llr >= 2944439 OR llr <= -2944439
                ORDER BY idx LIMIT 1),
              fin AS (
                SELECT idx AS n_events, llr AS llr_final
                FROM cum ORDER BY idx DESC LIMIT 1),
              pick AS (
                SELECT * FROM (
                  SELECT first_cross_idx, decision FROM crossed
                  UNION ALL
                  SELECT 0, 'no_decision')
                ORDER BY first_cross_idx DESC LIMIT 1)
              SELECT CAST(fin.n_events AS BIGINT) AS n_events,
                CAST(fin.llr_final AS BIGINT) AS llr_final,
                CAST(pick.first_cross_idx AS BIGINT) AS first_cross_idx,
                pick.decision
              FROM fin, pick""")),

    // Binned spatial self-join over the zips dimension: all zip pairs
    // within 0.25 degrees Euclidean, found via 0.25-degree grid cells
    // + the 3x3 neighbor join + exact integer micro-degree verify —
    // the RangeJoin bin discipline in 2D. THE ORACLE IS THE
    // BRUTE-FORCE ALL-PAIRS SCAN (viable on the 169-row dim), so the
    // gate PROVES the binning loses no pair — the q61 lossless-pruning
    // pattern; at production scale only the binned side survives.
    QEntry("q261_geo_bin_join",
      (s, d) => {
        val zips = graft.sources.ZipDim.load(s)
          .select(col("zip_code"), col("state"),
            expr("CAST(round(lat * 1000000) AS BIGINT)").as("la"),
            expr("CAST(round(long * 1000000) AS BIGINT)").as("lo"))
          .localCheckpoint() // 169-row dim feeds both join sides
        val binned = zips
          .withColumn("cx", expr("la div 250000"))
          .withColumn("cy", expr("lo div 250000"))
        val probes = binned
          .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
          .select(col("zip_code").as("za"), col("state").as("sa"),
            col("la").as("laa"), col("lo").as("loa"),
            (col("cx") + col("dx")).as("cx"),
            (col("cy") + col("dy")).as("cy"))
        probes.join(binned.select(col("zip_code").as("zb"),
            col("state").as("sb"), col("la").as("lab"),
            col("lo").as("lob"), col("cx"), col("cy")),
            Seq("cx", "cy"))
          .filter(col("za") < col("zb"))
          .withColumn("d2", expr(
            "(laa - lab) * (laa - lab) + (loa - lob) * (loa - lob)"))
          .filter(col("d2") <= lit(62500000000L)) // (0.25e6)^2
          .select(col("za"), col("zb"), col("sa"), col("sb"), col("d2"))
          .distinct() // the 3x3 probe can see a pair from 2 shared cells
          .orderBy(col("d2"), col("za"), col("zb"))
          .limit(25)
      },
      Some(s"""WITH z AS (
                SELECT zip_code, state,
                  CAST(round(lat * 1000000) AS BIGINT) AS la,
                  CAST(round(long * 1000000) AS BIGINT) AS lo
                FROM read_json_auto('${Tables.fixture("data/zips.json")}'))
              SELECT a.zip_code AS za, b.zip_code AS zb,
                a.state AS sa, b.state AS sb,
                CAST((a.la - b.la) * (a.la - b.la) +
                  (a.lo - b.lo) * (a.lo - b.lo) AS BIGINT) AS d2
              FROM z a JOIN z b ON a.zip_code < b.zip_code
              WHERE (a.la - b.la) * (a.la - b.la) +
                (a.lo - b.lo) * (a.lo - b.lo) <= 62500000000
              ORDER BY d2, za, zb LIMIT 25""")),

    // Burstiness / overdispersion monitor: per-type daily counts'
    // index of dispersion (Fano factor var/mean in ppm, Poisson = 1e6)
    // and peak-to-mean in bp — the "is this traffic bursty or smooth"
    // readout behind capacity planning and bot detection. Sample
    // variance carried as the exact integer pair (k·SS - S²,
    // k·(k-1)); everything on the (type, day) dimension.
    QEntry("q262_burstiness",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
        daily.groupBy(col("event_type"))
          .agg(count(lit(1)).as("k"), sum(col("cnt")).as("sx"),
            sum(col("cnt") * col("cnt")).as("sxx"),
            max(col("cnt")).as("peak"))
          .select(col("event_type"), col("k"),
            expr("sx div k").as("mean_daily"),
            expr("(k * sxx - sx * sx) div (k * (k - 1))").as("var_daily"),
            expr("(((k * sxx - sx * sx) div (k * (k - 1))) * 1000000) " +
              "div (sx div k)").as("fano_ppm"),
            expr("(peak * 10000) div (sx div k)").as("peak_to_mean_bp"))
          .orderBy(col("event_type"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              st AS (
                SELECT event_type, count(*) AS k, sum(cnt) AS sx,
                  sum(cnt * cnt) AS sxx, max(cnt) AS peak
                FROM daily GROUP BY 1)
              SELECT event_type, CAST(k AS BIGINT) AS k,
                CAST(sx // k AS BIGINT) AS mean_daily,
                CAST((k * sxx - sx * sx) // (k * (k - 1)) AS BIGINT)
                  AS var_daily,
                CAST((((k * sxx - sx * sx) // (k * (k - 1))) * 1000000)
                  // (sx // k) AS BIGINT) AS fano_ppm,
                CAST((peak * 10000) // (sx // k) AS BIGINT)
                  AS peak_to_mean_bp
              FROM st ORDER BY event_type"""))
  )
}
