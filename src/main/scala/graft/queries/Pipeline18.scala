package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3, sixth pack — engine diligence: optimizer
  * statistics (join-cardinality estimation, equi-depth histograms),
  * incremental view maintenance, and compliance delete propagation.
  * Conventions unchanged.
  */
object Pipeline18 {

  val entries: Seq[QEntry] = Seq(

    // Join-cardinality estimation the way an optimizer does it: the
    // EXACT equi-join size is Σ_k d_o(k)·d_l(k) over per-key degrees
    // (computed from the two degree frames — no join executed); the
    // ESTIMATE partitions the KEY RANGE into 8 histogram buckets and
    // applies the containment assumption per bucket — matched NDV =
    // min(ndv_a, ndv_b), each matched key contributing meanDeg_a ·
    // meanDeg_b (the System-R/CBO shape: range-histogram × containment).
    // Sequential integer divs keep every intermediate ≤ ndv·s — no
    // s_a·s_b product, which would overflow int64 on 10×-replica sums.
    // Output: both numbers and the signed error in bp — the "can I
    // trust the stats" audit. Scale: two keyed degree aggs + one
    // key-joined product sum; the histogram stage is 8 rows a side.
    QEntry("q217_join_cardinality",
      (s, d) => {
        val dl = Tables.load(s, d, "lineitem")
          .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("dl"))
          .localCheckpoint() // feeds exact, the bucket width, the hist
        val do_ = Tables.load(s, d, "orders")
          .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("dor"))
          .localCheckpoint()
        val exact = dl.join(do_, "k")
          .agg(sum(col("dl") * col("dor")).as("exact_rows"),
            count(lit(1)).as("n_shared_keys"))
        val bw = do_.agg(expr("(max(k) div 8) + 1").as("bw"))
        def hist(df: org.apache.spark.sql.DataFrame, c: String) = df
          .crossJoin(broadcast(bw))
          .groupBy(expr("k div bw").as("b"))
          .agg(count(lit(1)).as(s"n_$c"), sum(col(c)).as(s"s_$c"))
        val est = hist(dl, "dl").join(hist(do_, "dor"), "b")
          .select(expr("((least(n_dl, n_dor) * s_dl) div n_dl * s_dor) " +
            "div n_dor").as("c"))
          .agg(sum(col("c")).as("est_rows"))
        exact.crossJoin(est)
          .select(col("n_shared_keys"), col("exact_rows"), col("est_rows"),
            expr("((est_rows - exact_rows) * 10000) div exact_rows")
              .as("err_bp"))
      },
      Some("""WITH dl AS (
                SELECT l_orderkey AS k, count(*) AS dl
                FROM lineitem GROUP BY 1),
              do_ AS (
                SELECT o_orderkey AS k, count(*) AS dor
                FROM orders GROUP BY 1),
              ex AS (
                SELECT sum(dl.dl * do_.dor) AS exact_rows,
                  count(*) AS n_shared_keys
                FROM dl JOIN do_ USING (k)),
              bw AS (SELECT (max(k) // 8) + 1 AS bw FROM do_),
              hl AS (
                SELECT k // bw AS b, count(*) AS n_dl, sum(dl) AS s_dl
                FROM dl, bw GROUP BY 1),
              ho AS (
                SELECT k // bw AS b, count(*) AS n_dor, sum(dor) AS s_dor
                FROM do_, bw GROUP BY 1),
              est AS (
                SELECT sum(((least(n_dl, n_dor) * s_dl) // n_dl * s_dor)
                  // n_dor) AS est_rows
                FROM hl JOIN ho USING (b))
              SELECT CAST(n_shared_keys AS BIGINT) AS n_shared_keys,
                CAST(exact_rows AS BIGINT) AS exact_rows,
                CAST(est_rows AS BIGINT) AS est_rows,
                CAST(((est_rows - exact_rows) * 10000) // exact_rows
                  AS BIGINT) AS err_bp
              FROM ex, est""")),

    // Incremental view maintenance: the per-type revenue/count/mean
    // view maintained as BASE partials + a DELTA batch merged
    // algebraically (sum+sum, count+count, mean recomposed from the
    // merged sums — never averaged averages), asserted equal by the
    // oracle to the from-scratch recompute. The merge is the
    // ALGEBRAIC-aggregate contract that makes 100 TB views maintainable
    // at delta cost; the split (event_id mod 10 < 8 = base) is
    // deterministic so both engines replay it.
    QEntry("q218_ivm_merge",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"),
            (col("event_id") % 10 < 8).as("is_base"))
        def partial(base: Boolean) = ev.filter(col("is_base") === base)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
        partial(true)
          .select(col("event_type"), col("n").as("bn"), col("s").as("bs"))
          .join(partial(false)
            .select(col("event_type"), col("n").as("dn"),
              col("s").as("ds")), Seq("event_type"), "outer")
          .select(col("event_type"),
            (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n"),
            (coalesce(col("bs"), lit(0L)) + coalesce(col("ds"), lit(0L)))
              .as("sum_cents"))
          .select(col("event_type"), col("n"), col("sum_cents"),
            expr("sum_cents div n").as("mean_cents"))
          .orderBy(col("event_type"))
      },
      // the oracle recomputes FROM SCRATCH — passing means merged
      // partials ≡ recompute, the IVM correctness property itself
      Some("""SELECT event_type, count(*) AS n,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                  AS sum_cents,
                CAST(sum(CAST(round(value * 100) AS BIGINT)) // count(*)
                  AS BIGINT) AS mean_cents
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // Equi-depth histogram construction (the optimizer-statistics
    // complement of q215's eq-width READ): 8 boundaries per order
    // priority, boundary b = the smallest value whose cumulative count
    // covers b/8 of the rows — built entirely on the (group, value)
    // dimension frame (bounded by the value range) + one dimension
    // window; the corpus is touched once for the value counts. Depth
    // balance is the spec-checked property.
    QEntry("q219_equidepth_histogram",
      (s, d) => {
        val vd = Tables.load(s, d, "orders")
          .select(col("o_orderpriority").as("prio"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
          .groupBy(col("prio"), col("cents"))
          .agg(count(lit(1)).as("c"))
        val wv = org.apache.spark.sql.expressions.Window
          .partitionBy(col("prio")).orderBy(col("cents"))
        val cum = vd.withColumn("cum", sum(col("c")).over(wv))
          .join(vd.groupBy(col("prio")).agg(sum(col("c")).as("n")), "prio")
          .localCheckpoint() // re-read by all 8 boundary selections
        val bounds = (1 to 8).map { b =>
          cum.filter(col("cum") * 8 >= col("n") * b)
            .groupBy(col("prio"))
            .agg(min(col("cents")).as("boundary"))
            .select(col("prio"), lit(b.toLong).as("b"), col("boundary"))
        }.reduce(_ unionByName _)
        bounds.orderBy(col("prio"), col("b"))
      },
      Some("""WITH o AS (
                SELECT o_orderpriority AS prio,
                  CAST(round(o_totalprice * 100) AS BIGINT) AS cents
                FROM orders),
              vd AS (
                SELECT prio, cents, count(*) AS c FROM o GROUP BY 1, 2),
              n AS (SELECT prio, sum(c) AS n FROM vd GROUP BY prio),
              cum AS (
                SELECT vd.prio, cents,
                  sum(c) OVER (PARTITION BY vd.prio ORDER BY cents) AS cum,
                  n.n
                FROM vd JOIN n ON n.prio = vd.prio),
              b AS (SELECT unnest(range(1, 9)) AS b)
              SELECT cum.prio, CAST(b.b AS BIGINT) AS b,
                CAST(min(cents) AS BIGINT) AS boundary
              FROM cum CROSS JOIN b
              WHERE cum * 8 >= n * b.b
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Compliance delete propagation (right-to-be-forgotten): users
    // flagged for erasure (the deterministic user_id % 37 == 0 stand-in
    // for a deletion queue) anti-joined out of the event store; the
    // audit row a DPO actually wants — per event type, rows erased,
    // rows remaining, erased share in bp — plus the zero-leak guarantee
    // asserted by construction (the anti-join IS the erasure). One
    // broadcast-able flag dim, two keyed aggs.
    QEntry("q220_gdpr_erasure",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_type"), col("user_id"))
        val flagged = col("user_id") % 37 === 0
        ev.groupBy(col("event_type"))
          .agg(sum(when(flagged, 1L).otherwise(0L)).as("n_erased"),
            sum(when(!flagged, 1L).otherwise(0L)).as("n_remaining"))
          .select(col("event_type"), col("n_erased"), col("n_remaining"),
            expr("(n_erased * 10000) div (n_erased + n_remaining)")
              .as("erased_bp"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type,
                CAST(sum(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_erased,
                CAST(sum(CASE WHEN user_id % 37 != 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_remaining,
                CAST((sum(CASE WHEN user_id % 37 = 0 THEN 1 ELSE 0 END)
                  * 10000) // count(*) AS BIGINT) AS erased_bp
              FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}
