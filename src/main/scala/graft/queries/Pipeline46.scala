package graft.queries

import org.apache.spark.sql.functions._

import graft.expressions.JaroWinkler

/** Round-12 pack, tenth batch — record-linkage and calibration
  * operators:
  *  - q318: Jaro–Winkler similarity as a native codegen'd
  *    [[graft.expressions.JaroWinkler]] expression (Spark has
  *    levenshtein built in but no JW), scored over planted typo pairs
  *    vs adjacent-key controls — the linkage re-ranker;
  *  - q319: isotonic calibration (PAVA) of the q247–q249 linear probe
  *    via the minimax identity on the 10-bin reliability dimension —
  *    exact integers end to end;
  *  - q320: functional-dependency audit over a column-pair grid —
  *    the profiling primitive behind key discovery;
  *  - q321: blocking-quality audit of the q192 symmetric-deletion
  *    blocker — reduction ratio + pair completeness vs planted truth.
  */
object Pipeline46 {

  /** q192's typo construction (delete char at 1-based position p+1,
    * p = (custkey div 10) mod len) — shared by q318/q321. */
  private def typoName = {
    val p = (expr("c_custkey div 10") % length(col("c_name"))).cast("int")
    concat(col("c_name").substr(lit(1), p),
      col("c_name").substr(p + 2, length(col("c_name"))))
  }

  private val TypoSql =
    """substr(c_name, 1,
         CAST((c_custkey // 10) % length(c_name) AS BIGINT)) ||
       substr(c_name,
         CAST((c_custkey // 10) % length(c_name) AS BIGINT) + 2)"""

  // q320's candidate column set (o_year derived from the order date):
  // o_orderkey is the key (orderkey → X holds for every X), the rest
  // genuinely vary — the grid shows both outcomes.
  private val FdCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_orderpriority", "o_year")

  val entries: Seq[QEntry] = Seq(

    // Jaro–Winkler linkage scores: every 10th customer gets a planted
    // single-deletion typo of its name and an adjacent-key control
    // (the NEXT customer's name — same "Customer#" prefix, different
    // digits). The native expression (StringSim.scala) computes the
    // standard Winkler variant (window ⌊max/2⌋−1, prefix scale 0.1
    // capped at 4, boost past 0.7) — the same formulation DuckDB's
    // jaro_winkler_similarity implements, which the oracle runs.
    // Rounded to 4 decimals on BOTH sides before the comparison flag.
    QEntry("q318_jaro_winkler",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))
          .localCheckpoint() // planted + control sides
        val planted = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), col("c_name"), typoName.as("t_name"))
        val ctrl = cust.select((col("c_custkey") - 1).as("c_custkey"),
          col("c_name").as("n_name"))
        planted.join(ctrl, "c_custkey")
          .select(col("c_custkey"),
            round(JaroWinkler(col("c_name"), col("t_name")), 4).as("jw_typo"),
            round(JaroWinkler(col("c_name"), col("n_name")), 4).as("jw_next"))
          .withColumn("typo_wins",
            (col("jw_typo") > col("jw_next")).cast("int"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""WITH c AS (SELECT c_custkey, c_name FROM customer),
              t AS (
                SELECT c_custkey, c_name, $TypoSql AS t_name
                FROM c WHERE c_custkey % 10 = 0),
              n AS (
                SELECT c_custkey - 1 AS c_custkey, c_name AS n_name
                FROM c),
              j AS (
                SELECT t.c_custkey,
                  round(jaro_winkler_similarity(t.c_name, t.t_name), 4)
                    AS jw_typo,
                  round(jaro_winkler_similarity(t.c_name, n.n_name), 4)
                    AS jw_next
                FROM t JOIN n USING (c_custkey))
              SELECT c_custkey, jw_typo, jw_next,
                CAST(CASE WHEN jw_typo > jw_next THEN 1 ELSE 0 END
                  AS INTEGER) AS typo_wins
              FROM j ORDER BY c_custkey""")),

    // Isotonic calibration of the linear probe (the PAVA fit) on the
    // q249 reliability bins, via the minimax identity
    //   fit(t) = max_{i<=t} min_{j>=t} rate[i..j]
    // evaluated entirely on the <=10-row bin DIMENSION: interval rates
    // from two prefix sums, floor(1e6·x) commutes with min/max
    // (monotone), so the whole fit is exact integer arithmetic — no
    // sequential pool-adjacent-violators loop, no doubles. Completes
    // the calibration family (ECE q249, Brier q282): the fitted curve
    // is the monotone regressor those diagnostics measure against.
    QEntry("q319_isotonic_calibration",
      (s, d) => {
        val scored = Pipeline25.probeScores(s, d)
        val mm = scored.agg(min(col("s")).as("lo"), max(col("s")).as("hi"))
        val bins = scored.crossJoin(broadcast(mm))
          .withColumn("norm_ppm",
            expr("((s - lo) * 1000000) div (hi - lo)"))
          .withColumn("bin", expr("least(9L, norm_ppm div 100000)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("n_pos"))
          .localCheckpoint() // <=10-row dim: feeds cums + the t-grid
        val cum = graft.operators.GlobalCumSum.runningSum(
          graft.operators.GlobalCumSum.runningSum(
            bins, col("n"), "cn", col("bin")),
          col("n_pos"), "cp", col("bin"))
        val iv = cum
          .select(col("bin").as("bi"), col("n").as("ni"),
            col("cn").as("cni"), col("n_pos").as("pi"), col("cp").as("cpi"))
          .join(broadcast(cum.select(col("bin").as("bj"),
            col("cn").as("cnj"), col("cp").as("cpj"))),
            col("bi") <= col("bj"))
          .select(col("bi"), col("bj"),
            expr("(cpj - (cpi - pi)) * 1000000 div (cnj - (cni - ni))")
              .as("iso_unit"))
        val fit = bins.select(col("bin"))
          .join(broadcast(iv),
            col("bi") <= col("bin") && col("bin") <= col("bj"))
          .groupBy(col("bin"), col("bi"))
          .agg(min(col("iso_unit")).as("inner_rate"))
          .groupBy(col("bin")).agg(max(col("inner_rate")).as("iso_ppm"))
        bins.join(fit, "bin")
          .select(col("bin"), col("n"), col("n_pos"),
            expr("n_pos * 1000000 div n").as("raw_ppm"), col("iso_ppm"))
          .orderBy(col("bin"))
      },
      Some(s"""WITH ${Pipeline25.ProbeSql},
              mm AS (SELECT min(s) AS lo, max(s) AS hi FROM scored),
              bins AS (
                SELECT CAST(least(9, ((s - mm.lo) * 1000000) //
                    (mm.hi - mm.lo) // 100000) AS BIGINT) AS bin,
                  count(*) AS n, sum(y) AS n_pos
                FROM scored, mm GROUP BY 1),
              cum AS (
                SELECT bin, n, n_pos,
                  sum(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                    AS cn,
                  sum(n_pos) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
                    AS cp
                FROM bins),
              iv AS (
                SELECT i.bin AS bi, j.bin AS bj,
                  (j.cp - (i.cp - i.n_pos)) * 1000000 //
                    (j.cn - (i.cn - i.n)) AS iso_unit
                FROM cum i JOIN cum j ON i.bin <= j.bin),
              inner_min AS (
                SELECT t.bin, iv.bi, min(iv.iso_unit) AS inner_rate
                FROM bins t JOIN iv
                  ON iv.bi <= t.bin AND t.bin <= iv.bj
                GROUP BY 1, 2),
              fit AS (
                SELECT bin, max(inner_rate) AS iso_ppm
                FROM inner_min GROUP BY 1)
              SELECT b.bin, CAST(b.n AS BIGINT) AS n,
                CAST(b.n_pos AS BIGINT) AS n_pos,
                CAST(b.n_pos * 1000000 // b.n AS BIGINT) AS raw_ppm,
                CAST(f.iso_ppm AS BIGINT) AS iso_ppm
              FROM bins b JOIN fit f USING (bin) ORDER BY b.bin""")),

    // Functional-dependency audit: for every ordered pair (X, Y) of a
    // bounded candidate column set, does X → Y hold, and how badly
    // does it fail — violating keys (X values with >1 distinct Y),
    // worst fan-out, distinct (X, Y) pairs. One melt (explode to the
    // 20-pair grid) + one two-level distinct aggregation — the
    // Metanome-style single-pass formulation; at corpus grain the melt
    // factor is the (bounded) grid size, not the schema width.
    //
    // Shuffle discipline (VERDICT r13 item 2): the melt used to carry
    // raw (lhs, rhs, x, y) STRING tuples — the largest shuffle
    // cross-section in the tree and the worst degrader under host
    // contention. Values now travel as TWO independently-seeded
    // 64-bit xxhash64 longs per side (128 bits): each FD column is
    // hashed ONCE per row before the explode, the pair name collapses
    // to a 1-byte grid index, and both aggregation levels shuffle only
    // fixed-width longs. xxhash64 (codegen'd, no hex round-trip) over
    // md5+conv here because no hash value reaches the OUTPUT — only
    // counts do — so no cross-engine hash parity is needed, unlike the
    // md5-keyed queries. Exactness of countDistinct: for n distinct
    // values per side, P(any 128-bit collision) ≤ n²/2^129 — < 2^-66
    // even at n = 2^31 — and the gate's hash-equality vs the
    // STRING-exact DuckDB oracle at both SFs is the standing
    // empirical proof. isNotNull guards keep null semantics identical
    // to the string formulation (null x groups as one key, null y is
    // skipped by the multi-arg countDistinct) — xxhash64 would
    // otherwise map NULL to a non-null seed hash.
    //
    // The sf0.1 fixture is ONE parquet split; without a spread the
    // 3M-row melt + partial agg runs on one thread (measured 2.9 s vs
    // 1.2 s). The pre-explode repartition is a narrow 10-long/row
    // exchange — at real scale the scan arrives already split and the
    // exchange stays the cheapest stage in the plan.
    QEntry("q320_fd_audit",
      (s, d) => {
        val grid = (for (a <- FdCols; b <- FdCols if a != b) yield (a, b))
          .zipWithIndex
        val base = Tables.orders(s, d)
          .withColumn("o_year", year(col("o_orderdate")))
        val hashed = FdCols.foldLeft(base) { (df, c) =>
          df.withColumn(s"__h1_$c",
              when(col(c).isNotNull, xxhash64(col(c))))
            .withColumn(s"__h2_$c",
              when(col(c).isNotNull, xxhash64(col(c), lit(1))))
        }.select(FdCols.flatMap(c =>
          Seq(col(s"__h1_$c"), col(s"__h2_$c"))): _*)
          .repartition(s.sparkContext.defaultParallelism)
        val melted = hashed.select(explode(array(grid.map {
          case ((a, b), i) => struct(lit(i).as("pid"),
            col(s"__h1_$a").as("x1"), col(s"__h2_$a").as("x2"),
            col(s"__h1_$b").as("y1"), col(s"__h2_$b").as("y2"))
          }: _*)).as("p")).select(col("p.*"))
        import s.implicits._
        val pairNames = broadcast(
          grid.map { case ((a, b), i) => (i, a, b) }
            .toDF("pid", "lhs", "rhs"))
        melted.groupBy(col("pid"), col("x1"), col("x2"))
          .agg(countDistinct(col("y1"), col("y2")).as("dy"))
          .groupBy(col("pid"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(col("dy") > 1, 1L).otherwise(0L)).as("violating_keys"),
            sum(col("dy")).as("distinct_pairs"),
            max(col("dy")).as("max_rhs_per_key"))
          .join(pairNames, "pid")
          .withColumn("holds", (col("max_rhs_per_key") === 1).cast("int"))
          .select(col("lhs"), col("rhs"), col("n_keys"),
            col("violating_keys"), col("distinct_pairs"),
            col("max_rhs_per_key"), col("holds"))
          .orderBy(col("lhs"), col("rhs"))
      },
      Some {
        val grid = for (a <- FdCols; b <- FdCols if a != b) yield (a, b)
        grid.map { case (a, b) =>
          s"""SELECT '$a' AS lhs, '$b' AS rhs,
                CAST(count(*) AS BIGINT) AS n_keys,
                CAST(sum(CASE WHEN dy > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS violating_keys,
                CAST(sum(dy) AS BIGINT) AS distinct_pairs,
                CAST(max(dy) AS BIGINT) AS max_rhs_per_key,
                CAST(CASE WHEN max(dy) = 1 THEN 1 ELSE 0 END AS INTEGER)
                  AS holds
              FROM (SELECT $a AS x, count(DISTINCT $b) AS dy
                    FROM (SELECT *, year(o_orderdate) AS o_year
                          FROM orders) GROUP BY 1)"""
        }.mkString("", "\nUNION ALL\n", "\nORDER BY lhs, rhs")
      }),

    // Blocking-quality audit of the symmetric-deletion blocker (the
    // q192 candidate generator): reduction ratio (candidate pairs vs
    // all pairs, in ppm) and pair completeness against the PLANTED
    // typo truth — the lossless-blocking claim as a measured gate
    // (completeness must read 1e6), the audit any blocking scheme
    // needs before it replaces an all-pairs join at scale.
    //
    // Counting inherits the round-11 collapse discipline: byte-equal
    // strings collapse to (rep, multiplicity) BEFORE the signature
    // join (the sf≈1 replica repeats every name 10×, and the raw
    // id-level join squared inside every signature bucket — measured
    // 14× superlinear, SCALE.md round-12 note). Candidate counts are
    // reconstructed exactly: cross-name rep pairs carry m_a·m_b
    // implied id pairs, same-name groups contribute m·(m−1)/2 (any
    // two ids of one string share the string itself as a signature).
    // The DuckDB oracle stays the raw id-level formulation — equality
    // IS the losslessness proof.
    //
    // Barrier strategy (VERDICT r15 item 1): the multi-consumer frames
    // are LAZY MEMORY_AND_DISK persists, not eager localCheckpoints.
    // The four chained checkpoints this replaces each ran a separate
    // barrier job whose blocks had to survive in the 8 GiB block
    // manager until the last consumer — fast on an idle host (2.9 s
    // committed) but 29 s under the driver's pressured page cache
    // (BENCH_r15 min-of-2): every evicted-then-reread block became
    // real disk I/O. Lazy persist collapses the whole query into ONE
    // action; eviction under pressure recomputes the (deterministic,
    // dimension-sized) frame instead of touching a cold disk. The
    // truth probe is likewise ONE pass (left join + conditional agg)
    // where it was a checkpoint split into two aggregate branches.
    QEntry("q321_blocking_audit",
      (s, d) => {
        import org.apache.spark.storage.StorageLevel
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))
        val records = cust
          .union(cust.filter(col("c_custkey") % 10 === 0)
            .select((col("c_custkey") + 10000000L).as("c_custkey"),
              typoName.as("c_name")))
          .persist(StorageLevel.MEMORY_AND_DISK) // blocker input + truth + totals
        val byName = records.groupBy(col("c_name"))
          .agg(min(col("c_custkey")).as("rep"), count(lit(1)).as("m"))
          .persist(StorageLevel.MEMORY_AND_DISK) // sig join + multiplicities
        val repCand = graft.operators.FuzzyJoin
          .deletionCandidates(byName, "rep", "c_name")
          .persist(StorageLevel.MEMORY_AND_DISK) // pair count + truth probe
        val crossPairs = repCand
          .join(byName.select(col("rep").as("a_id"), col("m").as("ma")),
            "a_id")
          .join(byName.select(col("rep").as("b_id"), col("m").as("mb")),
            "b_id")
          .agg(coalesce(sum(col("ma") * col("mb")), lit(0L))
            .as("cross_pairs"))
        val samePairs = byName
          .agg(expr("sum(m * (m - 1) div 2)").as("same_pairs"))
        val truth = records.filter(col("c_custkey") >= 10000000L)
          .select((col("c_custkey") - 10000000L).as("a_id"),
            col("c_custkey").as("b_id"))
        // truth probe at rep grain: same rep -> exact-dup candidate;
        // different reps -> the rep pair must be a signature candidate.
        // ONE pass: left-join the candidate set and count same-rep OR
        // hit rows (repCand is strictly a < b, so a same-rep pair can
        // never also match the join — the two arms are disjoint).
        val truthReps = truth
          .join(records.select(col("c_custkey").as("a_id"),
            col("c_name").as("na")), "a_id")
          .join(records.select(col("c_custkey").as("b_id"),
            col("c_name").as("nb")), "b_id")
          .join(byName.select(col("c_name").as("na"),
            col("rep").as("ra")), "na")
          .join(byName.select(col("c_name").as("nb"),
            col("rep").as("rb")), "nb")
          .select(least(col("ra"), col("rb")).as("a_id"),
            greatest(col("ra"), col("rb")).as("b_id"))
        val found = truthReps
          .join(repCand.withColumn("__hit", lit(1)),
            Seq("a_id", "b_id"), "left")
          .agg(coalesce(sum(
            when(col("a_id") === col("b_id"), 1L)
              .when(col("__hit").isNotNull, 1L)
              .otherwise(0L)), lit(0L)).as("truth_found"))
        records.agg(count(lit(1)).as("n_records"))
          .crossJoin(broadcast(crossPairs))
          .crossJoin(broadcast(samePairs))
          .crossJoin(broadcast(truth.agg(count(lit(1)).as("n_truth"))))
          .crossJoin(broadcast(found))
          .select(col("n_records"),
            (col("cross_pairs") + col("same_pairs")).as("n_candidates"),
            col("n_truth"),
            col("truth_found"))
          .select(col("n_records"), col("n_candidates"), col("n_truth"),
            col("truth_found"),
            expr("truth_found * 1000000 div n_truth")
              .as("completeness_ppm"),
            expr("1000000 - n_candidates * 1000000 div " +
              "(n_records * (n_records - 1) div 2)")
              .as("reduction_ppm"))
      },
      Some(s"""WITH c AS (SELECT c_custkey, c_name FROM customer),
              recs AS (
                SELECT c_custkey, c_name FROM c
                UNION ALL
                SELECT c_custkey + 10000000, $TypoSql
                FROM c WHERE c_custkey % 10 = 0),
              sigs AS (
                SELECT c_custkey AS id,
                  unnest(list_distinct(list_transform(
                    generate_series(0, length(c_name)),
                    i -> substr(c_name, 1, i) || substr(c_name, i + 2))))
                    AS sig
                FROM recs),
              cand AS (
                SELECT DISTINCT a.id AS a_id, b.id AS b_id
                FROM sigs a JOIN sigs b
                  ON a.sig = b.sig AND a.id < b.id),
              truth AS (
                SELECT c_custkey - 10000000 AS a_id, c_custkey AS b_id
                FROM recs WHERE c_custkey >= 10000000),
              f AS (
                SELECT count(*) AS truth_found
                FROM truth WHERE EXISTS (
                  SELECT 1 FROM cand
                  WHERE cand.a_id = truth.a_id AND cand.b_id = truth.b_id)),
              tot AS (
                SELECT (SELECT count(*) FROM recs) AS n_records,
                  (SELECT count(*) FROM cand) AS n_candidates,
                  (SELECT count(*) FROM truth) AS n_truth)
              SELECT CAST(n_records AS BIGINT) AS n_records,
                CAST(n_candidates AS BIGINT) AS n_candidates,
                CAST(n_truth AS BIGINT) AS n_truth,
                CAST(truth_found AS BIGINT) AS truth_found,
                CAST(truth_found * 1000000 // n_truth AS BIGINT)
                  AS completeness_ppm,
                CAST(1000000 - n_candidates * 1000000 //
                  (n_records * (n_records - 1) // 2) AS BIGINT)
                  AS reduction_ppm
              FROM tot, f"""))
  )
}
