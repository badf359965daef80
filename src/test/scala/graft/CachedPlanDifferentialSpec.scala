package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** VERDICT r16 item 1 — the GlobalRank cached-plan bug hunt, generalized
  * into a standing differential gate.
  *
  * The round-16 bug class: an operator derives a frame whose PARTITIONING
  * is nondeterministic (range exchange with sampled boundaries,
  * `monotonically_increasing_id`, per-partition sketch state) and consumes
  * it from TWO OR MORE branches. If the branches compile to independent
  * exchanges, each samples its own layout; results that agree on every
  * fixed-seed fixture can diverge the moment the plan is compiled a
  * SECOND time — in particular under cached-plan compilation (a caller
  * persisting the output, or a frame derived from it, re-compiles the
  * whole physical plan into the InMemoryRelation build). GlobalRank
  * passed 15 rounds of fixtures before the r16 probe measured 466 of
  * 15000 rows surviving its pid join.
  *
  * Subset justification (VERDICT r16 asked for "every gate query or the
  * multi-branch-operator subset, justified"): every one of the gate
  * queries is already value-pinned against the DuckDB oracle each round,
  * and the oracle compare IS a second independent computation — what it
  * cannot exercise is a SECOND COMPILATION of the same Spark plan. The
  * hazard lives in the operators that fork a nondeterministically-
  * partitioned frame, so the spec drives exactly that family:
  *
  *  - [[graft.operators.GlobalRank]] / [[graft.operators.GlobalCumSum]]:
  *    the r16 bug itself — data branch + offsets branch over one range
  *    exchange (fix = single materialized exchange; GlobalRankSpec pins
  *    the original reproducer, this spec keeps the family covered);
  *  - [[graft.pipeline.Dedup.components]]: the pointer-doubling label
  *    loop forks `labels` into propagate + shortcut branches every round
  *    and forks `edges` across all rounds;
  *  - [[graft.pipeline.Skew]] `saltedJoin`/`twoPhaseSumCount`: one frame
  *    split by salt into co-consumed halves — the deterministic-hash-salt
  *    design claim, proven rather than asserted;
  *  - [[graft.operators.HeavyHitters.exact]]: the Misra–Gries sweep and
  *    the exact recount both read one keyed frame, and the sweep's output
  *    legitimately DEPENDS on partition layout — the recount must erase
  *    that dependence from the final answer;
  *  - the q37 MinHash production shape
  *    ([[graft.pipeline.Dedup.minhashNearDupPairs]]): capped bucket /
  *    verify split — candidate emission and exact verification both
  *    re-read the corpus-derived frames;
  *  - [[graft.operators.MultiDistinct.exact]]: one input fanned into
  *    1 + |distincts| aggregation branches joined back together.
  *
  * Incremental-state loops (IncrementalNearDup, StreamingCdcDedup,
  * incremental curation) are NOT re-run here: their per-batch state is
  * localCheckpoint'd — physically materialized blocks, no plan left to
  * re-compile — and their stream≡batch replay specs already run each
  * twice (Pipeline80Spec/Pipeline95Spec/IncrementalCurationSpec).
  *
  * Differential per operator — three compilations of one logical result:
  *  1. fresh build (reference);
  *  2. an independent fresh build — run-to-run determinism;
  *  3. the output persisted and materialized, then read back —
  *     cached-plan compilation, the exact r16 trigger shape.
  * All three must agree on an order-independent content hash.
  */
class CachedPlanDifferentialSpec extends SparkSpec {

  /** Order-independent content fingerprint: row count + commutative
    * bit_xor of per-row xxhash64 over every column rendered as string
    * (stable across partitionings, overflow-free under ANSI mode;
    * arrays/structs stringify deterministically). */
  private def contentHash(df: DataFrame): (Long, Long) = {
    val h = df.select(xxhash64(
      df.columns.map(c => col(c).cast("string")).toIndexedSeq: _*).as("h"))
    val r = h.agg(count(lit(1)).as("n"), expr("bit_xor(h)").as("s")).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  private def differential(label: String)(build: => DataFrame): Unit = {
    val ref = contentHash(build)
    assert(ref._1 > 0, s"$label: empty differential fixture proves nothing")
    val rerun = contentHash(build)
    assert(rerun == ref,
      s"$label: two fresh compilations disagree ($ref vs $rerun) — " +
        "a multi-branch exchange is sampling independently")
    val cached = build.persist(StorageLevel.MEMORY_AND_DISK)
    try {
      cached.count() // force the cached-plan compilation (the r16 trigger)
      val viaCache = contentHash(cached)
      assert(viaCache == ref,
        s"$label: cached-plan compilation diverged ($ref vs $viaCache) — " +
          "the GlobalRank r16 bug class; materialize the shared exchange")
    } finally cached.unpersist(blocking = true)
  }

  private def docs = graft.queries.Tables.documents(spark, sf)
    .select(col("doc_id"), col("text"))
  private def li = graft.queries.Tables.lineitem(spark, sf)

  test("GlobalRank: two-branch range exchange stable under recompilation") {
    differential("GlobalRank") {
      graft.operators.GlobalRank.rowNumber(docs, "rn", col("doc_id"))
    }
  }

  test("GlobalCumSum: offsets branch stable under recompilation") {
    differential("GlobalCumSum") {
      graft.operators.GlobalCumSum.runningSum(
        docs.withColumn("w", length(col("text")).cast("long")),
        col("w"), "run", col("doc_id"))
    }
  }

  test("Dedup.components: iterated label/edge forks stable under recompilation") {
    // near-dup pairs from the production shape; the loop itself
    // checkpoints per round — the differential proves the composition
    val pairs = graft.pipeline.Dedup.minhashNearDupPairs(
      docs, "doc_id", "text").select(col("a_id"), col("b_id"))
      .localCheckpoint()
    val nodes = docs.select(col("doc_id").as("id"))
    differential("components") {
      graft.pipeline.Dedup.components(pairs, nodes)
    }
  }

  test("Skew.saltedJoin: salt split stable under recompilation") {
    val orders = graft.queries.Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
    differential("saltedJoin") {
      graft.pipeline.Skew.saltedJoin(
        li.select(col("l_orderkey"), col("l_linenumber"), col("l_quantity")),
        orders, "l_orderkey", "o_orderkey",
        uniq = concat_ws("#", col("l_orderkey"), col("l_linenumber")),
        buckets = 8)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast("long")).as("q"))
    }
  }

  test("Skew.twoPhaseSumCount: salted partial aggregation stable under recompilation") {
    differential("twoPhaseSumCount") {
      graft.pipeline.Skew.twoPhaseSumCount(
        li, Seq("l_returnflag"),
        Seq("sum_qty" -> col("l_quantity").cast("long")),
        uniq = concat_ws("#", col("l_orderkey"), col("l_linenumber")),
        buckets = 8)
    }
  }

  test("HeavyHitters.exact: partition-dependent sweep erased by the recount") {
    // the MG sweep's candidate set is ALLOWED to vary with partition
    // layout; the exact recount must make the final answer invariant
    differential("HeavyHitters") {
      graft.operators.HeavyHitters.exact(
        li.select(col("l_returnflag")), col("l_returnflag"), k = 3)
    }
  }

  test("MinHash bucket/verify split: capped-bucket candidates stable under recompilation") {
    differential("minhashNearDupPairs") {
      graft.pipeline.Dedup.minhashNearDupPairs(docs, "doc_id", "text")
    }
  }

  test("MultiDistinct: fan-out aggregation branches stable under recompilation") {
    differential("MultiDistinct") {
      graft.operators.MultiDistinct.exact(
        li, Seq("l_returnflag"),
        Seq("nd_order" -> "l_orderkey", "nd_supp" -> "l_suppkey"))
    }
  }
}
