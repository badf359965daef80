package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate/exact nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k with the (small) query set
  * broadcast — one pass over the corpus, no shuffle of the corpus, the
  * per-pair dot product is a codegen'd `zip_with`+`aggregate` lambda
  * (no UDF). Scale path: random-hyperplane LSH bucketing so each query
  * only scans its bucket (IVF-style pruning).
  *
  * Exactness: components are quantized to `round(v*10000)` int64 before
  * the dot product, making scores exact integers (cross-engine
  * reproducible — cosine denominators derive from the same exact ints).
  */
object Similarity {

  /** Hard ceiling on rows in a driver-broadcast query set. The query side
    * of every ANN operator here is broadcast (brute force scans the
    * corpus once per executor against the in-memory queries; buckets and
    * IVF probes multiply it by a small factor), so an UNBOUNDED query set
    * grows the broadcast linearly with the caller's selection and
    * eventually kills the driver at 100 TB. The guard counts the query
    * set (one cheap job over the small side) and fails fast with the
    * scale-safe alternatives instead of OOMing mid-broadcast.
    * [[cosineTopKBucketed]] degrades gracefully: past the cap it switches
    * to a shuffle hash join on `bucket` — both sides hash-partitioned,
    * no broadcast, unbounded-safe. */
  val MaxBroadcastQueries: Long = 100000L

  /** Count the CHEAP side (the raw query input, a column-pruned scan) —
    * counting the derived broadcast frame would re-execute its whole
    * lineage (quantize / probe windows) a second time. */
  private def guardQueryCount(rawQueries: DataFrame, what: String, cap: Long): Unit = {
    val n = rawQueries.count()
    require(n <= cap,
      s"$what: query set has $n rows, over the broadcast cap $cap — " +
        "shrink the query batch, raise the cap explicitly, or use the " +
        "shuffle-join path (cosineTopKBucketed beyond the cap)")
  }

  /** Quantized int64 copy of an embedding column (fused custom
    * expression — a `transform` lambda here runs interpreted). */
  def quantize(emb: Column, scale: Double = 10000.0): Column =
    graft.expressions.functions.quantize_vec(emb, scale)

  private def dotQ(a: Column, b: Column): Column =
    graft.expressions.functions.dot_long(a, b)

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors by quantized cosine. Output: q_id, vec_id, dot, rn.
    * The query set must fit under [[MaxBroadcastQueries]] — brute force
    * over an unbounded query set is O(Q×C) however it is joined. */
  def cosineTopK(
      queries: DataFrame, // (q_id, embedding)
      corpus: DataFrame,  // (vec_id, embedding)
      k: Int,
      maxQueries: Long = MaxBroadcastQueries): DataFrame = {
    val q = queries.select(col("q_id"), quantize(col("embedding")).as("qe"))
      .withColumn("na", dotQ(col("qe"), col("qe")))
    val c = corpus.select(col("vec_id"), quantize(col("embedding")).as("ce"))
      .withColumn("nb", dotQ(col("ce"), col("ce")))
    guardQueryCount(queries, "cosineTopK", maxQueries)
    val scored = c.join(broadcast(q), lit(true))
      .withColumn("dot", dotQ(col("qe"), col("ce")))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
    scored
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("dot"), col("rn"))
  }

  /** Random-hyperplane LSH bucket id (nBits signs of deterministic
    * pseudo-random projections). Deterministic: projection weights come
    * from a hash of (bit, index) — no RNG state, cluster-reproducible.
    * Fused custom expression (graft.expressions.LshBucket): one codegen'd
    * loop per row; the HOF formulation below is kept as the spec-pinned
    * reference (SimilaritySpec differential). */
  def lshBucket(emb: Column, dim: Int, nBits: Int = 8): Column =
    graft.expressions.functions.lsh_bucket(emb, nBits)

  /** Reference HOF formulation of [[lshBucket]] — nBits ×
    * aggregate(zip_with(...)) interpreted lambdas; semantically identical
    * (same mix, same summation order), used only by the differential
    * spec. */
  private[pipeline] def lshBucketHof(emb: Column, dim: Int, nBits: Int = 8): Column = {
    val bits = (0 until nBits).map { b =>
      // w(b,i) in {-1,+1} from parity of a cheap integer mix of (b,i)
      val proj = aggregate(
        zip_with(emb, sequence(lit(0), lit(dim - 1)), (v, i) => {
          val mixed = pmod(i * lit(2654435761L) + lit(b.toLong * 40503L), lit(97L))
          when(mixed < 48, v.cast("double")).otherwise(-v.cast("double"))
        }),
        lit(0.0), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1), b)).otherwise(0)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Bucketed ANN: queries only scan their own bucket. Same output shape
    * as [[cosineTopK]] (approximate: recall < 1 across bucket borders). */
  def cosineTopKBucketed(
      queries: DataFrame, corpus: DataFrame, dim: Int, k: Int,
      nBits: Int = 4,
      maxBroadcast: Long = MaxBroadcastQueries): DataFrame = {
    val q = queries.select(col("q_id"), quantize(col("embedding")).as("qe"),
        lshBucket(col("embedding"), dim, nBits).as("bucket"))
      .withColumn("na", dotQ(col("qe"), col("qe")))
    val c = corpus.select(col("vec_id"), quantize(col("embedding")).as("ce"),
        lshBucket(col("embedding"), dim, nBits).as("bucket"))
      .withColumn("nb", dotQ(col("ce"), col("ce")))
    // Under the cap: broadcast (corpus untouched, no shuffle). Over it:
    // shuffle hash join on bucket — both sides hash-partition by bucket,
    // unbounded-query-safe at the cost of one corpus shuffle. The count
    // runs on the raw input (pruned scan), not the bucketed lineage.
    val joinedQ =
      if (queries.count() <= maxBroadcast) broadcast(q)
      else q.hint("shuffle_hash")
    c.join(joinedQ, Seq("bucket"))
      .withColumn("dot", dotQ(col("qe"), col("ce")))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("dot"), col("rn"))
  }

  /** Mean-pool quantized token vectors into one vector per document —
    * how token-level embeddings become doc-level embeddings for
    * corpus-level ANN. Engine-exact: components are int64 BEFORE the
    * pool, the per-component sum is integer (order-independent), and the
    * mean is the floor of the same IEEE quotient both engines compute
    * (the rebalanceMixture convention). One posexplode + one
    * partial+final hash aggregate + one per-doc reassembly — the token
    * vectors shuffle as (doc, pos, component) triples, never as whole
    * arrays.
    *
    * @param tokenVecs (doc_id, qe array<long>) — quantized token vectors
    * @return (doc_id, pe array<long>) — pe[i] = floor(mean of qe[i])
    */
  def meanPoolQ(tokenVecs: DataFrame): DataFrame =
    tokenVecs.select(col("doc_id"), posexplode(col("qe")))
      .groupBy(col("doc_id"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("n"))
      .select(col("doc_id"), col("pos"),
        floor(col("s") / col("n")).cast("long").as("pv"))
      .groupBy(col("doc_id"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("pv")))),
        x => x.getField("pv")).as("pe"))

  /** Embedding-QA: per-label centroid-distance outlier flags — the
    * "does this vector belong to its labeled cluster" audit a curation
    * pipeline runs before trusting labels (mislabeled or corrupt
    * embeddings sit far from their label's centroid).
    *
    * Engine-exact end to end: centroids are the floor-mean of the
    * label's quantized members per component (the [[meanPoolQ]]
    * convention), dist2 is the exact int64 squared L2 to the centroid,
    * and the outlier test `dist2 > (factorNum/factorDen) · label mean`
    * compares `dist2 · n · factorDen > sum_dist2 · factorNum` in
    * decimal128 — label sums of per-vector int64 distances overflow
    * int64 near a billion rows, so the comparison is wide on BOTH
    * engines (HUGEINT in the q113 oracle).
    *
    * Scale shape: one partial+final agg over (label, pos) triples for
    * centroids, label-cardinality broadcasts both ways, the corpus
    * scanned twice (centroid pass, distance pass) and never shuffled.
    * Output: (vec_id, label, dist2, is_outlier). */
  def labelCentroidOutliers(
      emb: DataFrame, // (vec_id, embedding, label)
      factorNum: Int = 3,
      factorDen: Int = 2): DataFrame = {
    require(factorNum > 0 && factorDen > 0,
      s"bad outlier factor: $factorNum/$factorDen")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val q = emb.select(col("vec_id"), col("label"), quantize(col("embedding")).as("qe"))
    val cent = q.select(col("label"), posexplode(col("qe")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("s"), count(lit(1)).as("cn"))
      .select(col("label"), col("pos"),
        floor(col("s") / col("cn")).cast("long").as("cv"))
      .groupBy(col("label"))
      .agg(transform(sort_array(collect_list(struct(col("pos"), col("cv")))),
        x => x.getField("cv")).as("cente"))
    val dist = q.join(broadcast(cent), "label")
      .withColumn("diff", zip_with(col("qe"), col("cente"), (a, b) => a - b))
      .select(col("vec_id"), col("label"),
        dotQ(col("diff"), col("diff")).as("dist2"))
    val stats = dist.groupBy(col("label"))
      .agg(sum(col("dist2").cast(dec)).as("sum_d"), count(lit(1)).as("n_lbl"))
    dist.join(broadcast(stats), "label")
      .select(col("vec_id"), col("label"), col("dist2"),
        (col("dist2").cast(dec) * col("n_lbl").cast(dec) * lit(factorDen).cast(dec) >
          col("sum_d") * lit(factorNum).cast(dec)).as("is_outlier"))
  }

  /** [[cosineTopKBucketed]] over ALREADY-QUANTIZED vectors with the
    * INTEGER hyperplane bucket ([[graft.expressions.LshBucketLong]]) —
    * the ANN entry point for pooled doc vectors ([[meanPoolQ]]), and
    * fully integer-exact up to the final cosine ranking, so a SQL oracle
    * can rebuild buckets and scores (the q60 convention; q104 pins the
    * pooled-ANN pipeline end to end). Same scale posture as
    * [[cosineTopKBucketed]]: query side broadcast under the cap,
    * shuffle hash join on bucket past it. */
  def cosineTopKBucketedQ(
      queriesQ: DataFrame, // (q_id, qe array<long>)
      corpusQ: DataFrame,  // (vec_id, qe array<long>)
      nBits: Int, k: Int,
      maxBroadcast: Long = MaxBroadcastQueries,
      knownQueryCount: Option[Long] = None): DataFrame = {
    val q = queriesQ.select(col("q_id"), col("qe"),
        graft.expressions.functions.lsh_bucket_long(col("qe"), nBits).as("bucket"))
      .withColumn("na", dotQ(col("qe"), col("qe")))
    val c = corpusQ.select(col("vec_id"), col("qe").as("ce"),
        graft.expressions.functions.lsh_bucket_long(col("ce"), nBits).as("bucket"))
      .withColumn("nb", dotQ(col("ce"), col("ce")))
    // The strategy probe counts the query frame, which — unlike the raw
    // scans the other guarded entry points count — may sit on a derived
    // pipeline (q104: the whole meanPoolQ dataflow), re-executed once
    // per call purely for this decision. Callers that already know the
    // size (or have persisted the frame) pass `knownQueryCount` to skip
    // the probe.
    val nQ = knownQueryCount.getOrElse(queriesQ.count())
    val joinedQ =
      if (nQ <= maxBroadcast) broadcast(q)
      else q.hint("shuffle_hash")
    c.join(joinedQ, Seq("bucket"))
      .withColumn("dot", dotQ(col("qe"), col("ce")))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("dot"), col("rn"))
  }

  /** ALL-PAIRS embedding near-dup: every corpus pair in the same
    * random-hyperplane bucket with quantized cosine >= threshold — the
    * embedding-space twin of [[Dedup.minhashNearDupPairs]] (q37): LSH
    * candidate generation, exact verification, never a cross join.
    *
    * Scale shape (same as the MinHash/SimHash pair operators): one
    * shuffle groups the corpus by bucket, in-group combinations emit
    * candidates (a self-join would recompute the quantize+bucket lineage
    * twice), the exact cosine filter runs map-side on the exploded pairs,
    * and degenerate buckets are capped (mass exact-dups belong to
    * [[Dedup.exactGroups]]). A vector lives in exactly one bucket, so no
    * dedup pass is needed. Recall < 1 across bucket borders by
    * construction (spec-pinned with planted near-dups); precision is 1
    * (candidates are verified exactly).
    *
    * The bucket here is computed over the QUANTIZED int64 components
    * (sign of sum of +-qe[i], deterministic parity mix — same weights as
    * [[lshBucketHof]]), so the whole operator is integer-exact and
    * cross-engine reproducible end to end: a SQL oracle can rebuild
    * buckets, candidates and scores bit-for-bit. The float-input fused
    * expression ([[lshBucket]]) stays the production bucket for the ANN
    * path, where candidates are approximate anyway.
    *
    * COLLAPSES exact duplicates (bit-identical quantized vectors) first
    * BY DEFAULT — it delegates to [[cosineNearDupPairsDeduped]], whose
    * output contract (kind ∈ dup/near, implied_pairs) it returns. The
    * rationale is measured, not theoretical: duplicate vectors collide
    * in every bucket and in-bucket pair generation is Σ bucket², so 10
    * corpus copies cost ~100× (BASELINE.md §"sf≈1 scale point") — and
    * at 100 TB of web crawl, duplication density is the norm.
    * `collapseExact = false` keeps the raw all-pairs core —
    * (a_id, b_id, dot, cos4), no kind column — for corpora already
    * vector-deduped upstream. */
  def cosineNearDupPairs(
      corpus: DataFrame, // (vec_id, embedding)
      dim: Int,
      nBits: Int = 4,
      threshold: Double = 0.35,
      maxBucket: Int = 10000,
      collapseExact: Boolean = true): DataFrame =
    if (collapseExact)
      cosineNearDupPairsDeduped(corpus, dim, nBits, threshold, maxBucket)
    else lshPairsOverQuantized(
      corpus.select(col("vec_id"), quantize(col("embedding")).as("qe"))
        .withColumn("na", dotQ(col("qe"), col("qe"))),
      nBits, threshold, maxBucket)

  /** The bucket-group-verify core over a pre-quantized (vec_id, qe, na)
    * frame — shared by [[cosineNearDupPairs]] and the dup-collapsed
    * [[cosineNearDupPairsDeduped]]. */
  private def lshPairsOverQuantized(
      q: DataFrame, nBits: Int, threshold: Double, maxBucket: Int): DataFrame = {
    // fused codegen'd loop (LshBucketLong); the HOF formulation below is
    // the spec-pinned reference (ExactJoinSpec differential), same
    // pattern as lshBucket/lshBucketHof.
    val bucketed = q.withColumn("bucket",
      graft.expressions.functions.lsh_bucket_long(col("qe"), nBits))
    // Degenerate buckets (e.g. a mass of all-zero embeddings) drop via
    // the two-pass count + anti-join ([[Dedup.dropOversizedBuckets]])
    // BEFORE any collect_list — this operator was the worst offender of
    // the one-pass cap's buffer hazard: its buffer holds whole quantized
    // vectors (maxBucket × dim longs), not just ids. No checkpoint here:
    // the lineage is scan+quantize (cheap to rerun for the count pass),
    // while materializing `bucketed` would copy the quantized corpus.
    val grouped = Dedup.dropOversizedBuckets(bucketed, Seq("bucket"), maxBucket)
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(struct(col("vec_id"), col("qe"), col("na")))).as("vs"))
      .filter(size(col("vs")) >= 2)
    val combos = flatten(transform(col("vs"), (a, i) =>
      transform(slice(col("vs"), i + 2, size(col("vs"))),
        b => struct(a.getField("vec_id").as("a_id"), b.getField("vec_id").as("b_id"),
          a.getField("qe").as("qa"), b.getField("qe").as("qb"),
          a.getField("na").as("na"), b.getField("na").as("nb")))))
    grouped.select(explode(combos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        dotQ(col("p.qa"), col("p.qb")).as("dot"),
        col("p.na").as("na"), col("p.nb").as("nb"))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .filter(col("cos") >= threshold)
      .select(col("a_id"), col("b_id"), col("dot"), round(col("cos"), 4).as("cos4"))
  }

  /** [[cosineNearDupPairs]] with exact-duplicate COLLAPSING first — the
    * sf≈1 replica lesson made operational (BASELINE.md §"sf≈1 scale
    * point": bit-identical vectors all collide in every LSH band, and
    * in-bucket pair generation is Σ bucket², so cost grows quadratically
    * in duplicate density — 10 copies of a corpus cost ~100×, measured).
    *
    * Collapse each distinct quantized vector to its min-id
    * representative BEFORE bucketing (one hash agg on the quantized
    * bytes — the q30 exact-dedup move in vector space), run the LSH
    * join over representatives only (bucket occupancy = DISTINCT
    * vectors), and return the compact edge set a dedup consumer
    * (components keep-best) actually needs:
    *
    *   - `kind='dup'`:  (rep_id, member_id) exact-duplicate membership,
    *     dot = ‖v‖², cos4 = 1.0, implied_pairs = 1 — the quadratic
    *     member×member pair set is NOT expanded (re-inflating it in the
    *     output would undo the fix; components reaches every member
    *     through its rep edge);
    *   - `kind='near'`: representative near-dup pairs with quantized
    *     cosine ≥ threshold, same verification as the base operator,
    *     implied_pairs = n_dups(a)·n_dups(b) (the cross-duplicate pair
    *     count each rep edge stands for).
    *
    * Integer-exact end to end like the base operator: a SQL oracle
    * rebuilds the collapse, buckets, candidates and scores bit-for-bit
    * (q152). */
  def cosineNearDupPairsDeduped(
      corpus: DataFrame, // (vec_id, embedding)
      dim: Int,
      nBits: Int = 4,
      threshold: Double = 0.35,
      maxBucket: Int = 10000): DataFrame = {
    val q = corpus.select(col("vec_id"), quantize(col("embedding")).as("qe"))
      .withColumn("k", md5(concat_ws(",", col("qe").cast("array<string>"))))
    // min-id representative per distinct quantized vector; struct min
    // orders by vec_id first, so the rep carries its own qe along.
    // Checkpoint: feeds the dup-edge join AND the LSH chain, and its
    // lineage is the corpus-wide collapse agg.
    val reps = q.groupBy(col("k"))
      .agg(min(struct(col("vec_id"), col("qe"))).as("r"),
        count(lit(1)).as("n_dups"))
      .select(col("k"), col("r.vec_id").as("vec_id"), col("r.qe").as("qe"),
        col("n_dups"))
      .localCheckpoint()
    val dups = q.select(col("k"), col("vec_id").as("member_id"))
      .join(reps.select(col("k"), col("vec_id").as("rep_id"), col("qe")), "k")
      .filter(col("member_id") =!= col("rep_id"))
      .select(lit("dup").as("kind"), col("rep_id").as("a_id"),
        col("member_id").as("b_id"), dotQ(col("qe"), col("qe")).as("dot"),
        lit(1.0).as("cos4"), lit(1L).as("implied_pairs"))
    val nd = reps.select(col("vec_id"), col("n_dups"))
    val near = lshPairsOverQuantized(
        reps.select(col("vec_id"), col("qe"))
          .withColumn("na", dotQ(col("qe"), col("qe"))),
        nBits, threshold, maxBucket)
      .join(nd.select(col("vec_id").as("a_id"), col("n_dups").as("__na")), "a_id")
      .join(nd.select(col("vec_id").as("b_id"), col("n_dups").as("__nb")), "b_id")
      .select(lit("near").as("kind"), col("a_id"), col("b_id"),
        col("dot"), col("cos4"), (col("__na") * col("__nb")).as("implied_pairs"))
    dups.union(near)
  }

  /** Reference HOF formulation of the integer bucket (differential-
    * spec'd against [[graft.expressions.LshBucketLong]]): exact long
    * sums, so equality is bit-for-bit, not float-lucky. */
  private[pipeline] def cosineBucketHof(qe: Column, dim: Int, nBits: Int): Column = {
    val bits = (0 until nBits).map { b =>
      val proj = aggregate(
        zip_with(qe, sequence(lit(0), lit(dim - 1)), (v, i) => {
          val mixed = pmod(i * lit(2654435761L) + lit(b.toLong * 40503L), lit(97L))
          when(mixed < 48, v).otherwise(-v)
        }),
        lit(0L), (acc, x) => acc + x)
      when(proj >= 0, shiftleft(lit(1), b)).otherwise(0)
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Lloyd-trained IVF centroids (spherical k-means over the quantized
    * vectors): assignment by the SAME cosine score the probe phase uses,
    * update = element-wise mean (posexplode → per-(cluster, dim) avg —
    * a partial+final aggregate, never a per-cluster collect), empty
    * clusters keep their previous centroid. The training corpus can be
    * a hash-sample (`sampleMod`) — centroid quality needs a sample, not
    * the corpus. Deterministic end to end (no RNG: seeds are the first
    * `nList` sample vectors, ties break on cid). Feed the result to
    * [[cosineTopKIvf]]'s `centroids` parameter; the probe dataflow is
    * unchanged.
    *
    * ==Prefer [[ivfCentroidsTrainedExact]]== — same Lloyd dataflow with
    * the oracle-replayable integer mean (q108 pins quantizer AND search
    * together); this float-mean variant is spec-gated only (PqSpec), for
    * the same avg-reduction-order reason as [[pqTrain]]. */
  def trainCentroids(
      corpus: DataFrame, nList: Int, iters: Int = 2,
      sampleMod: Long = 1L,
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 1 && nList >= 1 && sampleMod >= 1)
    val sample = corpus.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("qe"))
      .localCheckpoint()
    var cent = seeds.getOrElse(
        sample.orderBy(col("vec_id")).limit(nList)
          .select(col("vec_id").as("cid"), col("qe").as("cente")))
      .select(col("cid"), col("cente"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val withNc = cent.withColumn("nc", dotQ(col("cente"), col("cente")))
      val assigned = sample.join(broadcast(withNc), lit(true))
        .withColumn("cscore",
          dotQ(col("qe"), col("cente")).cast("double") / sqrt(col("nc")))
        .groupBy(col("vec_id"))
        .agg(first(col("qe")).as("qe"),
          max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("cid"))
      val means = assigned
        .select(col("cid"), posexplode(col("qe")))
        .groupBy(col("cid"), col("pos")).agg(avg(col("col")).as("m"))
        .groupBy(col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("pm"))
        .select(col("cid"),
          transform(col("pm"), s => round(s.getField("m")).cast("long")).as("mean"))
      cent = cent
        .join(means, Seq("cid"), "left")
        .select(col("cid"), coalesce(col("mean"), col("cente")).as("cente"))
        .localCheckpoint()
    }
    cent
  }

  /** k-means|| seeding (Bahmani et al., VLDB 2012) for [[trainCentroids]]
    * — the quality upgrade over the deterministic first-`nList` seeds,
    * kept deterministic: every "random" draw is a hash of (vec_id,
    * round), so the same corpus always yields the same seeds on any
    * cluster.
    *
    * Dataflow (all distributed except the final reduction):
    *  1. start from the min-vec_id sample vector;
    *  2. `rounds` times, score every sample point's cost
    *     (1 - cosine to nearest current candidate; one broadcast pass +
    *     hash agg, no window) and admit points with
    *     hash-uniform u < l*cost/totalCost — an expected `l` oversample
    *     per round, cost-proportional exactly as the paper prescribes;
    *  3. weight each candidate by the number of sample points nearest to
    *     it (one more broadcast pass + count agg);
    *  4. reduce the O(l*rounds) weighted candidates to `nList` seeds with
    *     a deterministic greedy weighted farthest-first sweep ON THE
    *     DRIVER — the candidate set is bounded by construction (that
    *     driver-side local clustering is the standard k-means|| shape;
    *     Spark MLlib's KMeans does the same with local k-means++).
    *
    * Feed the result to [[trainCentroids]]' `seeds` — Lloyd then starts
    * from spread-out, mass-weighted seeds instead of whatever the first
    * `nList` vec_ids happen to be. */
  def kmeansParallelSeeds(
      corpus: DataFrame, nList: Int,
      l: Int = 0, rounds: Int = 3,
      sampleMod: Long = 1L): DataFrame = {
    require(nList >= 1 && rounds >= 1 && sampleMod >= 1)
    val over = if (l > 0) l else 2 * nList
    val spark = corpus.sparkSession
    val sample = corpus.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("qe"))
      .withColumn("nq", dotQ(col("qe"), col("qe")))
      .filter(col("nq") > 0) // zero vectors have no cosine direction
      .localCheckpoint()
    var cands = sample.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("cid"), col("qe").as("cente"))
      .localCheckpoint()

    def costPerPoint(c: DataFrame): DataFrame = {
      val wc = c.withColumn("nc", dotQ(col("cente"), col("cente")))
      sample.join(broadcast(wc), lit(true))
        .withColumn("cscore", dotQ(col("qe"), col("cente")).cast("double") /
          (sqrt(col("nc")) * sqrt(col("nq"))))
        .groupBy(col("vec_id"))
        .agg(first(col("qe")).as("qe"),
          (lit(1.0) - max(col("cscore"))).as("cost"),
          max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("near"))
    }

    for (r <- 1 to rounds) {
      val cost = costPerPoint(cands)
      val total = cost.agg(sum(col("cost"))).head.getDouble(0)
      if (total > 0) {
        val picked = cost
          .withColumn("u",
            pmod(xxhash64(col("vec_id"), lit(r)), lit(1000000L)).cast("double") / 1e6)
          .filter(col("u") * total < col("cost") * over)
          .select(col("vec_id").as("cid"), col("qe").as("cente"))
        cands = cands.union(picked).distinct().localCheckpoint()
      }
    }

    // candidate weights = size of each candidate's nearest-neighbor cell
    val weights = costPerPoint(cands)
      .groupBy(col("near").as("cid")).agg(count(lit(1)).as("w"))
    val weighted = cands.join(weights, Seq("cid"), "left")
      .select(col("cid"), col("cente"), coalesce(col("w"), lit(0L)).as("w"))
      .collect() // bounded: O(l * rounds) candidates by construction
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))

    import spark.implicits._
    greedyFarthestFirst(weighted, nList)
      .map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "cente")
  }

  /** Deterministic greedy weighted farthest-first reduction shared by
    * [[kmeansParallelSeeds]] and [[kmeansParallelSeedsExact]]: heaviest
    * candidate first, then repeatedly the candidate maximizing
    * w * (1 - max cos to the chosen set); ties break on min cid. Every
    * double here is a single-expression IEEE value (int64 dot over
    * sqrt·sqrt — no reduction-order dependence), so an engine replaying
    * the same weighted candidates picks the same seeds (the q109 oracle
    * does, as chained selection CTEs). */
  private def greedyFarthestFirst(
      weighted: Array[(Long, Array[Long], Long)],
      nList: Int): Seq[(Long, Array[Long])] = {
    def cos(a: Array[Long], b: Array[Long]): Double = {
      var dot = 0L; var na = 0L; var nb = 0L; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) 0.0
      else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
    val chosen = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Long])]
    val remaining = scala.collection.mutable.ArrayBuffer(weighted: _*)
    while (chosen.size < nList && remaining.nonEmpty) {
      val best = remaining.minBy { case (cid, v, w) =>
        val gain =
          if (chosen.isEmpty) w.toDouble
          else w.toDouble * (1.0 - chosen.iterator.map(c => cos(v, c._2)).max)
        (-gain, cid)
      }
      chosen += ((best._1, best._2))
      remaining -= best
    }
    chosen.toSeq
  }

  /** Oracle-pinnable k-means|| seeding — the portable, integer-exact
    * twin of [[kmeansParallelSeeds]] (the q37/q51/q53 convention: the
    * production operator keeps the codegen'd xxhash64 draw, this twin
    * swaps every cross-engine-fragile step so a SQL oracle can replay
    * the WHOLE seeding, driver-side greedy reduction included):
    *
    *  - per-point cost is `greatest(floor((1 - best cos) · 10⁶), 0)` —
    *    an exact int64 derived from IEEE-deterministic doubles (int64
    *    dot / sqrt·sqrt, no reduction), so the round's total cost is an
    *    INTEGER sum (order-independent) where the float variant sums
    *    doubles in reduction order;
    *  - the admission draw is the md5-prefix uint32 (portable across
    *    engines, unlike xxhash64), admitted when
    *    u·total < cost·over·2³² — compared in decimal128, which stays
    *    exact at any corpus size (int64 products would overflow past
    *    ~4.6M sample points);
    *  - the greedy reduction is the SAME code as the float variant
    *    ([[greedyFarthestFirst]]).
    *
    * q109 replays all of it in DuckDB: `rounds` cost/draw/union rounds,
    * nearest-cell weights, and the `nList` greedy picks as chained
    * CTEs. Expected oversample per round is `over` (cost-proportional,
    * Bahmani et al. VLDB 2012), so the driver-side candidate set stays
    * O(1 + over·rounds). */
  def kmeansParallelSeedsExact(
      corpus: DataFrame, nList: Int,
      over: Int = 0, rounds: Int = 3,
      sampleMod: Long = 1L): DataFrame = {
    require(nList >= 1 && rounds >= 1 && sampleMod >= 1)
    val l = if (over > 0) over else 2 * nList
    val spark = corpus.sparkSession
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val sample = corpus.filter(pmod(col("vec_id"), lit(sampleMod)) === 0)
      .select(col("vec_id"), quantize(col("embedding")).as("qe"))
      .withColumn("nq", dotQ(col("qe"), col("qe")))
      .filter(col("nq") > 0) // zero vectors have no cosine direction
      .localCheckpoint()
    var cands = sample.orderBy(col("vec_id")).limit(1)
      .select(col("vec_id").as("cid"), col("qe").as("cente"))
      .localCheckpoint()

    // best-candidate cosine + nearest candidate per sample point (max
    // and max_by over per-pair IEEE doubles — order-independent).
    def bestCos(c: DataFrame): DataFrame = {
      val wc = c.withColumn("nc", dotQ(col("cente"), col("cente")))
      sample.join(broadcast(wc), lit(true))
        .withColumn("cscore", dotQ(col("qe"), col("cente")).cast("double") /
          (sqrt(col("nc")) * sqrt(col("nq"))))
        .groupBy(col("vec_id"))
        .agg(first(col("qe")).as("qe"),
          max(col("cscore")).as("best"),
          max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("near"))
    }

    for (r <- 1 to rounds) {
      val cost = bestCos(cands)
        .withColumn("cost",
          greatest(floor((lit(1.0) - col("best")) * lit(1e6)).cast("long"), lit(0L)))
      val total = cost.agg(coalesce(sum(col("cost")), lit(0L))).head.getLong(0)
      // total == 0 (all points ARE candidates) admits nothing via the
      // strict < below — no special case needed, and the oracle agrees.
      val u = conv(substring(md5(concat_ws(":", col("vec_id"), lit(r))), 1, 8), 16, 10)
        .cast("long")
      val picked = cost
        .filter(u.cast(dec) * lit(total).cast(dec) <
          col("cost").cast(dec) * lit(l.toLong * 4294967296L).cast(dec))
        .select(col("vec_id").as("cid"), col("qe").as("cente"))
      cands = cands.union(picked).distinct().localCheckpoint()
    }

    val weights = bestCos(cands)
      .groupBy(col("near").as("cid")).agg(count(lit(1)).as("w"))
    val weighted = cands.join(weights, Seq("cid"), "left")
      .select(col("cid"), col("cente"), coalesce(col("w"), lit(0L)).as("w"))
      .collect() // bounded: O(1 + over * rounds) expected, by construction
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))

    import spark.implicits._
    greedyFarthestFirst(weighted, nList)
      .map { case (cid, v) => (cid, v.toSeq) }
      .toDF("cid", "cente")
  }

  // ---------------------------------------------------------------- PQ

  /** Quantized subvectors: (vec_id, s, sv) — vector split into `m`
    * contiguous slices of dim/m. The shared first stage of PQ train /
    * encode / query-side distance tables. */
  private def pqSubvectors(dfQ: DataFrame, m: Int, subDim: Int): DataFrame = {
    val subs = (0 until m).map { s =>
      struct(lit(s).as("s"), slice(col("qe"), s * subDim + 1, subDim).as("sv"))
    }
    dfQ.select(col("vec_id"), explode(array(subs: _*)).as("p"))
      .select(col("vec_id"), col("p.s").as("s"), col("p.sv").as("sv"))
  }

  /** Deterministic seed codebook: per subspace, the subvectors of the
    * `ksub` lowest-vec_id corpus vectors, cid = rank 0..ksub-1. Both
    * engines can rebuild this — the q83 oracle does. */
  def pqCodebookSeed(corpus: DataFrame, m: Int, ksub: Int, dim: Int): DataFrame =
    pqCodebookSeedQ(
      corpus.select(col("vec_id"), quantize(col("embedding")).as("qe")), m, ksub, dim)

  /** [[pqCodebookSeed]] over an ALREADY-QUANTIZED (vec_id, qe) frame —
    * the entry point for residual-coupled PQ, where `qe` is an int64
    * residual rather than a quantized raw vector. */
  def pqCodebookSeedQ(corpusQ: DataFrame, m: Int, ksub: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    val seeds = corpusQ.orderBy(col("vec_id")).limit(ksub)
      .select(col("vec_id"), col("qe"))
      .withColumn("cid",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).cast("int"))
    pqSubvectors(seeds, m, subDim)
      .join(seeds.select(col("vec_id"), col("cid")), "vec_id")
      .select(col("s"), col("cid"), col("sv").as("cv"))
  }

  /** Product-quantization codebooks via per-subspace spherical Lloyd —
    * all `m` subspaces trained in ONE dataflow (sub_id is just another
    * grouping key): assignment by max integer dot against the broadcast
    * codebook, update by element-wise mean, empty clusters keep their
    * centroid. Deterministic (seeds = [[pqCodebookSeed]], ties on cid).
    * Output: (s, cid, cv array<long>).
    *
    * ==Prefer [[pqTrainExact]]== — this variant's `avg`+`round` mean is
    * NOT cross-engine reproducible (double reduction order + HALF_UP vs
    * half-even rounding edges), so it is gated by PqSpec only, while
    * [[pqTrainExact]] computes the identical Lloyd dataflow with an
    * integer round-half-up mean and is replayed bit-for-bit by the
    * DuckDB oracle (q106/q107/q108). Keep this variant only where you
    * specifically want IEEE means and accept spec-level assurance. */
  def pqTrain(
      corpus: DataFrame, m: Int, ksub: Int, dim: Int,
      iters: Int = 2): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val sample = pqSubvectors(
      corpus.select(col("vec_id"), quantize(col("embedding")).as("qe")), m, subDim)
      .localCheckpoint()
    var cb = pqCodebookSeed(corpus, m, ksub, dim).localCheckpoint()
    for (_ <- 1 to iters) {
      val assigned = sample.join(broadcast(cb), "s")
        .withColumn("fit",
          lit(2) * dotQ(col("sv"), col("cv")) - dotQ(col("cv"), col("cv")))
        .groupBy(col("vec_id"), col("s"))
        .agg(first(col("sv")).as("sv"),
          max_by(col("cid"), struct(col("fit"), -col("cid"))).as("cid"))
      val means = assigned
        .select(col("s"), col("cid"), posexplode(col("sv")))
        .groupBy(col("s"), col("cid"), col("pos")).agg(avg(col("col")).as("mv"))
        .groupBy(col("s"), col("cid"))
        .agg(sort_array(collect_list(struct(col("pos"), col("mv")))).as("pm"))
        .select(col("s"), col("cid"),
          transform(col("pm"), x => round(x.getField("mv")).cast("long")).as("mean"))
      cb = cb.join(means, Seq("s", "cid"), "left")
        .select(col("s"), col("cid"), coalesce(col("mean"), col("cv")).as("cv"))
        .localCheckpoint()
    }
    cb
  }

  /** ONE Lloyd iteration over the seed codebook with INTEGER-EXACT math
    * — the oracle-pinnable twin of [[pqTrain]]: assignment by the same
    * integer L2 fit, but the mean update is round-half-up computed as
    * `floor((2·sum + n) / (2n))` — sum and n are exact integers and the
    * division is the floor-of-the-same-IEEE-quotient convention, so
    * both engines replay the whole training step bit-for-bit (q106).
    * [[pqTrain]]'s `avg`+`round` update is NOT cross-engine exact
    * (double avg reduction order + HALF_UP vs half-even edges), which
    * is why it is spec-gated rather than oracle-pinned; this variant
    * closes that gap for single-iteration training. Empty clusters
    * keep their seed centroid. Output: (s, cid, cv array<long>). */
  def pqTrainIterExact(corpus: DataFrame, m: Int, ksub: Int, dim: Int): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    val corpusQ = corpus.select(col("vec_id"), quantize(col("embedding")).as("qe"))
    lloydStepExact(pqSubvectors(corpusQ, m, subDim),
      pqCodebookSeedQ(corpusQ, m, ksub, dim))
  }

  /** Multi-iteration integer-exact PQ training: `iters` chained
    * [[lloydStepExact]] steps from the deterministic seed codebook.
    * Every step is oracle-replayable (q107 pins iters=2), so codebook
    * CONVERGENCE — not just one update — can be audited across engines.
    * Each step: one broadcast assign + one partial-agg'd mean; the
    * subvector table is checkpointed once and reused across steps. */
  def pqTrainExact(corpus: DataFrame, m: Int, ksub: Int, dim: Int,
      iters: Int): DataFrame = {
    require(dim % m == 0 && iters >= 1, s"bad pqTrainExact params: m=$m dim=$dim iters=$iters")
    val subDim = dim / m
    val corpusQ = corpus.select(col("vec_id"), quantize(col("embedding")).as("qe"))
    val sample = pqSubvectors(corpusQ, m, subDim).localCheckpoint()
    var cb = pqCodebookSeedQ(corpusQ, m, ksub, dim).localCheckpoint()
    for (_ <- 1 to iters) cb = lloydStepExact(sample, cb).localCheckpoint()
    cb
  }

  /** Exact-trained COARSE centroids for IVF: the same oracle-replayable
    * Lloyd convention applied at the quantizer level — full-vector
    * k-means is just PQ training with one subspace (m = 1), so
    * [[pqTrainExact]] does the work and the result feeds
    * [[cosineTopKIvf]]'s `centroids` parameter (q108 pins the trained
    * quantizer AND the search built on it). cid = seed rank 0..nList-1. */
  def ivfCentroidsTrainedExact(
      corpus: DataFrame, nList: Int, dim: Int, iters: Int): DataFrame =
    pqTrainExact(corpus, m = 1, ksub = nList, dim = dim, iters = iters)
      .select(col("cid"), col("cv").as("cente"))

  /** The integer-exact Lloyd step shared by [[pqTrainIterExact]],
    * [[pqTrainExact]], [[ivfCentroidsTrainedExact]] and
    * [[ivfPqTopKDot]]'s residual-codebook training: assign every
    * subvector by the integer L2 fit against `cb`, update each codeword
    * to the round-half-up integer mean of its cell, empty cells keep
    * their codeword. */
  private def lloydStepExact(
      sample: DataFrame, // (vec_id, s, sv) from pqSubvectors
      cb: DataFrame): DataFrame = {
    val assigned = sample.join(broadcast(cb), "s")
      .withColumn("fit",
        lit(2) * dotQ(col("sv"), col("cv")) - dotQ(col("cv"), col("cv")))
      .groupBy(col("vec_id"), col("s"))
      .agg(first(col("sv")).as("sv"),
        max_by(col("cid"), struct(col("fit"), -col("cid"))).as("cid"))
    val means = assigned
      .select(col("s"), col("cid"), posexplode(col("sv")))
      .groupBy(col("s"), col("cid"), col("pos"))
      .agg(sum(col("col")).as("sm"), count(lit(1)).as("n"))
      .select(col("s"), col("cid"), col("pos"),
        floor((col("sm") * 2 + col("n")) / (col("n") * 2)).cast("long").as("mv"))
    cb.select(col("s"), col("cid"), posexplode(col("cv")))
      .withColumnRenamed("col", "seedv")
      .join(means, Seq("s", "cid", "pos"), "left")
      .groupBy(col("s"), col("cid"))
      .agg(transform(
        sort_array(collect_list(struct(col("pos"),
          coalesce(col("mv"), col("seedv")).as("v")))),
        x => x.getField("v")).as("cv"))
  }

  /** PQ encode: each vector → `m` centroid ids (nearest by integer dot
    * per subspace, ties to the lowest cid). One broadcast join + one
    * partial-agg'd argmax + one collect into the code array — the
    * corpus never shuffles more than its own m× exploded rows.
    * Output: (vec_id, codes array<int>), codes[s] = chosen cid. */
  def pqEncode(corpus: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame =
    pqEncodeQ(
      corpus.select(col("vec_id"), quantize(col("embedding")).as("qe")),
      codebook, m, dim)

  /** [[pqEncode]] over an already-quantized (vec_id, qe) frame (residual
    * encoding feeds int64 residuals here — same assignment math). */
  def pqEncodeQ(corpusQ: DataFrame, codebook: DataFrame, m: Int, dim: Int): DataFrame = {
    val subDim = dim / m
    pqSubvectors(corpusQ, m, subDim)
      .join(broadcast(codebook), "s")
      // textbook L2 assignment, integer-exact: argmin |sv-cv|^2 =
      // argmax 2*dot - |cv|^2 (raw-dot argmax would bias toward long
      // centroids). Ties to the lowest cid.
      .withColumn("fit",
        lit(2) * dotQ(col("sv"), col("cv")) - dotQ(col("cv"), col("cv")))
      .groupBy(col("vec_id"), col("s"))
      .agg(max_by(col("cid"), struct(col("fit"), -col("cid"))).as("cid"))
      .groupBy(col("vec_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("s"), col("cid")))),
        x => x.getField("cid")).as("codes"))
  }

  /** PQ top-k by asymmetric distance (dot-product ADC): each query
    * precomputes its m×ksub table of subvector⋅centroid integer dots;
    * scoring a corpus vector is then `m` table lookups (the fused
    * [[graft.expressions.functions.pq_adc_score]]) instead of a
    * dim-length dot. Score(q, x) = EXACTLY dot(q, reconstruct(codes(x)))
    * — integer, cross-engine reproducible (the q83 oracle recomputes it
    * as a join-sum). Same broadcast shape as [[cosineTopK]]: the corpus
    * is scanned once, never shuffled before the per-query top-k. */
  def pqTopKDot(
      queries: DataFrame, // (q_id, embedding)
      encoded: DataFrame, // (vec_id, codes) from [[pqEncode]]
      codebook: DataFrame,
      m: Int, ksub: Int, dim: Int, k: Int,
      maxQueries: Long = MaxBroadcastQueries): DataFrame = {
    val subDim = dim / m
    guardQueryCount(queries, "pqTopKDot", maxQueries)
    // dtable per query, flattened to m*ksub longs indexed s*ksub+cid
    val dt = pqSubvectors(
      queries.select(col("q_id").as("vec_id"), quantize(col("embedding")).as("qe")),
      m, subDim)
      .join(broadcast(codebook), "s")
      .select(col("vec_id").as("q_id"), col("s"), col("cid"),
        dotQ(col("sv"), col("cv")).as("qdot"))
      .groupBy(col("q_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("s"), col("cid"), col("qdot")))),
        x => x.getField("qdot")).as("dt"))
    encoded.join(broadcast(dt), lit(true))
      .withColumn("score",
        graft.expressions.functions.pq_adc_score(col("codes"), col("dt"), ksub))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
  }

  // ------------------------------------------------------- IVF-PQ (ADC)

  /** Deterministic coarse centroids for the integer-exact IVF-PQ path:
    * the `nList` lowest-vec_id corpus vectors, quantized, cid = rank
    * 0..nList-1 (the pqCodebookSeed convention, so an oracle can rebuild
    * them). */
  def ivfCentroidSeed(corpus: DataFrame, nList: Int): DataFrame =
    corpus.orderBy(col("vec_id")).limit(nList)
      .select(col("vec_id"), quantize(col("embedding")).as("cente"))
      .withColumn("cid",
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("vec_id"))) - 1).cast("int"))
      .select(col("cid"), col("cente"))

  /** Coarse assignment + residuals — the coupling step of IVFADC (Jégou
    * et al., "Product Quantization for Nearest Neighbor Search", PAMI
    * 2011 §IV): each vector is assigned to its nearest coarse centroid
    * by the INTEGER L2 fit (argmax 2·dot − |c|², ties to the lowest cid
    * — the pqEncode convention, so both engines agree bit-for-bit), and
    * what gets PQ-encoded is the residual `qe − cente[assigned]`, whose
    * energy is a fraction of the raw vector's — the same ksub codewords
    * quantize a much smaller ball, which is where IVFADC's accuracy
    * over raw-vector PQ comes from.
    *
    * One broadcast pass + one partial-agg'd argmax; the corpus never
    * shuffles more than its own rows. Residuals stay int64 — exact.
    * Output: (vec_id, cluster, re array<long>). */
  def ivfResiduals(corpus: DataFrame, cent: DataFrame): DataFrame =
    corpus.select(col("vec_id"), quantize(col("embedding")).as("ce"))
      .join(broadcast(cent), lit(true))
      .withColumn("fit",
        lit(2) * dotQ(col("ce"), col("cente")) - dotQ(col("cente"), col("cente")))
      .groupBy(col("vec_id"))
      .agg(first(col("ce")).as("ce"),
        max_by(struct(col("cid").as("cid"), col("cente").as("cente")),
          struct(col("fit"), -col("cid"))).as("cc"))
      .select(col("vec_id"), col("cc.cid").as("cluster"),
        zip_with(col("ce"), col("cc.cente"), (a, b) => a - b).as("re"))

  /** IVF-PQ top-k by asymmetric dot (IVFADC): coarse-quantize the corpus,
    * PQ-encode the RESIDUALS, and score a candidate as
    * `dot(q, cente[cluster]) + adc(q, residual codes)` — exactly
    * `dot(q, cente + reconstruct(codes))`, an integer both engines can
    * recompute (the q102 oracle does). Queries probe only their `nProbe`
    * best coarse lists (integer L2 fit, ties to lowest cid), so per-query
    * work is O(corpus × nProbe/nList) like [[cosineTopKIvf]], but each
    * candidate costs m table lookups instead of a dim-length dot.
    *
    * Scale shape: centroids, codebook, probes and distance tables all
    * broadcast (each bounded: nList / m·ksub / queries×nProbe rows); the
    * corpus is scanned once for assignment+encode and once for scoring,
    * never shuffled before the per-query top-k. Set `nProbe = nList` for
    * exhaustive ADC (no probe recall loss — the spec uses this to isolate
    * residual-coupling quality). */
  def ivfPqTopKDot(
      queries: DataFrame, // (q_id, embedding)
      corpus: DataFrame,  // (vec_id, embedding)
      nList: Int, m: Int, ksub: Int, dim: Int, k: Int, nProbe: Int,
      maxQueries: Long = MaxBroadcastQueries,
      trainIters: Int = 0): DataFrame = {
    require(dim % m == 0, s"m=$m must divide dim=$dim")
    val subDim = dim / m
    guardQueryCount(queries, "ivfPqTopKDot", maxQueries)
    val cent = ivfCentroidSeed(corpus, nList)
    val resid = ivfResiduals(corpus, cent) // (vec_id, cluster, re)
    val residQ = resid.select(col("vec_id"), col("re").as("qe"))
    // Codebook seeds must EXCLUDE the centroid-source vectors: each of
    // the nList lowest vec_ids is (almost always) its own nearest
    // centroid, so its residual is the zero vector — seeding from them
    // gives a degenerate all-zeros codebook whose ADC term carries no
    // information (measured: recall halved vs raw PQ). Seed from the
    // next ksub vectors by vec_id instead (oracle: LIMIT ksub OFFSET
    // nList).
    val centSrc = corpus.orderBy(col("vec_id")).limit(nList).select(col("vec_id"))
    var cb = pqCodebookSeedQ(
      residQ.join(centSrc, Seq("vec_id"), "left_anti"), m, ksub, dim)
      .localCheckpoint()
    // pq_adc_score indexes the flattened table as dt[s*ksub + cid] — a
    // SHORT codebook (corpus smaller than nList + ksub, so the post-
    // left-anti seed frame has < ksub rows) would silently misalign
    // every lookup instead of failing. Checkpointed above, so this count
    // is a local-blocks read, and the multi-consumer codebook (train,
    // encode, dt) no longer re-runs its seed lineage either.
    val cbRows = cb.count()
    require(cbRows == m.toLong * ksub,
      s"ivfPqTopKDot: residual codebook has $cbRows entries, need m*ksub=${m * ksub} — " +
        s"corpus must hold at least nList+ksub=${nList + ksub} vectors (nList=$nList " +
        s"lowest vec_ids seed the coarse centroids and are excluded from codebook seeds)")
    // Optional integer-exact Lloyd refinement of the RESIDUAL codebook
    // ([[lloydStepExact]] — same oracle-replayable convention as q106);
    // each step is one broadcast assign + one partial-agg'd mean.
    if (trainIters > 0) {
      val residSubs = pqSubvectors(residQ, m, subDim).localCheckpoint()
      for (_ <- 1 to trainIters)
        cb = lloydStepExact(residSubs, cb).localCheckpoint()
    }
    val enc = pqEncodeQ(residQ, cb, m, dim)
      .join(resid.select(col("vec_id"), col("cluster")), "vec_id")

    val q = queries.select(col("q_id"), quantize(col("embedding")).as("qe"))
    val centN = cent.withColumn("ncc", dotQ(col("cente"), col("cente")))
    val probes = q.join(broadcast(centN), lit(true))
      .withColumn("qcdot", dotQ(col("qe"), col("cente")))
      .withColumn("fit", lit(2) * col("qcdot") - col("ncc"))
      .withColumn("prn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("fit").desc, col("cid"))))
      .filter(col("prn") <= nProbe)
      .select(col("q_id"), col("cid").as("cluster"), col("qcdot"))
    // per-query table of subvector⋅codeword dots over the RAW query —
    // adc(codes) then reconstructs dot(q, residual) exactly
    val dt = pqSubvectors(
      q.select(col("q_id").as("vec_id"), col("qe")), m, subDim)
      .join(broadcast(cb), "s")
      .select(col("vec_id").as("q_id"), col("s"), col("cid"),
        dotQ(col("sv"), col("cv")).as("qdot"))
      .groupBy(col("q_id"))
      .agg(transform(
        sort_array(collect_list(struct(col("s"), col("cid"), col("qdot")))),
        x => x.getField("qdot")).as("dt"))

    enc.join(broadcast(probes.join(dt, "q_id")), Seq("cluster"))
      .withColumn("score",
        col("qcdot") +
          graft.expressions.functions.pq_adc_score(col("codes"), col("dt"), ksub))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("score").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("score"), col("rn"))
  }

  /** IVF (inverted-file) ANN — the other classic scale path besides LSH:
    * a coarse quantizer of `nList` centroids partitions the corpus into
    * cluster lists; each query probes only its `nProbe` nearest lists,
    * so per-query work drops from O(corpus) to O(corpus×nProbe/nList).
    *
    * Centroids are the first `nList` corpus vectors (deterministic, no
    * training pass); recall improves with k-means-trained centroids but
    * the dataflow — assign, invert, probe — is identical. Assignment is
    * ONE broadcast pass + a `max_by` hash aggregation (partial+final, no
    * window over the ×nList-amplified rows, so the shuffle stays
    * O(corpus)). Probes broadcast to the corpus side; only candidate
    * rows reach the final top-k shuffle. */
  def cosineTopKIvf(
      queries: DataFrame, corpus: DataFrame, k: Int,
      nList: Int = 16, nProbe: Int = 4,
      maxQueries: Long = MaxBroadcastQueries,
      centroids: Option[DataFrame] = None): DataFrame = {
    val cent = centroids.getOrElse(
      corpus.orderBy(col("vec_id")).limit(nList)
        .select(col("vec_id").as("cid"), quantize(col("embedding")).as("cente")))
      .withColumn("nc", dotQ(col("cente"), col("cente")))

    // nearest centroid per corpus vector: |ce| is constant within the
    // group, so argmax cosine = argmax dot/sqrt(|centroid|).
    val c = corpus.select(col("vec_id"), quantize(col("embedding")).as("ce"))
      .withColumn("nb", dotQ(col("ce"), col("ce")))
    val assigned = c.join(broadcast(cent), lit(true))
      .withColumn("cscore",
        dotQ(col("ce"), col("cente")).cast("double") / sqrt(col("nc")))
      .groupBy(col("vec_id"))
      .agg(first(col("ce")).as("ce"), first(col("nb")).as("nb"),
        max_by(col("cid"), struct(col("cscore"), -col("cid"))).as("cluster"))

    // each query's nProbe nearest centroid lists (tiny: queries × nList).
    val q = queries.select(col("q_id"), quantize(col("embedding")).as("qe"))
      .withColumn("na", dotQ(col("qe"), col("qe")))
    val probes = q.join(broadcast(cent), lit(true))
      .withColumn("cscore",
        dotQ(col("qe"), col("cente")).cast("double") / sqrt(col("nc")))
      .withColumn("prn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("cscore").desc, col("cid"))))
      .filter(col("prn") <= nProbe)
      .select(col("q_id"), col("qe"), col("na"), col("cid").as("cluster"))

    // probes = queries × nProbe rows — bounded by guarding the query set.
    guardQueryCount(queries, "cosineTopKIvf", maxQueries)
    assigned.join(broadcast(probes), Seq("cluster"))
      .withColumn("dot", dotQ(col("qe"), col("ce")))
      .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("vec_id"))))
      .filter(col("rn") <= k)
      .select(col("q_id"), col("vec_id"), col("dot"), col("rn"))
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): k-means-cluster the embeddings, then test
    * cosine similarity ONLY within each cluster — the clustering bounds
    * the pair fan-out to Σ cluster², which is the whole reason the
    * method scales where all-pairs cosine cannot. A vector is a
    * duplicate iff some SAME-CLUSTER vector with a smaller id clears
    * the threshold (the deterministic "dedup against earlier items"
    * rule; cross-cluster near-dups are missed by design — that is
    * SemDeDup's documented approximation).
    *
    * Exactness: clusters come from [[ivfCentroidsTrainedExact]] (the
    * oracle-replayable integer Lloyd convention) with the same
    * integer-L2 assignment the training used (argmax 2·dot − |c|²,
    * ties to the lowest cid — no sqrt anywhere in assignment). The
    * threshold test cos(a,b) ≥ thrNum/thrDen is squared into exact
    * integer arithmetic — dot > 0 ∧ dot²·thrDen² ≥ thrNum²·|a|²·|b|² —
    * compared in decimal(38,0) (int64 overflows at dim·scale⁴; the
    * q113 convention). Zero-norm vectors never match (cosine
    * undefined).
    *
    * Scale shape: centroids broadcast (nList rows); assignment is one
    * broadcast join + partial-agg'd argmax; the pair test is a
    * self-join keyed on cluster — no collect_list buffer, so a
    * degenerate cluster costs rows, not executor memory. nList must
    * grow with the corpus (the paper's own contract) to keep Σ m²
    * bounded; the assigned frame is checkpointed once and feeds both
    * join sides. Output: (vec_id, cluster, is_dup), one row per input
    * vector. */
  def semanticDedup(
      emb: DataFrame, // (vec_id, embedding)
      nList: Int, dim: Int, iters: Int,
      thrNum: Int, thrDen: Int): DataFrame = {
    require(thrNum > 0 && thrDen > 0 && thrNum <= thrDen,
      s"threshold must be a fraction in (0, 1]: $thrNum/$thrDen")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val q = emb.select(col("vec_id"), quantize(col("embedding")).as("qe"))
    val cent = ivfCentroidsTrainedExact(emb, nList, dim, iters)
    val side = q.crossJoin(broadcast(cent))
      .withColumn("fit",
        lit(2) * dotQ(col("qe"), col("cente")) - dotQ(col("cente"), col("cente")))
      .groupBy(col("vec_id"))
      .agg(first(col("qe")).as("qe"),
        max_by(col("cid"), struct(col("fit"), -col("cid"))).as("cluster"))
      .withColumn("nrm", dotQ(col("qe"), col("qe")))
      .localCheckpoint() // feeds BOTH sides of the pair join
    val dups = side.as("a")
      .join(side.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .where(col("a.nrm") > 0 && col("b.nrm") > 0)
      .withColumn("dot", dotQ(col("a.qe"), col("b.qe")))
      .where(col("dot") > 0 &&
        col("dot").cast(dec) * col("dot").cast(dec) *
          lit(thrDen.toLong * thrDen).cast(dec) >=
          lit(thrNum.toLong * thrNum).cast(dec) *
            col("a.nrm").cast(dec) * col("b.nrm").cast(dec))
      .select(col("b.vec_id").as("vec_id")).distinct()
      .withColumn("is_dup", lit(true))
    side.select(col("vec_id"), col("cluster").cast("int").as("cluster"))
      .join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cluster"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
  }

  /** ANN quality eval: per-query recall@k of an approximate top-k
    * result against the exact top-k — the metric that decides whether
    * an index's nProbe/nBits settings are good enough to ship. Both
    * inputs are (q_id, vec_id, …) frames with ≤ k rows per query (the
    * [[cosineTopK]]/[[cosineTopKIvf]]/[[ivfPqTopKDot]] output shape).
    * Output: (q_id, n_hits, recall_bp) — hits = |ann ∩ exact| per
    * query, recall in integer basis points (n_hits·10000 div k, exact
    * in both engines). Every query in `exact` gets a row (an ANN miss
    * of the whole query scores 0, it doesn't vanish).
    *
    * Scale shape: both sides are k·|Q| rows — a shuffle join on
    * (q_id, vec_id) between two query-set-sized frames, partial-agg'd
    * count, then a left join on q_id. Nothing here touches the corpus;
    * cost is owned by the two search calls that feed it. */
  def annRecallAtK(ann: DataFrame, exact: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"recall@k needs k >= 1, got $k")
    val hits = ann.select(col("q_id"), col("vec_id"))
      .join(exact.select(col("q_id"), col("vec_id")), Seq("q_id", "vec_id"))
      .groupBy(col("q_id"))
      .agg(count(lit(1)).as("n_hits"))
    exact.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        floor(coalesce(col("n_hits"), lit(0L)) * 10000 / k).cast("long")
          .as("recall_bp"))
  }
}
