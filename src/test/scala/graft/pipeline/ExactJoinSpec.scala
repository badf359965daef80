package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two round-4 exact similarity joins: prefix-filtered n-gram
  * Jaccard (lossless by theorem — also gate-proven against a brute-force
  * oracle in q61) and LSH-bucketed cosine pairs (recall spec-pinned here
  * with planted near-dups; precision exact by construction). */
class ExactJoinSpec extends SparkSpec {

  import spark.implicits._

  test("ngram jaccard join: planted near-dups found, J below threshold excluded") {
    val base = (1 to 10).map(i => s"t$i").mkString(" ")
    val docs = Seq(
      (0L, base),                 // 9 bigrams
      (1L, base + " t11"),        // 10 bigrams, inter 9, uni 10 → J = 0.9
      (2L, "completely different words here entirely"),
      (3L, base),                 // exact dup of 0 → J = 1
      (4L, (1 to 10).map(i => s"t$i").reverse.mkString(" ")) // same tokens, reversed → disjoint bigrams
    ).toDF("doc_id", "text")
    // default contract: doc 3 (byte-identical to 0) collapses into a
    // `dup` edge; near rep pairs carry the implied cross-dup count
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, tNum = 4, tDen = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(5)))
    assert(out.collect { case ("dup", a, b, _) => (a, b) }.toSet == Set((0L, 3L)),
      s"wrong dup edges: ${out.toSeq}")
    assert(out.collect { case ("near", a, b, _) => (a, b) }.toSet == Set((0L, 1L)),
      s"wrong near pairs: ${out.toSeq}")
    // (0,1) stands for {0,3}×{1}: implied_pairs = 2
    assert(out.collect { case ("near", 0L, 1L, ip) => ip }.head == 2L)
    // core path (pre-collapsed corpora): the raw pair contract
    val raw = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2, tNum = 4,
      tDen = 5, collapseExact = false)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(raw == Set((0L, 1L), (0L, 3L), (1L, 3L)), s"wrong raw pairs: $raw")
  }

  test("ngram jaccard join equals the brute-force all-pairs result") {
    // Lossless-ness on real data: the prefix-filtered candidates verify to
    // exactly the same pair set as verifying EVERY pair.
    val docs = graft.queries.Tables.documents(spark, sf).limit(120)
    val grams = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        when(size(col("toks")) >= 2, array_distinct(
          transform(sequence(lit(0), size(col("toks")) - 2),
            i => concat_ws(" ", get(col("toks"), i), get(col("toks"), i + 1)))))
          .otherwise(array().cast("array<string>")).as("toks"))
      .filter(size(col("toks")) > 0)
    val ids = grams.select(col("doc_id").as("a_id"))
    val allPairs = ids.crossJoin(grams.select(col("doc_id").as("b_id")))
      .filter(col("a_id") < col("b_id"))
    val brute = Dedup.verifyJaccard(allPairs, grams, 0.0)
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val pruned = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 2,
      tNum = 4, tDen = 5, collapseExact = false) // raw pairs vs brute force
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pruned == brute, s"prefix filter lost/added pairs: " +
      s"missing=${brute -- pruned} extra=${pruned -- brute}")
  }

  test("cosine pairs: near-identical vectors pair, orthogonal/opposite don't") {
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.01f, 0f, 0f)), // cos ~ 0.99995 vs v0
      (2L, Array(0f, 1f, 0f, 0f)),       // orthogonal
      (3L, Array(-1f, 0f, 0f, 0f))       // opposite
    ).toDF("vec_id", "embedding")
    val got = Similarity.cosineNearDupPairs(emb, dim = 4, nBits = 2, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)), s"wrong pairs: $got")
  }

  test("dup-collapsed cosine pairs: members collapse, near pairs = rep-level base pairs") {
    // 5 bit-identical copies of each base vector (the sf≈1 replica
    // pathology): the deduped operator must emit 4 dup edges per group
    // (never the 10 member×member pairs), and its near pairs must equal
    // the BASE operator's pairs among the min-id representatives —
    // bucket occupancy scales with distinct vectors, not copies.
    val base = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),
      (1L, Array(0.99f, 0.01f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)))
    val copies = for ((id, v) <- base; r <- 0 until 5)
      yield (id + r * 100L, v)
    val emb = copies.toDF("vec_id", "embedding")
    val out = Similarity.cosineNearDupPairsDeduped(
      emb, dim = 4, nBits = 2, threshold = 0.9).cache()
    val dups = out.filter(col("kind") === "dup")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(dups == (for (id <- 0L to 2L; r <- 1 to 4) yield (id, id + r * 100L)).toSet,
      s"wrong dup edges: $dups")
    val near = out.filter(col("kind") === "near")
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val baseline = Similarity.cosineNearDupPairs(
        base.toDF("vec_id", "embedding"), dim = 4, nBits = 2, threshold = 0.9)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(near == baseline, s"near $near != rep-level base $baseline")
    // every member is reachable for components keep-best: rep edges +
    // rep pairs cover all 15 vectors
    val touched = (dups ++ near).flatMap(p => Seq(p._1, p._2)) ++ Seq(0L, 1L, 2L)
    assert(copies.map(_._1).toSet.subsetOf(touched),
      "a member vector is unreachable from the edge set")
    out.unpersist()
  }

  test("fused ngram_shingles agrees with the HOF reference on real docs") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
    for ((n, distinct) <- Seq((2, true), (3, true), (3, false), (5, true))) {
      // reference: staged HOF formulation (guarded sequence, concat_ws,
      // optional array_distinct) — the pre-fusion q50/q61 shape
      val hofRaw = when(size(col("toks")) >= n,
        transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", (0 until n).map(j => get(col("toks"), i + j)): _*)))
        .otherwise(array().cast("array<string>"))
      val hof = if (distinct) array_distinct(hofRaw) else hofRaw
      val diff = docs.select(
        graft.expressions.functions.ngram_shingles(col("toks"), n, distinct).as("fused"),
        hof.as("hof"))
        .filter(col("fused") =!= col("hof")).count()
      assert(diff == 0, s"n=$n distinct=$distinct: $diff docs differ fused vs HOF")
    }
  }

  test("fused ngram_shingle_hashes == xxhash64 over ngram_shingles on real docs") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
    val diff = docs.select(
      graft.expressions.functions.ngram_shingle_hashes(col("toks"), 3, distinct = true).as("fused"),
      transform(
        graft.expressions.functions.ngram_shingles(col("toks"), 3, distinct = true),
        g => xxhash64(g)).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0, s"$diff docs hash differently fused vs xxhash64-of-shingles")
  }

  test("fused lsh_bucket_long agrees with the HOF reference on every corpus vector") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), Similarity.quantize(col("embedding")).as("qe"))
    val diff = emb.select(
      graft.expressions.functions.lsh_bucket_long(col("qe"), 4).as("fused"),
      Similarity.cosineBucketHof(col("qe"), 64, 4).as("hof"))
      .filter(col("fused") =!= col("hof")).count()
    assert(diff == 0, s"$diff vectors bucket differently fused vs HOF")
  }

  test("trained IVF centroids: same dataflow, recall not worse than untrained") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    def topIds(df: org.apache.spark.sql.DataFrame) = df
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = topIds(Similarity.cosineTopK(queries, emb, 5))
    val untrained = topIds(Similarity.cosineTopKIvf(queries, emb, k = 5,
      nList = 16, nProbe = 4))
    val cents = Similarity.trainCentroids(emb, nList = 16, iters = 2)
    val trained = topIds(Similarity.cosineTopKIvf(queries, emb, k = 5,
      nList = 16, nProbe = 4, centroids = Some(cents)))
    def recall(got: Set[(Long, Long)]) =
      got.intersect(brute).size.toDouble / brute.size
    assert(cents.count() == 16)
    assert(trained.nonEmpty && trained.forall { case (q, _) => brute.exists(_._1 == q) })
    assert(recall(trained) >= recall(untrained) - 1e-9,
      s"training hurt recall: trained=${recall(trained)} untrained=${recall(untrained)}")
    assert(recall(trained) > 0.2, s"implausibly low trained recall: ${recall(trained)}")
  }

  test("k-means|| seeds: deterministic, spread out, and not worse than first-N") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val seeds = Similarity.kmeansParallelSeeds(emb, nList = 16)
    val seeds2 = Similarity.kmeansParallelSeeds(emb, nList = 16)
    // deterministic end to end (hash draws, greedy reduction)
    val s1 = seeds.orderBy("cid").collect().map(_.getLong(0)).toSeq
    assert(s1 == seeds2.orderBy("cid").collect().map(_.getLong(0)).toSeq)
    assert(s1.size == 16 && s1.distinct.size == 16, s"bad seed set: $s1")

    // quantization cost (avg 1 - cos to nearest centroid) after Lloyd:
    // seeded training must not be worse than first-N-seeded training.
    def cost(cents: org.apache.spark.sql.DataFrame): Double = {
      val wc = cents.withColumn("nc",
        graft.expressions.functions.dot_long(col("cente"), col("cente")))
      emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qe"))
        .withColumn("nq", graft.expressions.functions.dot_long(col("qe"), col("qe")))
        .join(broadcast(wc), lit(true))
        .withColumn("cscore",
          graft.expressions.functions.dot_long(col("qe"), col("cente")).cast("double") /
            (sqrt(col("nc")) * sqrt(col("nq"))))
        .groupBy(col("vec_id")).agg((lit(1.0) - max(col("cscore"))).as("c"))
        .agg(avg(col("c"))).head.getDouble(0)
    }
    val firstN = Similarity.trainCentroids(emb, nList = 16, iters = 2)
    val seeded = Similarity.trainCentroids(emb, nList = 16, iters = 2,
      seeds = Some(seeds))
    val (cf, cs) = (cost(firstN), cost(seeded))
    assert(cs <= cf + 1e-6, s"k-means|| seeding hurt: seeded=$cs firstN=$cf")
  }

  test("exact k-means|| twin: deterministic, corpus members, spread picks") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
    val run1 = Similarity.kmeansParallelSeedsExact(emb, nList = 8, over = 8, rounds = 2)
    val run2 = Similarity.kmeansParallelSeedsExact(emb, nList = 8, over = 8, rounds = 2)
    val s1 = run1.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq
    // deterministic end to end: md5 draws, integer costs, greedy picks
    assert(s1 == run2.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toSeq)).toSeq)
    assert(s1.size == 8 && s1.map(_._1).distinct.size == 8, s"bad seed set: ${s1.map(_._1)}")
    // every seed is a real corpus vector, quantized (cid -> qe membership)
    val byId = emb.select(col("vec_id"), Similarity.quantize(col("embedding")).as("qe"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    s1.foreach { case (cid, v) =>
      assert(byId.get(cid).contains(v), s"seed $cid is not its corpus vector")
    }
    // farthest-first actually spreads: no two chosen seeds are the same
    // vector, and at least one pair is far apart in cosine
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum.toDouble
      dot / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val pairsCos = for (i <- s1.indices; j <- i + 1 until s1.size)
      yield cos(s1(i)._2, s1(j)._2)
    assert(pairsCos.min < 0.999, "all seeds collapsed onto one direction")
  }

  test("cosine pairs agree with brute-force verification on real embeddings") {
    // Precision check on the corpus: every emitted pair really has
    // cos >= threshold (recomputed directly), and pair keys are a<b.
    val emb = graft.queries.Tables.embeddings(spark, sf).limit(300)
      .select(col("vec_id"), col("embedding"))
    val rows = Similarity.cosineNearDupPairs(emb, dim = 64, nBits = 4, threshold = 0.2)
      .collect()
    assert(rows.nonEmpty, "expected some pairs at threshold 0.2")
    val vecs = emb.as[(Long, Array[Float])].collect().toMap
    rows.foreach { r =>
      val (a, b) = (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"))
      assert(a < b)
      val qa = vecs(a).map(v => math.round(v.toDouble * 10000))
      val qb = vecs(b).map(v => math.round(v.toDouble * 10000))
      val dot = qa.zip(qb).map { case (x, y) => x * y }.sum
      val cos = dot / (math.sqrt(qa.map(x => x * x).sum.toDouble) *
        math.sqrt(qb.map(x => x * x).sum.toDouble))
      assert(r.getAs[Long]("dot") == dot, s"dot mismatch for ($a,$b)")
      assert(cos >= 0.2, s"below-threshold pair emitted: ($a,$b) cos=$cos")
    }
  }

  test("labelCentroidOutliers flags a planted far vector, spares the cluster") {
    import spark.implicits._
    // label 0: a tight cluster around (1, 0, 0, 0) + one far outlier;
    // label 1: a clean cluster (no outlier at the default 3/2 factor)
    val tight = (0 until 9).map(i =>
      (i.toLong, Array(1.0f + i * 0.001f, 0f, 0f, 0f), 0))
    val far = Seq((9L, Array(-5f, 5f, 5f, -5f), 0))
    // equidistant around the centroid, so every member's dist2 equals
    // the label mean and none can exceed factor x mean
    val other = (10 until 16).map(i =>
      (i.toLong, Array(0f, if (i % 2 == 0) 2.001f else 1.999f, 0f, 0f), 1))
    val emb = (tight ++ far ++ other)
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidOutliers(emb)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(9L), "planted far vector not flagged")
    assert((0 until 9).forall(i => !out(i.toLong)),
      s"cluster member falsely flagged: ${out.filter(_._2)}")
    assert((10 until 16).forall(i => !out(i.toLong)))
    // dist2 is the exact integer squared L2 to the floor-mean centroid
    val q = emb.select(col("vec_id"),
        Similarity.quantize(col("embedding")).as("qe"), col("label"))
      .as[(Long, Array[Long], Int)].collect()
    val members0 = q.filter(_._3 == 0).map(_._2)
    val cent0 = (0 until 4).map { p =>
      val s = members0.map(_(p)).sum
      Math.floorDiv(s, members0.length.toLong) // floor(sum/n)
    }
    val d9 = q.find(_._1 == 9L).get._2.zip(cent0)
      .map { case (v, c) => (v - c) * (v - c) }.sum
    val got9 = Similarity.labelCentroidOutliers(emb)
      .filter(col("vec_id") === 9L).head().getLong(2)
    assert(got9 == d9, s"dist2 mismatch: $got9 != $d9")
  }
}
