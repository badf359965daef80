package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "spark engines shuffle data across many executors"),
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (4L, "completely different content about databases and queries")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val groups = Dedup.exactGroups(docs, "doc_id", "text")
      .filter(col("n_dups") > 1).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("keep_id") == 0L)
    assert(groups.head.getAs[Long]("n_dups") == 2L)
  }

  test("minhash LSH finds near-dup pair and skips unrelated docs") {
    // default contract: the exact dup (0,3) arrives as a `dup` membership
    // edge (never a squared member×member pair), near-dups as rep pairs
    val rows = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleK = 2, threshold = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val dups = rows.collect { case ("dup", a, b) => (a, b) }.toSet
    assert(dups == Set((0L, 3L)), s"wrong dup edges: ${rows.toSeq}")
    val near = rows.collect { case ("near", a, b) => (a, b) }.toSet
    assert(near.contains((0L, 1L)), s"near-dup rep pair missing: $near")
    assert(!rows.exists(p => p._2 == 2L || p._3 == 2L), s"false pair: ${rows.toSeq}")
    // the core path (pre-collapsed corpora) keeps the raw pair contract
    val raw = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
      numHashes = 32, bands = 16, shingleK = 2, threshold = 0.5,
      collapseExact = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(raw.contains((0L, 3L)) && raw.contains((0L, 1L)), s"raw: $raw")
  }

  test("incremental near-dup loop equals the batch operator across micro-batches") {
    val all = graft.queries.Tables.documents(spark, sf)
    val corpus = all.filter(col("doc_id") < 300)
    val arriving = all.filter(col("doc_id") >= 300).select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("docs_inc")
    arriving.repartition(2).write.mode("overwrite").parquet(dir.toString)

    val got = scala.collection.mutable.ArrayBuffer[(String, Long, Long)]()
    val inc = new Dedup.IncrementalNearDup(corpus, "doc_id", "text",
      onPairs = df => got.synchronized {
        got ++= df.select("kind", "a_id", "b_id").collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      })
    val stream = spark.readStream.schema(arriving.schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(dir.toString)
    val q = inc.start(stream)
    q.processAllAvailable()
    q.stop()

    // EXPAND the collapsed emission (the batch-twin contract): group
    // membership = rep + emitted dup-edge members + the rep's
    // corpus-internal byte-dup members (corpus structure is the batch
    // operator's job, so the expander supplies it); a near rep pair
    // stands for members(a) x members(b); a dup group for its in-group
    // pairs. Restricted to pairs touching an arrival, this must equal
    // the RAW batch operator on corpus+arrivals.
    val corpusGroups = corpus
      .select(md5(col("text")).as("h"), col("doc_id")).collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1).values.map(_.map(_._2).sorted)
      .filter(_.size > 1).map(ms => ms.head -> ms.toSeq).toMap
    val members = scala.collection.mutable.Map[Long, Set[Long]]()
      .withDefault(id => corpusGroups.getOrElse(id, Seq(id)).toSet)
    got.collect { case ("dup", rep, m) =>
      members(rep) = members(rep) + m
    }
    def norm(a: Long, b: Long) = (math.min(a, b), math.max(a, b))
    val inGroup: Seq[(Long, Long)] = members.keys.toSeq.flatMap { rep =>
      val ms = members(rep).toSeq
      for (i <- ms.indices; j <- (i + 1) until ms.size)
        yield norm(ms(i), ms(j))
    }
    val cross: Seq[(Long, Long)] =
      got.toSeq.collect { case ("near", a, b) => (a, b) }.flatMap {
        case (a, b) =>
          (for (x <- members(a); y <- members(b)) yield norm(x, y)).toSeq
      }
    val expanded = (inGroup ++ cross).toSet
      .filter(p => p._1 >= 300 || p._2 >= 300)

    val expected = Dedup.minhashNearDupPairs(all, "doc_id", "text",
        collapseExact = false) // raw ground truth, expanded granularity
      .select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => a >= 300 || b >= 300 }.toSet
    assert(expected.nonEmpty, "fixture has no cross/new near-dup pairs")
    assert(expanded == expected,
      s"missing=${(expected -- expanded).take(5)} extra=${(expanded -- expected).take(5)}")
  }

  test("incremental near-dup absorbs exact-dup arrivals as members (default)") {
    import spark.implicits._
    // VERDICT r11 item 2: 5 copies of dupText across corpus+batch used
    // to blow past maxBucket=2 and silently stop emitting; the collapsed
    // default absorbs arrivals 4,5 as members of corpus rep 1 (dup
    // edges, no bucket growth — the cap never binds); byte-identical
    // arrival 11 is likewise a dup edge of corpus doc 10. Corpus-internal
    // dups (1,2),(1,3) are the batch operator's job and NOT re-reported.
    val dupText = "alpha beta gamma delta epsilon zeta eta theta"
    val pairText = "one two three four five six seven eight nine ten"
    val corpus = Seq((1L, dupText), (2L, dupText), (3L, dupText),
      (10L, pairText)).toDF("doc_id", "text")
    val batch = Seq((4L, dupText), (5L, dupText), (11L, pairText))
      .toDF("doc_id", "text")
    val got = scala.collection.mutable.Set[(String, Long, Long, Long)]()
    val inc = new Dedup.IncrementalNearDup(corpus, "doc_id", "text",
      maxBucket = 2,
      onPairs = df => got ++= df
        .select("kind", "a_id", "b_id", "implied_pairs")
        .as[(String, Long, Long, Long)].collect())
    inc.processBatch(batch, 0L)
    assert(got.toSet == Set(("dup", 1L, 4L, 1L), ("dup", 1L, 5L, 1L),
      ("dup", 10L, 11L, 1L)), s"got $got")

    // the raw contract (collapseExact = false) keeps the old behavior:
    // the oversized bucket stops emitting, exact dups are exactGroups' job
    val gotRaw = scala.collection.mutable.Set[(Long, Long)]()
    val incRaw = new Dedup.IncrementalNearDup(corpus, "doc_id", "text",
      maxBucket = 2, collapseExact = false,
      onPairs = df => gotRaw ++= df.select("a_id", "b_id")
        .as[(Long, Long)].collect())
    incRaw.processBatch(batch, 0L)
    assert(gotRaw.toSet == Set((10L, 11L)), s"got $gotRaw")
  }

  test("incremental near-dup: in-batch dups collapse, implied_pairs tracks n_dups") {
    import spark.implicits._
    // batch 0 brings a NEW 3-way dup group (20 rep, 21, 22) near-matching
    // corpus doc 1 (one word changed): expect 2 in-batch dup edges and a
    // near rep pair (1,20) with implied_pairs = n_dups(1)*n_dups(20) = 3.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val aNear = "alpha beta gamma delta epsilon zeta eta iota"
    val corpus = Seq((1L, a)).toDF("doc_id", "text")
    val batch = Seq((20L, aNear), (21L, aNear), (22L, aNear))
      .toDF("doc_id", "text")
    val got = scala.collection.mutable.Set[(String, Long, Long, Long)]()
    val inc = new Dedup.IncrementalNearDup(corpus, "doc_id", "text",
      bands = 16, shingleK = 2, tNum = 3, tDen = 5, // DedupSpec's minhash shape
      onPairs = df => got ++= df
        .select("kind", "a_id", "b_id", "implied_pairs")
        .as[(String, Long, Long, Long)].collect())
    inc.processBatch(batch, 0L)
    val dups = got.collect { case ("dup", r, m, _) => (r, m) }
    assert(dups == Set((20L, 21L), (20L, 22L)), s"got $got")
    val near = got.collect { case ("near", x, y, n) => (x, y, n) }
    assert(near == Set((1L, 20L, 3L)), s"got $got")
  }

  test("incremental near-dup with table-backed state survives a restart") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("inc_state").toString
    val textA = "zero one two three four five six seven eight nine"
    val corpus = Seq((1L, "completely different words here entirely"),
      (2L, "another unrelated document body text")).toDF("doc_id", "text")
    val batch1 = Seq((20L, textA)).toDF("doc_id", "text")
    val batch2 = Seq((30L, textA)).toDF("doc_id", "text")

    val got1 = scala.collection.mutable.Set[(Long, Long)]()
    val a = new Dedup.IncrementalNearDup(corpus, "doc_id", "text",
      stateDir = Some(dir),
      onPairs = df => got1 ++= df.select("a_id", "b_id").as[(Long, Long)].collect())
    a.processBatch(batch1, 0L)
    assert(got1.isEmpty, s"batch1 matches nothing yet: $got1")

    // "restart": a fresh instance on the same dir must rehydrate batch-1
    // state (NOT re-seed from the corpus alone) — 30 is byte-identical
    // to 20, so the (20,30) dup edge is only findable through the
    // persisted batch-1 digest state.
    val got2 = scala.collection.mutable.Set[(Long, Long)]()
    val b = new Dedup.IncrementalNearDup(corpus, "doc_id", "text",
      stateDir = Some(dir),
      onPairs = df => got2 ++= df.select("a_id", "b_id").as[(Long, Long)].collect())
    b.processBatch(batch2, 1L)
    assert(got2.toSet == Set((20L, 30L)), s"lost batch-1 state: $got2")

    // at-least-once replay of the same batch is idempotent: partition
    // overwritten, state row count unchanged, same pairs re-emitted.
    val before = spark.read.parquet(s"$dir/buckets").count()
    got2.clear()
    b.processBatch(batch2, 1L)
    assert(spark.read.parquet(s"$dir/buckets").count() == before,
      "replaying a batch duplicated state")
    assert(got2.toSet == Set((20L, 30L)), s"replay emitted different pairs: $got2")
  }

  test("simhash: near-dups at small hamming distance, unrelated far") {
    val sigs = Dedup.simhash64(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sigs(0L) == sigs(3L))
    assert(ham(sigs(0L), sigs(1L)) < ham(sigs(0L), sigs(2L)),
      s"expected near-dup closer than unrelated: ${sigs.toSeq}")
  }

  test("simhash banded pair join: recalls planted near-dups, rejects unrelated") {
    // Default contract: the exact dup (0,3) is a `dup` edge at hamming 0;
    // the one-word-changed near-dup lands within maxHamming as a rep pair.
    val rows = Dedup.simhashPairs(docs, "doc_id", "text",
      bands = 4, maxHamming = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    val dups = rows.collect { case ("dup", a, b, h) => (a, b, h) }.toSet
    assert(dups == Set((0L, 3L, 0)), s"wrong dup edges: ${rows.toSeq}")
    assert(!rows.exists(p => p._2 == 4L || p._3 == 4L),
      s"unrelated doc paired: ${rows.toSeq}")
    // pigeonhole guarantee: every pair emitted respects the verify bound
    assert(rows.forall(_._4 <= 3))
    // core path keeps the raw contract (and hamming-0 exact-dup pair)
    val raw = Dedup.simhashPairs(docs, "doc_id", "text",
      bands = 4, maxHamming = 3, collapseExact = false).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(raw.collect { case (0L, 3L, h) => h }.head == 0, s"raw: ${raw.toSeq}")
  }

  test("components of an edgeless graph: every node is its own component") {
    import spark.implicits._
    // a clean corpus produces ZERO near-dup pairs — the label loop must
    // not run (its sum-fixpoint probe would read sum(empty) = NULL)
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val out = Dedup.components(pairs, nodes).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 3L), s"got $out")
  }

  test("components: the per-round prop join re-exchanges neither side") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // replicate one round's join shape: edges pre-partitioned on src
      // and PERSISTED (InMemoryRelation keeps hashpartitioning;
      // localCheckpoint under AQE loses it) — the per-round join never
      // re-exchanges the edge side, only the small label frame moves.
      // This is what makes the iteration O(labels moved), not
      // O(E × rounds), at scale.
      val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
      val edges = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
        .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
        .repartition(col("src"))
        .persist()
      try {
        edges.count()
        val labels = edges.select(col("src").as("id"))
          .groupBy(col("id")).agg(min(col("id")).as("lbl"))
          .localCheckpoint()
        val prop = edges
          .join(labels.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id"), col("lbl"))
        val plan = prop.queryExecution.executedPlan.toString
        // ENSURE_REQUIREMENTS exchanges are the per-round re-shuffles
        // (the REPARTITION_BY_COL inside the cached relation is the
        // pay-once layout build); at most the label side may move —
        // two would mean the persisted edge layout was thrown away too
        val nEx = plan.linesIterator
          .count(l => l.contains("Exchange") && l.contains("ENSURE_REQUIREMENTS"))
        assert(nEx <= 1,
          s"prop join re-exchanged the pre-partitioned edge side:\n${plan.take(1500)}")
        assert(plan.contains("InMemoryTableScan"), plan.take(600))
      } finally edges.unpersist(blocking = false)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("connected components: chains merge to min id, isolates stay solo") {
    // graph: 1-2-3 chain, 5-6 pair, 4 isolated (label must hop the chain,
    // proving >1 propagation round converges)
    val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    val comp = Dedup.components(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L),
      s"got $comp")
  }

  test("components: reliable-checkpoint path matches localCheckpoint exactly") {
    // checkpointDir switches per-round lineage cuts to reliable
    // checkpoint() files (survive executor loss on a cluster); the
    // fixpoint must be byte-identical, and the checkpoint dir must
    // actually be used.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_").toString
    try {
      val pairs = Seq((2L, 3L), (1L, 2L), (5L, 6L)).toDF("a_id", "b_id")
      val nodes = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
      val local = Dedup.components(pairs, nodes)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val reliable = Dedup.components(pairs, nodes, checkpointDir = Some(dir))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(reliable == local, s"reliable $reliable != local $local")
      val written = new java.io.File(dir).listFiles()
      assert(written != null && written.nonEmpty,
        s"no reliable checkpoint data written under $dir")
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("jaccard verification is exact") {
    val pairs = Seq((0L, 1L)).toDF("a_id", "b_id")
    val got = Dedup.verifyJaccard(pairs, Dedup.tokenArrays(docs, "doc_id", "text"), 0.0)
      .collect().head
    // doc0/doc1 distinct tokens: 8 each ("the" repeats), intersection 7
    assert(got.getAs[Long]("inter") == 7L)
    assert(got.getAs[Long]("uni") == 9L)
  }
}

class SimilaritySpec extends SparkSpec {

  test("trained IVF recall@k >= seed-centroid recall on aggregate (q138 claim)") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val exact = Similarity.cosineTopK(queries, emb, 5).localCheckpoint()
    val seed = Similarity.cosineTopKIvf(queries, emb, k = 5,
      nList = 16, nProbe = 4)
    val cent = Similarity.ivfCentroidsTrainedExact(emb, 16, 64, iters = 1)
    val trained = Similarity.cosineTopKIvf(queries, emb, k = 5,
      nList = 16, nProbe = 4, centroids = Some(cent))
    def total(ann: org.apache.spark.sql.DataFrame): Long =
      Similarity.annRecallAtK(ann, exact, 5)
        .agg(sum(col("recall_bp"))).head.getLong(0)
    val (ts, us) = (total(trained), total(seed))
    // not a pointwise guarantee (a Lloyd step can hurt one query);
    // the index-quality claim is the aggregate
    assert(ts >= us, s"trained total $ts < seed total $us")
  }

  test("cosine top-1 of a corpus vector is itself") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val top = Similarity.cosineTopK(queries, emb, 3).collect()
    assert(top.head.getAs[Long]("vec_id") == 7L, "top-1 must be the query itself")
    assert(top.length == 3)
  }

  test("semanticDedup flags planted near-dups, keeps firsts and zero vectors") {
    import spark.implicits._
    val emb = Seq(
      (0L, Array(1f, 0f, 0f, 0f)),     // kept: no smaller id
      (1L, Array(1f, 0f, 0f, 0f)),     // exact dup of 0
      (2L, Array(0.99f, 0.01f, 0f, 0f)), // cos vs 0 ~ 0.99995
      (3L, Array(0f, 1f, 0f, 0f)),     // orthogonal: kept
      (4L, Array(0f, 0f, 0f, 0f))      // zero norm: cosine undefined, kept
    ).toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(emb, nList = 2, dim = 4, iters = 1,
        thrNum = 95, thrDen = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(0L -> false, 1L -> true, 2L -> true,
      3L -> false, 4L -> false), s"got $out")
  }

  test("fused lsh_bucket agrees with the HOF reference on every corpus vector") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    for (nBits <- Seq(4, 8)) {
      val bad = emb.select(col("vec_id"),
          Similarity.lshBucket(col("embedding"), 64, nBits).as("fused"),
          Similarity.lshBucketHof(col("embedding"), 64, nBits).as("hof"))
        .collect().filter(r => r.getInt(1) != r.getInt(2))
      assert(bad.isEmpty,
        s"nBits=$nBits diverges: ${bad.take(3).map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq}")
    }
  }

  test("bucketed ANN returns the query itself too (same bucket trivially)") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") === 7)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val top = Similarity.cosineTopKBucketed(queries, emb, dim = 64, k = 3)
      .collect()
    assert(top.nonEmpty && top.head.getAs[Long]("vec_id") == 7L)
  }

  test("brute-force ANN refuses an over-cap query set instead of broadcasting it") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val queries = emb.select(col("vec_id").as("q_id"), col("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.cosineTopK(queries, emb, k = 3, maxQueries = 10).collect()
    }
    assert(e.getMessage.contains("broadcast cap"))
  }

  test("bucketed ANN over the cap degrades to a shuffle join, same results") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 100 === 7)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getLong(1), r.getInt(3))
    val viaBroadcast = Similarity.cosineTopKBucketed(queries, emb, dim = 64, k = 3)
      .collect().map(key).toSet
    val viaShuffle = Similarity.cosineTopKBucketed(queries, emb, dim = 64, k = 3,
      maxBroadcast = 0).collect().map(key).toSet
    assert(viaShuffle == viaBroadcast,
      s"join strategies disagree: ${viaShuffle.diff(viaBroadcast).take(3)}")
  }

  test("pooled ANN: every pooled query finds itself first; recall vs brute force is sane") {
    val pooled = Similarity.meanPoolQ(
      graft.queries.Tables.embeddings(spark, sf)
        .select(expr("vec_id div 10").as("doc_id"),
          Similarity.quantize(col("embedding")).as("qe")))
      .localCheckpoint()
    val corpusQ = pooled.select(col("doc_id").as("vec_id"), col("pe").as("qe"))
    val queriesQ = pooled.filter(col("doc_id") % 10 === 0)
      .select(col("doc_id").as("q_id"), col("pe").as("qe"))
    val got = Similarity.cosineTopKBucketedQ(queriesQ, corpusQ, nBits = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // a vector shares its own bucket and has cosine 1 with itself
    queriesQ.collect().map(_.getLong(0)).foreach { qid =>
      assert(got.contains((qid, qid, 1)), s"pooled query $qid is not its own top-1")
    }
    // bucketed results restricted to brute force's in-bucket order: every
    // returned neighbor must appear in the exact top-|bucket| ranking —
    // cheap sanity via exact top-k superset at k = corpus size
    val exact = corpusQ.join(broadcast(
        queriesQ.select(col("q_id"), col("qe").as("qq"))), lit(true))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.functions.dot_long(col("qq"), col("qe")).as("dot"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got.foreach { case (q, v, _) =>
      assert(exact.contains((q, v)), s"pooled ANN returned unknown pair ($q, $v)")
    }
  }

  test("IVF ANN: self is found, and recall vs brute force is sane") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") % 50 === 7)
      .select(col("vec_id").as("q_id"), col("embedding"))
    val exact = Similarity.cosineTopK(queries, emb, 5).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.cosineTopKIvf(queries, emb, k = 5,
      nList = 16, nProbe = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every query must at least find itself (it probes its own cluster)
    queries.collect().map(_.getLong(0)).foreach { qid =>
      assert(ivf.contains((qid, qid)), s"query $qid did not find itself")
    }
    val recall = ivf.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall too low (untrained centroids)")
  }

  test("annRecallAtK: identical inputs score 10000 bp; a missed query scores 0") {
    import spark.implicits._
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 21L, 2),
      (3L, 30L, 1), (3L, 31L, 2)).toDF("q_id", "vec_id", "rn")
    // q1 perfect, q2 half right, q3 entirely missed by the index
    val ann = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1), (2L, 99L, 2))
      .toDF("q_id", "vec_id", "rn")
    val got = Similarity.annRecallAtK(ann, exact, 2).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == Map(1L -> ((2L, 10000L)), 2L -> ((1L, 5000L)),
      3L -> ((0L, 0L))), s"got $got")
  }
}

class TextAnalysisSpec extends SparkSpec {

  test("contamination flags stream in append mode == the batch operator") {
    import spark.implicits._
    val all = graft.queries.Tables.documents(spark, sf)
    val bench = TextAnalysis.benchShingleHashSet(
      all.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
      .localCheckpoint() // static side: materialize once, stream reuses it
    val corpus = all.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text"))
    val expected = TextAnalysis.contaminationFlags(
      corpus, bench, "doc_id", "text", 8)
      .as[(Long, Long)].collect().toMap
    assert(expected.values.exists(_ > 0), "fixture has no contaminated docs")

    val dir = java.nio.file.Files.createTempDirectory("flags_stream").toString
    corpus.repartition(3).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(corpus.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    // APPEND mode with no watermark — the operator is a pure projection
    // over a 1-row stream-static join, so it needs no state at all
    val q = TextAnalysis.contaminationFlags(stream, bench, "doc_id", "text", 8)
      .writeStream.format("memory").queryName("flags_mem")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("flags_mem").as[(Long, Long)].collect().toMap
    assert(got == expected,
      s"stream != batch: missing=${(expected.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- expected.toSet).take(3)}")
  }

  test("token/quality facets on a literal") {
    val f = TextAnalysis.qualityFacets(lit("The quick fox! 42 times."))
    val r = spark.range(1).select(f.as("f")).select(
      col("f.n_chars"), col("f.n_tokens"), col("f.n_stop"),
      col("f.n_digits"), col("f.n_punct")).collect().head
    assert(r.getInt(0) == 24)
    assert(r.getInt(1) == 5)
    assert(r.getInt(2) == 1)  // "the"
    assert(r.getInt(3) == 2)  // "42"
    assert(r.getInt(4) == 2)  // "!" "."
  }

  test("lang-id picks the marker-heavy language") {
    val r = spark.range(1).select(
      TextAnalysis.langScores(lit("el mundo con los datos con el tiempo"))
        .getField("pred")).collect().head.getString(0)
    assert(r == "es")
  }

  test("fingerprint is stable and content-defined") {
    import spark.implicits._
    val docs = Seq((1L, "abcdefghij"), (2L, "abcdefghij"), (3L, "zzzzzzzzzz"))
      .toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(3L))
  }

  test("fused fingerprint agrees with the explode+min reference on real docs") {
    val docs = graft.queries.Tables.documents(spark, sf)
    val fused = TextAnalysis.fingerprint(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val ref = TextAnalysis.fingerprintExplode(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fused == ref,
      s"diverges on ${fused.keySet.filter(k => fused(k) != ref.getOrElse(k, null)).take(3)}")
  }

  test("winnowing guarantee: docs sharing >= w+k-1 chars share a fingerprint") {
    import spark.implicits._
    // shared run of 30 chars (> 16+8-1 = 23) embedded in different contexts
    val p = "zqxwvutsrqponmlkjihgfedcbazyxw"
    val docs = Seq(
      (1L, s"left padding text $p and a tail"),
      (2L, s"completely other prefix $p distinct suffix here"),
      (3L, "no overlap with anything else at all in this one")
    ).toDF("doc_id", "text")
    val sets = TextAnalysis.winnowSets(docs, "doc_id", "text", k = 8, w = 16)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    assert((sets(1L) & sets(2L)).nonEmpty, "shared substring missed")
    assert((sets(1L) & sets(3L)).isEmpty, "false sharing with disjoint doc")
    // rollup agrees with the set
    val roll = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(roll(1L) == sets(1L).size.toLong)
  }

  test("winnowPairs finds the planted pair, drops boilerplate fingerprints") {
    import spark.implicits._
    val boiler = "this boilerplate footer appears everywhere"
    val p = "qwertzuiopasdfghjklyxcvbnm0192837465qazwsxedcrfvtgbyhnujmikolp" +
      "plokmijnuhbygvtfcrdxeszwaq1234567890"
    val docs = (
      Seq((1L, s"first unique lead-in $p $boiler"),
        (2L, s"second distinct opener $p $boiler")) ++
      (3L to 12L).map(i => (i, s"${i.toString * 30} $boiler"))
    ).toDF("doc_id", "text")
    val pairs = TextAnalysis.winnowPairs(docs, "doc_id", "text",
        k = 8, w = 16, minShared = 2, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the boilerplate footer is in all 12 docs (df 12 > 10) -> its
    // fingerprints are dropped; only the planted 98-char shared region
    // links docs 1 and 2
    assert(pairs.contains((1L, 2L)), s"planted pair missed: $pairs")
    assert(pairs.forall(_ == ((1L, 2L))), s"boilerplate leaked pairs: $pairs")
  }

  test("fused winnow_mins agrees with the HOF reference on every fixture doc") {
    val docs = graft.queries.Tables.documents(spark, sf)
    for ((k, w) <- Seq((8, 16), (5, 4))) {
      val fused = TextAnalysis.winnowSets(docs, "doc_id", "text", k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val ref = TextAnalysis.winnowSetsHof(docs, "doc_id", "text", k, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val bad = fused.keySet.filter(id => fused(id) != ref(id))
      assert(bad.isEmpty, s"k=$k w=$w diverges on ${bad.take(3)}: " +
        s"${bad.headOption.map(id => (fused(id).take(3), ref(id).take(3)))}")
    }
  }

  test("winnow_spans positions match a per-window HOF reconstruction") {
    val docs = graft.queries.Tables.documents(spark, sf).limit(80)
    val (k, w) = (8, 16)
    val fused = docs.select(col("doc_id"),
        explode(graft.expressions.functions.winnow_spans(col("text"), k, w))
          .as("s"))
      .select(col("doc_id"), col("s.fp"), col("s.lo"), col("s.hi"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    // reference: materialize every window's min with its 1-based start,
    // then min/max start per (doc, fp) — the q139 oracle's shape.
    val ref = docs.select(col("doc_id"),
        transform(
          sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
          i => md5(col("text").substr(i, lit(k)))).as("h"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("h")) - (w - 1), lit(1))),
          j => array_min(slice(col("h"), j, lit(w))))))
      .select(col("doc_id"), (col("pos") + 1).as("j"), col("col").as("fp"))
      .groupBy(col("doc_id"), col("fp"))
      .agg(min(col("j")).as("lo"), max(col("j")).as("hi"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getInt(2), r.getInt(3)))).toMap
    assert(fused == ref,
      s"diverges on ${(fused.keySet ++ ref.keySet).filter(x =>
        fused.get(x) != ref.get(x)).take(3)}")
  }

  test("winnow_spans stays O(n) on a long document (500k chars, bounded wall)") {
    import spark.implicits._
    // one 500k-char doc -> ~500k shingle hashes through the monotonic
    // deque; a quadratic or O(n*w) regression would blow far past the
    // bound (the spanCorrupt long-doc lesson applied to winnowing)
    val text = {
      val r = new scala.util.Random(42)
      val sb = new StringBuilder
      while (sb.length < 500000) { sb.append(('a' + r.nextInt(26)).toChar) }
      sb.toString
    }
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val t0 = System.nanoTime
    val n = docs.select(
        size(graft.expressions.functions.winnow_spans(col("text"), 8, 16)))
      .head.getInt(0)
    val secs = (System.nanoTime - t0) / 1e9
    assert(n > 0)
    assert(secs < 30.0, f"500k-char winnow_spans took $secs%.1f s — not linear")
  }

  test("winnow_spans fingerprint set equals winnow_mins, order included") {
    val docs = graft.queries.Tables.documents(spark, sf).limit(80)
    val a = docs.select(col("doc_id"),
        graft.expressions.functions.winnow_mins(col("text"), 8, 16).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val b = docs.select(col("doc_id"),
        graft.expressions.functions.winnow_spans(col("text"), 8, 16).as("s"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(_.getString(0))).toMap
    assert(a == b)
  }

  test("bm25Search ranks tf-dense short docs first; query term repeats collapse") {
    import spark.implicits._
    val docs = Seq((1L, "apple banana"), (2L, "apple apple apple"),
      (3L, "cherry")).toDF("doc_id", "text")
    // doc2: tf=3, dl=3 -> 6.6/4.65; doc1: tf=1, dl=2 -> 2.2/2.2; doc3 absent
    val q1 = Seq((10L, "apple")).toDF("q_id", "qtext")
    val r1 = Retrieval.bm25Search(q1, docs, "doc_id", "text", k = 5)
      .orderBy(col("rn")).collect().map(r => (r.getLong(1), r.getInt(3)))
    assert(r1.toSeq == Seq((2L, 1), (1L, 2)), s"got ${r1.toSeq}")
    // duplicate query terms are distinct-collapsed: identical scores
    val q2 = Seq((10L, "apple apple")).toDF("q_id", "qtext")
    val s1 = Retrieval.bm25Search(q1, docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    val s2 = Retrieval.bm25Search(q2, docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSet
    assert(s1 == s2, s"$s1 vs $s2")
  }

  test("bpeMergeStep picks the top pair and applies it greedily left-to-right") {
    import spark.implicits._
    // words: aaa x2, bb x1 -> pre-merge pairs: "a a" 4, "b b" 1.
    // merge "a a" on "a a a" must continue AFTER the replacement
    // ("aa a", NOT "aaa") -> post-merge pairs: "aa a" 2, "b b" 1.
    val docs = Seq((1L, "aaa bb"), (2L, "aaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeMergeStep(docs, "text", topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(out.toSeq == Seq(("aa a", 2L, "a a"), ("b b", 1L, "a a")),
      s"got ${out.toSeq}")
  }

  test("bpeTrain chains merges on symbol arrays (runs, ties, multichar symbols)") {
    import spark.implicits._
    // words: aaab n=2, aab n=1.
    // step1 pairs: "a a" 2·2+1=5, "a b" 2+1=3 -> merge "a a"->aa;
    //   greedy on the a-run: [a a a b] -> [aa a b]; [a a b] -> [aa b].
    // step2 pairs: "aa a" 2, "a b" 2, "aa b" 1 -> tie breaks pair-asc
    //   ("a b" < "aa a") -> merge ab; [aa a b] -> [aa ab].
    // step3 pairs: "aa ab" 2, "aa b" 1 -> merge multichar pair -> aaab.
    val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", nMerges = 3)
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a a", "aa", 5L, 3L),
      (2L, "a b", "ab", 2L, 3L),
      (3L, "aa ab", "aaab", 2L, 3L)), s"got ${out.toSeq}")
  }

  test("bpeTrain greedy run semantics: aaaa -> [aa aa] -> [aaaa]") {
    import spark.implicits._
    // one word of 4 a's: step1 match positions 1,2,3 are ONE run ->
    // keep odd offsets 1,3 (both merge), NOT "aaa"+"a"; step2 merges
    // the two aa symbols.
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val out = TextAnalysis.bpeTrain(docs, "text", nMerges = 2)
      .orderBy(col("step")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      (1L, "a a", "aa", 3L, 1L),
      (2L, "aa aa", "aaaa", 1L, 1L)), s"got ${out.toSeq}")
  }

  test("bpeSegment applies the trained merges (shared application path)") {
    import spark.implicits._
    // after the q137 3-merge chain (aa, ab, aaab): aaab collapses to
    // one symbol, aab stays [aa b] (no "a b" adjacency survives there)
    val docs = Seq((1L, "aaab aaab aab")).toDF("doc_id", "text")
    val seg = TextAnalysis.bpeSegment(docs, "text", nMerges = 3)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(seg == Map(
      "aaab" -> ((2L, 1L, "aaab")),
      "aab" -> ((1L, 2L, "aa b"))), s"got $seg")
  }

  test("bpeTrain stops early when no pairs remain") {
    import spark.implicits._
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // step1 merges "a b" -> every word is one symbol; steps 2+ no-op.
    val out = TextAnalysis.bpeTrain(docs, "text", nMerges = 5).collect()
    assert(out.length == 1, s"got ${out.toSeq}")
  }

  test("naiveBayesClassify separates planted classes; OOV falls to priors+smoothing") {
    import spark.implicits._
    // train (id % 10 != 0): A talks apples, B talks bananas
    val docs = Seq(
      (1L, "apple apple apple", "A"), (2L, "apple fruit", "A"),
      (11L, "banana banana", "B"), (12L, "banana split", "B"),
      // held-out (id % 10 == 0); class column ignored for eval rows
      (10L, "apple apple", "B"), (20L, "banana", "A"), (30L, "zzz", "A")
    ).toDF("doc_id", "text", "source")
    val out = Retrieval.naiveBayesClassify(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(10L) == "A", s"apple doc got ${out(10L)}")
    assert(out(20L) == "B", s"banana doc got ${out(20L)}")
    // OOV doc: equal priors, decision by smoothing mass ln(1/(ntk_c+V)):
    // ntk_A=5, ntk_B=4, V=4 -> B's 1/8 beats A's 1/9
    assert(out(30L) == "B", s"oov doc got ${out(30L)}")
    assert(out.size == 3)
  }

  test("stupidBackoffScore hits all three branches with the right math") {
    import spark.implicits._
    // train corpus: "a b" twice, "a c" once -> c1(a)=3, c2(a,b)=2,
    // c2(a,c)=1, c1(b)=2? no: tokens a b a b a c -> c1(a)=3, c1(b)=2,
    // c1(c)=1, N=6
    val train = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, "a b"),   // seen bigram: s = ln(2/3)
      (20L, "c b"),   // unseen bigram, seen unigram b: s = ln(0.4*2/6)
      (30L, "b zz"),  // unseen bigram, OOV zz: s = ln(0.4*1/6)
      (40L, "solo")   // < 2 tokens: (0, 0, 0)
    ).toDF("doc_id", "text")
    val got = Retrieval.stupidBackoffScore(eval_, train, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    def micro(x: Double): Long = BigDecimal(x * 1e6)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    assert(got(10L) == ((1L, micro(math.log(2.0 / 3)), micro(math.log(2.0 / 3)))))
    val backB = micro(math.log(0.4 * 2 / 6.0))
    val oov = micro(math.log(0.4 * 1 / 6.0))
    assert(got(20L) == ((1L, backB, backB)), s"got ${got(20L)}")
    assert(got(30L) == ((1L, oov, oov)), s"got ${got(30L)}")
    assert(got(40L) == ((0L, 0L, 0L)))
  }

  test("decontaminate removes exactly the covered spans, keeps the rest") {
    import spark.implicits._
    val bench = Seq((100L, "b1 b2 b3 b4 b5 b6 b7 b8")).toDF("doc_id", "text")
    val bs = TextAnalysis.benchShingleHashSet(bench, "doc_id", "text", 8)
    val corpus = Seq(
      // the bench 8-gram sits mid-doc: its 8 tokens go, neighbors stay
      (0L, "keep1 keep2 b1 b2 b3 b4 b5 b6 b7 b8 keep3 keep4"),
      (1L, "totally clean doc with eight plus distinct tokens here"),
      (2L, "short doc"), // < 8 tokens: no window can cover anything
      (3L, "b1 b2 b3 b4 b5 b6 b7 b8") // fully contaminated -> empty
    ).toDF("doc_id", "text")
    val out = TextAnalysis.decontaminate(corpus, bs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((12L, 8L, "keep1 keep2 keep3 keep4")), s"got ${out(0L)}")
    assert(out(1L)._2 == 0L && out(1L)._3 ==
      "totally clean doc with eight plus distinct tokens here")
    assert(out(2L) == ((2L, 0L, "short doc")))
    assert(out(3L) == ((8L, 8L, "")))
    // audit consistency: tokens removed iff the flags audit counts > 0
    val flags = TextAnalysis.contaminationFlags(corpus, bs, "doc_id", "text", 8)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.forall { case (id, (_, rem, _)) => (rem > 0) == (flags(id) > 0) })
  }

  // q101's tokenize-once equivalence (flattened per-doc token arrays ==
  // string_agg + re-split in the oracle) holds only when every base
  // text is non-empty with no leading/trailing whitespace — an empty
  // text tokenizes to [""] on the Spark side, which the oracle's regex
  // re-split merges away. Pin that precondition on the fixture so a
  // driver-side fixture change surfaces HERE, not as a q101 hash drift.
  test("documents fixture satisfies q101's non-empty/untrimmed-text precondition") {
    val bad = graft.queries.Tables.documents(spark, sf)
      .filter(col("text").isNull || col("text") === "" ||
        col("text") =!= trim(col("text")))
      .count()
    assert(bad == 0L, s"$bad docs violate q101's tokenize-once precondition")
  }
}

class MultimodalSpec extends SparkSpec {

  test("partition-wise decode emits typed features with real digests") {
    import spark.implicits._
    val cells = Seq(
      Multimodal.MediaCell(1L, "hello".getBytes("UTF-8")),
      Multimodal.MediaCell(2L, Array.emptyByteArray)).toDS()
    val out = Multimodal.decodeFeatures(cells).collect()
      .map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 5)
    // sha256("hello")
    assert(out(1L).sha256_hex ==
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824")
    assert(out(1L).feature.length == 8)
    assert(out(2L).n_bytes == 0)
  }

  test("resize stub: constant output size, deterministic, empty-safe") {
    import spark.implicits._
    val cells = Seq(
      Multimodal.MediaCell(1L, (0 until 100).map(_.toByte).toArray),
      Multimodal.MediaCell(2L, Array[Byte](7)),
      Multimodal.MediaCell(3L, Array.emptyByteArray)).toDS()
    val out = Multimodal.resizeStub(cells, 4, 4).collect()
      .map(t => t.media_id -> t).toMap
    assert(out.values.forall(t => t.pixels.length == 16))
    assert(out(1L).pixels(0) == 0 && out(1L).pixels(15) == ((15 * 100 / 16)).toByte)
    assert(out(2L).pixels.forall(_ == 7))
    assert(out(3L).pixels.forall(_ == 0))
    // deterministic: same input -> same bytes
    val again = Multimodal.resizeStub(cells, 4, 4).collect()
      .map(t => t.media_id -> t.pixels.toSeq).toMap
    assert(out.map { case (k, v) => k -> v.pixels.toSeq } == again)
  }

  test("frame sampling: every k-th frame, partial tail, empty payload") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](25)(_.toByte) // frames of 10: 3 (last=5 bytes)
    val cells = Seq(
      Multimodal.MediaCell(1L, payload),
      Multimodal.MediaCell(2L, Array.emptyByteArray)).toDS()
    val out = Multimodal.sampleFrames(cells, frameBytes = 10, everyK = 2)
      .collect().sortBy(f => (f.media_id, f.frame_idx))
    // media 1: frames 0,1,2 exist; sampled 0 and 2; media 2: none.
    assert(out.map(f => (f.media_id, f.frame_idx, f.n_bytes)).toSeq ==
      Seq((1L, 0L, 10L), (1L, 2L, 5L)))
    val sha0 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(payload.slice(0, 10)).map("%02x".format(_)).mkString
    assert(out.head.sha256_hex == sha0)
  }
}
