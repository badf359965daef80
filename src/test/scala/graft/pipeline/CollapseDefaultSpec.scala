package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** VERDICT r10 item 1, the differential half: on a DUPLICATION-DENSE
  * corpus, expanding the collapsed default's output (dup membership
  * edges + implied near rep pairs) reproduces the uncollapsed core's
  * pair set EXACTLY — values included — as long as no maxBucket /
  * maxPosting cap binds (these fixtures are cap-free). The collapse is
  * then a lossless re-encoding: what changed is the cost curve (linear
  * instead of quadratic in duplicate density), never the answer. When a
  * cap DOES bind, the collapsed output is a strict recall SUPERSET of
  * the raw one (the raw run drops oversized buckets; collapse shrinks
  * them under the cap) — pinned by the maxBucket-binding case below.
  *
  * Expansion rule (per operator): members(rep) = rep + its dup-edge
  * targets; each near rep pair (a, b) stands for every
  * members(a)×members(b) pair with the same verdict; each dup group
  * additionally stands for all in-group pairs at the self-pair verdict
  * (inter = uni = set size / hamming 0 / cos 1).
  */
class CollapseDefaultSpec extends SparkSpec {

  /** base docs + a full copy (+1e5 ids) + a copy of the even slice
    * (+2e5): multiplicities mix 2 and 3. */
  private lazy val dupDocs: DataFrame = {
    val base = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).limit(60).localCheckpoint()
    base
      .unionByName(base.select((col("doc_id") + 100000L).as("doc_id"), col("text")))
      .unionByName(base.filter(col("doc_id") % 2 === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text")))
      .localCheckpoint()
  }

  private def norm(a: Long, b: Long): (Long, Long) = (math.min(a, b), math.max(a, b))

  /** Expand (kind, a_id, b_id, v...) collapsed rows into the full
    * pair→verdict map, where `selfV` gives the in-group verdict from a
    * dup row and near rows carry their own. */
  private def expand[V](rows: Seq[(String, Long, Long, V)],
      selfV: V => V = identity[V] _): Map[(Long, Long), V] = {
    val dupEdges = rows.filter(_._1 == "dup")
    val members = dupEdges.groupBy(_._2).map { case (rep, es) =>
      rep -> (rep +: es.map(_._3))
    }.withDefault(id => Seq(id))
    val inGroup = for {
      (_, rep, _, v) <- dupEdges
      ms = members(rep)
      i <- ms.indices; j <- (i + 1) until ms.size
    } yield norm(ms(i), ms(j)) -> selfV(v)
    val cross = for {
      (k, a, b, v) <- rows if k == "near"
      x <- members(a); y <- members(b)
    } yield norm(x, y) -> v
    (inGroup ++ cross).toMap
  }

  test("ngram jaccard: expanded collapsed output == uncollapsed core, dup-dense") {
    val collapsed = Dedup.ngramJaccardPairs(dupDocs, "doc_id", "text",
      n = 3, tNum = 4, tDen = 5).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        (r.getLong(3), r.getLong(4)))).toSeq
    val raw = Dedup.ngramJaccardPairs(dupDocs, "doc_id", "text",
      n = 3, tNum = 4, tDen = 5, collapseExact = false).collect()
      .map(r => norm(r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val exp = expand(collapsed)
    assert(exp == raw, s"missing=${(raw.keySet -- exp.keySet).take(5)} " +
      s"extra=${(exp.keySet -- raw.keySet).take(5)} " +
      s"valueDiff=${exp.collect { case (k, v) if raw.get(k).exists(_ != v) => k }.take(5)}")
    // and implied_pairs totals the expansion: sum over near rows == raw
    // pair count minus the in-group (J=1) pairs
    val implied = collapsed.filter(_._1 == "near").length
    assert(implied > 0 && raw.size > implied,
      s"fixture not dup-dense enough: raw=${raw.size} near=$implied")
  }

  test("minhash LSH: expanded collapsed output == uncollapsed core, dup-dense") {
    val collapsed = Dedup.minhashNearDupPairs(dupDocs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        (r.getLong(3), r.getLong(4)))).toSeq
    val raw = Dedup.minhashNearDupPairs(dupDocs, "doc_id", "text",
      collapseExact = false).collect()
      .map(r => norm(r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val exp = expand(collapsed)
    assert(exp == raw, s"missing=${(raw.keySet -- exp.keySet).take(5)} " +
      s"extra=${(exp.keySet -- raw.keySet).take(5)}")
  }

  test("simhash LSH: expanded collapsed output == uncollapsed core, dup-dense") {
    val collapsed = Dedup.simhashPairs(dupDocs, "doc_id", "text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val raw = Dedup.simhashPairs(dupDocs, "doc_id", "text",
      collapseExact = false).collect()
      .map(r => norm(r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val exp = expand[Int](collapsed, _ => 0)
    assert(exp == raw, s"missing=${(raw.keySet -- exp.keySet).take(5)} " +
      s"extra=${(exp.keySet -- raw.keySet).take(5)}")
  }

  test("simhash: when maxBucket BINDS, collapsed is a strict recall superset") {
    // One 12-way byte-dup group + maxBucket = 5: the RAW run's band
    // buckets hold all 12 copies, blow past the cap, and get anti-joined
    // away — the raw core emits NO pairs for the group. The COLLAPSED
    // run shrinks the group to one rep (bucket size 1, under the cap)
    // and emits the 11 dup membership edges unconditionally. So when a
    // cap binds, expanded-collapsed ⊋ raw — the documented (and better)
    // superset behavior, pinned here so it stays intentional.
    val spk = spark
    import spk.implicits._
    val group = (0L until 12L).map(i => (i, "the quick brown fox jumps over the lazy dog"))
    val docs = (group :+ (100L, "an entirely different sentence about parquet shuffles"))
      .toDF("doc_id", "text")
    val raw = Dedup.simhashPairs(docs, "doc_id", "text", maxBucket = 5,
      collapseExact = false).collect()
      .map(r => norm(r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(raw.isEmpty, s"cap did not bind: raw=${raw.keySet.take(5)}")
    val collapsed = Dedup.simhashPairs(docs, "doc_id", "text", maxBucket = 5)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSeq
    val exp = expand[Int](collapsed, _ => 0)
    assert(raw.keySet.subsetOf(exp.keySet), "collapsed lost raw pairs")
    // all C(12,2)=66 in-group pairs recovered despite the binding cap
    assert(exp.size == 66, s"expected the 66 in-group pairs, got ${exp.size}")
    assert(collapsed.count(_._1 == "dup") == 11)
  }

  test("cosine LSH: expanded collapsed output == uncollapsed core, dup-dense") {
    val base = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).limit(40).localCheckpoint()
    val dupEmb = base
      .unionByName(base.select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding")))
      .unionByName(base.filter(col("vec_id") % 2 === 0)
        .select((col("vec_id") + 200000L).as("vec_id"), col("embedding")))
      .localCheckpoint()
    val collapsed = Similarity.cosineNearDupPairs(dupEmb, dim = 64,
      nBits = 4, threshold = 0.2).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4))).toSeq // cos4 (self pairs carry cos 1.0)
    val raw = Similarity.cosineNearDupPairs(dupEmb, dim = 64,
      nBits = 4, threshold = 0.2, collapseExact = false).collect()
      .map(r => norm(r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val exp = expand[Double](collapsed, _ => 1.0)
    assert(exp == raw, s"missing=${(raw.keySet -- exp.keySet).take(5)} " +
      s"extra=${(exp.keySet -- raw.keySet).take(5)} " +
      s"valueDiff=${exp.collect { case (k, v) if raw.get(k).exists(x => math.abs(x - v) > 1e-9) => k }.take(5)}")
    assert(collapsed.exists(_._1 == "dup") && collapsed.exists(_._1 == "near"),
      "fixture exercised neither branch")
  }
}
