package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** End-to-end curation narrative: the operators COMPOSE into the
  * pipeline a training-data team would actually run — ingest → quality
  * gate → exact dedup → near-dup grouping → canonical selection →
  * deterministic split — with the invariants a real pipeline needs
  * (no doc in two splits, one survivor per group, monotone filters).
  */
class CurationPipelineSpec extends SparkSpec {

  import spark.implicits._

  test("ingest -> quality -> dedup -> split composes with its invariants") {
    // 1. ingest (JSONL fixture, nested metadata)
    val raw = spark.read.json(graft.queries.Tables.fixture("data/docs.jsonl"))
      .select(col("doc_id"), col("text"), col("meta.lang").as("lang"))
    val n0 = raw.count()
    assert(n0 == 500)

    // 2. quality gate: token-count band (projection-only, no shuffle)
    val f = TextAnalysis.qualityFacets(col("text"))
    val kept = raw
      .withColumn("n_tokens", f.getField("n_tokens"))
      .filter(col("n_tokens").between(10, 200))
    val n1 = kept.count()
    assert(n1 > 0 && n1 <= n0)

    // 3. exact dedup: one keeper per content digest
    val keepers = Dedup.exactGroups(kept, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = kept.join(keepers, "doc_id")
    val n2 = deduped.count()
    assert(n2 <= n1)
    assert(deduped.select(md5(col("text"))).distinct().count() == n2,
      "exact dedup left identical texts behind")

    // 4. near-dup grouping + canonical selection (adjacent candidates)
    val adj = deduped.select(col("doc_id").as("a_id"), (col("doc_id") + 1).as("b_id"))
    val edges = Dedup.verifyJaccard(adj,
        Dedup.tokenArrays(deduped, "doc_id", "text"), 0.0)
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select(col("a_id"), col("b_id"))
    val comps = Dedup.components(edges, deduped.select(col("doc_id").as("id")))
    assert(comps.count() == n2, "components must cover every surviving doc")
    val canonical = comps.groupBy(col("component"))
      .agg(min(col("id")).as("doc_id"))
    val n3 = canonical.count()
    assert(n3 <= n2)

    // 5. deterministic hash split (the q57 primitive): partitions the
    // survivors completely and disjointly
    val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
      .cast("long") % 100
    val split = canonical.select(col("doc_id"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
    val bySplit = split.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.values.sum == n3, s"split lost/duplicated docs: $bySplit")
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.getOrElse("train", 0L) > bySplit.getOrElse("val", 0L),
      s"expected train to dominate: $bySplit")
    // re-running the split yields the identical assignment (determinism)
    val again = canonical.select(col("doc_id"),
      when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
    assert(split.exceptAll(again).count() == 0)

    // 6. mixture rebalance on the train split (token budget per lang),
    // then sequence packing of what survives — the last two stages a
    // training-data pipeline runs before writing shards
    val train = split.filter(col("split") === "train")
      .join(deduped.select(col("doc_id"), col("lang"),
        col("n_tokens").cast("long").as("n_tok")), "doc_id")
    val rebalanced = Curation.rebalanceMixture(
      train, "doc_id", "lang", "n_tok", 2000L, "mix")
    rebalanced.groupBy("lang").agg(sum("n_tok").as("kept"))
      .as[(String, Long)].collect().foreach { case (lang, kept) =>
        // md5 buckets are near-uniform: kept tokens never exceed ~2x a
        // budget that the stratum itself exceeds
        assert(kept <= 4000L, s"$lang kept $kept tokens for a 2000 budget")
      }
    val packed = Curation.packSequences(
      rebalanced.select("doc_id", "lang", "n_tok"),
      "doc_id", "lang", "n_tok", 512)
    // packing covers every rebalanced doc exactly once, bins start at 0
    // and are contiguous per stratum
    assert(packed.count() == rebalanced.count())
    packed.groupBy("lang")
      .agg(min("bin_id").as("lo"), max("bin_id").as("hi"),
        countDistinct("bin_id").as("n"))
      .as[(String, Long, Long, Long)].collect().foreach { case (lang, lo, hi, n) =>
        assert(lo == 0L && n == hi + 1, s"$lang bins not contiguous: [$lo,$hi] n=$n")
      }
  }

  test("curationPipeline: an empty incremental batch (old == new) flows through to zero rows") {
    // the COMMON production case: an ingestion round where nothing
    // changed — every stage (exact dedup, pair join, components,
    // quality, decontaminate, sample, pack, shard) must accept an
    // empty frame rather than tripping on empty aggregates
    val docs = graft.queries.Tables.documents(spark, sf)
    val bench = TextAnalysis.benchShingleHashSet(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
    val out = Curation.curationPipeline(docs, docs, bench,
      "doc_id", "text", "source", 3, 4, 5, 1000, 1500, 100, 8, 50, "e", 256, 4)
    assert(out.count() == 0)
  }

  test("curationPipeline (q136): invariants hold across the whole chain") {
    val docs = graft.queries.Tables.documents(spark, sf)
    val oldS = docs.filter(col("doc_id") % 3 === 1 &&
      col("doc_id") % 10 =!= 0)
    val base = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val newS = base.union(
      base.filter(col("doc_id") % 50 === 7)
        .select((col("doc_id") + 10000000).as("doc_id"),
          col("text"), col("source")))
    val bench = TextAnalysis.benchShingleHashSet(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
    val out = Curation.curationPipeline(oldS, newS, bench,
      "doc_id", "text", "source",
      jacN = 3, jacTNum = 4, jacTDen = 5,
      dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100,
      decontN = 8, sampleK = 50, salt = "q136",
      packBudget = 256, nShards = 4).collect()
    // sample hits its k exactly (enough survivors on the fixture)
    assert(out.length == 50, s"expected 50 sampled docs, got ${out.length}")
    val ids = out.map(_.getAs[Long]("id"))
    assert(ids.distinct.length == ids.length, "duplicate ids in output")
    // rn is a permutation of 1..k
    assert(out.map(_.getAs[Int]("rn")).sorted.toSeq == (1 to 50),
      "rn is not the 1..k ranking")
    // round-robin balance bound: max-min shard token mass <= heaviest doc
    val byShard = out.groupBy(_.getAs[Int]("shard"))
      .view.mapValues(_.map(_.getAs[Long]("w")).sum).toMap
    assert(byShard.size == 4, s"expected 4 shards, got ${byShard.keySet}")
    val maxW = out.map(_.getAs[Long]("w")).max
    assert(byShard.values.max - byShard.values.min <= maxW,
      s"shard imbalance ${byShard.values.max - byShard.values.min} > heaviest doc $maxW")
    // packing: a doc's bin is its start offset div budget within (source, key asc)
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      rows.sortBy(_.getAs[Long]("id")).foldLeft(0L) { (cum, r) =>
        assert(r.getAs[Long]("bin_id") == cum / 256,
          s"bin mismatch for id ${r.getAs[Long]("id")}")
        val c2 = cum + r.getAs[Long]("w")
        assert(r.getAs[Long]("cum_tok") == c2, "cum_tok mismatch")
        c2
      }
    }
  }
}
