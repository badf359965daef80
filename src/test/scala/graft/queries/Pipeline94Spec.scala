package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, fifteenth batch: CDC, Pareto, pool diversity. */
class Pipeline94Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q446: content-defined boundaries survive the prefix edit — dup bytes recover the re-published mass") {
    val rows = q("q446_cdc_chunk_dedup").collect()
    val corpus = rows.find(_.getString(0) == "__corpus__").get
    val (nChunks, nDistinct, bytes, dupBytes) = (corpus.getLong(1),
      corpus.getLong(2), corpus.getLong(3), corpus.getLong(4))
    assert(nDistinct < nChunks, "no chunk sharing at all")
    // the ~1/6 re-publication adds ~1/7 of corpus bytes; CDC must
    // recover MOST of it (boundaries realign after the edited intro —
    // fixed-size blocks would recover ~nothing)
    val republished = Tables.documents(spark, sf)
      .filter(conv(substring(md5(col("doc_id").cast("string")), 1, 4),
        16, 10).cast("long") % 6 === 0)
      .agg(sum(length(col("text")))).collect()(0).getLong(0)
    assert(dupBytes > republished / 2L,
      s"CDC recovered $dupBytes of ~$republished re-published bytes — " +
        "boundaries did not realign")
    assert(corpus.getLong(5) == dupBytes * 10000L / bytes)
    // per-source rows carry no dup accounting (corpus-scope number)
    rows.filter(_.getString(0) != "__corpus__").foreach { r =>
      assert(r.getLong(4) == 0L && r.getLong(5) == 0L)
      assert(r.getLong(2) <= r.getLong(1))
    }
    // chunk mass conserves: per-source bytes sum to the corpus bytes
    assert(rows.filter(_.getString(0) != "__corpus__")
      .map(_.getLong(3)).sum == bytes)
  }

  test("q447: ranks are a permutation, cumulative shares are monotone to 10000") {
    val rows = q("q447_source_token_pareto").collect()
    assert(rows.map(_.getLong(2)).toSeq == (1 to rows.length).map(_.toLong))
    var prevCum = 0L
    var prevTok = Long.MaxValue
    rows.foreach { r =>
      assert(r.getLong(1) <= prevTok, "masses not descending")
      prevTok = r.getLong(1)
      assert(r.getLong(3) > prevCum, "cumulative not increasing")
      prevCum = r.getLong(3)
    }
    assert(rows.last.getLong(4) == 10000L,
      "the full corpus must cumulate to exactly 10000 bp")
    assert(rows.head.getString(5) == "head" &&
      rows.last.getString(5) == "tail")
  }

  test("q448: canned-heavy pools read collapsed; organic pools stay diverse") {
    val rows = q("q448_pool_response_diversity").collect()
    assert(rows.nonEmpty, "no pools with >= 3 responses")
    rows.foreach { r =>
      val (n, sumT, unionT, bp) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(unionT <= sumT && n >= 3L)
      assert(bp == unionT * 10000L / sumT)
      assert((bp < 5000L) == (r.getString(5) == "mode_collapsed"))
    }
    // both regimes occur: the canned plant collapses some pool, and
    // organic pools (distinct fixture texts) stay diverse
    assert(rows.exists(_.getString(5) == "diverse"),
      "no diverse pool — trigram overlap of distinct texts too high")
  }
}
