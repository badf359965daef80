package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, fourth batch: embedding consistency. */
class Pipeline83Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q404: only skew-encoder sources flag; consistent re-embedding never does") {
    val rows = q("q404_embedding_consistency").collect()
    val skewSources = rows.map(_.getString(0)).filter { src =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
          .substring(0, 2), 16) % 4 == 0
    }.toSet
    rows.foreach { r =>
      val (src, multi, incons) =
        (r.getString(0), r.getLong(2), r.getLong(3))
      if (r.getString(5) == "skewed") {
        assert(skewSources.contains(src),
          s"$src flagged without a skewed encoder")
        // every skewed re-embed disagrees (dim-0 shift past the grid)
        assert(incons == multi && incons > 0L)
      } else {
        assert(incons == 0L)
      }
      // bp formula
      assert(r.getLong(4) ==
        (r.getLong(1) - incons) * 10000L / r.getLong(1))
    }
    // re-embedding WITHOUT skew happens and is not flagged: some
    // consistent source carries multi-embedded contents
    assert(rows.exists(r =>
      r.getString(5) == "consistent" && r.getLong(2) > 0L),
      "no consistent re-embeds — the plant lost its control arm")
    assert(rows.exists(_.getString(5) == "skewed"),
      "no skewed source despite the encoder plant")
  }

  test("q405: mirrors and the agg feed read zero novelty; originals stay novel") {
    val rows = q("q405_source_novelty").collect()
    rows.foreach { r =>
      val (src, types, uniq, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(uniq <= types && bp == uniq * 10000L / types)
      if (src.startsWith("mirror_") || src == "agg") {
        assert(uniq == 0L && r.getString(4) == "redundant",
          s"$src must contribute nothing unique — every gram exists in its original")
      } else {
        assert(r.getString(4) == "novel",
          s"original $src read ${bp} bp — drowned by its own mirror?")
      }
    }
    assert(rows.exists(_.getString(0) == "agg"))
    assert(rows.count(_.getString(0).startsWith("mirror_")) > 0)
  }

  test("q406: the datasheet's sections cross-check each other") {
    val rows = q("q406_release_datasheet").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nDocs = rows(("volume", "n_docs"))
    // dedup identity: distinct + dup docs == corpus
    assert(rows(("dedup", "distinct_texts")) +
      rows(("dedup", "exact_dup_docs")) == nDocs)
    // mean within [min, max] (milli)
    assert(rows(("length", "mean_tokens_milli")) >=
      rows(("length", "min_tokens")) * 1000L)
    assert(rows(("length", "mean_tokens_milli")) <=
      rows(("length", "max_tokens")) * 1000L)
    // HHI floor: >= 1e6 / n_sources (uniform is the minimum)
    assert(rows(("mix", "source_hhi_ppm")) >=
      1000000L / rows(("volume", "n_sources")))
    // counts bounded by the corpus
    for (k <- Seq(("quality", "docs_below_floor"),
        ("decontam", "exact_benchmark_hits"), ("pii", "email_docs"),
        ("pii", "phone_docs"), ("pii", "ipv4_docs")))
      assert(rows(k) >= 0L && rows(k) <= nDocs)
    assert(rows.size == 16)
  }

  test("q407: only ingestion-broken sources flag; clean sources read zero damage") {
    val rows = q("q407_mojibake_audit").collect()
    val badSources = rows.map(_.getString(0)).filter { src =>
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
          .substring(0, 2), 16) % 5 == 0
    }.toSet
    rows.foreach { r =>
      val (src, dd) = (r.getString(0), r.getLong(4))
      assert(dd == math.max(r.getLong(2), 0L) + r.getLong(3) -
        0L || dd <= r.getLong(2) + r.getLong(3)) // union bound
      assert(r.getLong(5) == dd * 10000L / r.getLong(1))
      if (!badSources.contains(src)) {
        assert(dd == 0L && r.getString(6) == "clean",
          s"clean-ingestion source $src reads damage")
      }
      assert((r.getLong(5) > 300L) == (r.getString(6) == "dirty_encoding"))
    }
    assert(rows.exists(_.getString(6) == "dirty_encoding"),
      "no dirty source despite the encode plant")
  }
}
