package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, tenth batch: watermark, outliers, hapax, confound. */
class Pipeline89Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q428: the 6-sigma binomial pages exactly the watermarked generators") {
    val rows = q("q428_watermark_scan").collect()
    rows.foreach { r =>
      val (src, n, g, bp) = (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))
      assert(bp == g * 10000L / n)
      val z2 = (2L * g - n) * (2L * g - n)
      assert((z2 > 36L * n) == (r.getString(4) == "watermarked"))
      if (srcMod(src, 7) == 5)
        assert(r.getString(4) == "watermarked" && bp > 6000L,
          s"watermarked $src slipped the net at $bp bp")
      else {
        assert(r.getString(4) == "clean",
          s"human source $src falsely paged at $bp bp")
        // word repetition inflates variance past iid — observed up to
        // z≈3.2 on honest sources; the 6-sigma gate leaves headroom
        assert(bp > 4000L && bp < 6000L)
      }
    }
    assert(rows.exists(_.getString(4) == "watermarked"))
  }

  test("q429: the quarantine flags exactly the wrong-bias docs") {
    val rows = q("q429_semantic_outliers").collect()
      .map(r => r.getString(0) -> r).toMap
    // expected misfiled docs per source — the draw is doc-grain
    val expected = Tables.documents(spark, sf)
      .join(Tables.embeddings(spark, sf)
        .select(col("vec_id").as("doc_id")), "doc_id")
      .select(col("source"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4),
          16, 10).cast("long") % 9 === 4).cast("long").as("m"))
      .groupBy(col("source")).agg(sum(col("m")).as("exp"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expected.foreach { case (src, exp) =>
      val r = rows(src)
      assert(r.getLong(2) == exp,
        s"$src: flagged ${r.getLong(2)} outliers, planted $exp")
      assert(r.getLong(3) == exp * 10000L / r.getLong(1))
      assert((exp > 0L) == (r.getString(4) == "misfiled_docs"))
    }
    assert(rows.values.map(_.getLong(2)).sum > 0L)
  }

  test("q430: garbage sources read an inflated hapax tail; healthy sources sit near zero") {
    val rows = q("q430_hapax_census").collect()
    rows.foreach { r =>
      val (src, types, hapax, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(4))
      assert(hapax <= types && bp == hapax * 10000L / types)
      if (srcMod(src, 8) == 6)
        assert(r.getString(5) == "vocab_garbage" && bp > 4000L,
          s"garbage $src read $bp bp")
      else
        assert(r.getString(5) == "healthy_tail" && bp < 1000L,
          s"healthy $src read $bp bp hapax — vocabulary rot?")
    }
    assert(rows.exists(_.getString(5) == "vocab_garbage"))
  }

  test("q431: score:=length reads exactly 1000 milli; honest scoring stays under the gate") {
    val rows = q("q431_quality_length_confound").collect()
    rows.foreach { r =>
      val (src, corr) = (r.getString(0), r.getLong(2))
      assert(corr >= -1000L && corr <= 1000L)
      if (srcMod(src, 10) == 2)
        assert(corr == 1000L && r.getString(3) == "length_confounded",
          s"confounded $src read $corr milli")
      else
        assert(math.abs(corr) <= 800L &&
          r.getString(3) == "independent",
          s"honest $src read $corr milli")
    }
    assert(rows.exists(_.getString(3) == "length_confounded"))
    // honest correlations are LIVE (non-zero), not degenerate
    assert(rows.exists(r => r.getString(3) == "independent" &&
      math.abs(r.getLong(2)) > 50L))
  }
}
