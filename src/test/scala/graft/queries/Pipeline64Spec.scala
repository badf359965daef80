package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, twelfth batch: release diff, Wasserstein drift,
  * source KL.
  */
class Pipeline64Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q356: full-release root equals q352's manifest; delta localizes") {
    val diff = q("q356_release_diff").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5), r.getString(6))).toList
    val manifest = q("q352_corpus_manifest").collect()
      .map(r => r.getString(0) -> r.getString(3)).toMap
    assert(diff.nonEmpty)
    assert(diff.map(_._3).sum > diff.map(_._2).sum,
      "release B grows overall")
    diff.foreach { case (src, ra, rb, changed, total, rootA, rootB) =>
      assert(rb >= ra && changed <= total)
      // A ⊆ B, so a row delta, a changed bucket, and a root change are
      // the same event (the manifest's localization contract)
      if (rb > ra) {
        assert(changed > 0L, s"$src: delta rows but no changed bucket")
        assert(rootA != rootB, s"$src: delta rows but equal roots")
      } else {
        assert(changed == 0L && rootA == rootB,
          s"$src: no delta but manifest moved")
      }
      assert(rootB == manifest(src),
        "release-B root must equal the q352 manifest root")
    }
  }

  test("q357: CDF gaps tile W1; driver brute-force agrees") {
    val rows = q("q357_wasserstein_len").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val w1 = rows.head._7
    assert(rows.forall(_._7 == w1))
    assert(rows.map(_._6).sum == w1, "gaps must tile the total")
    // CDFs are monotone and terminate at exactly 1e6
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._4 && a._5 <= b._5)
    }
    assert(rows.last._4 == 1000000L && rows.last._5 == 1000000L)

    // brute force from raw token counts
    val vals = graft.queries.Tables.documents(spark, sf)
      .select((col("doc_id") % 2).cast("long").as("s"),
        least(graft.pipeline.TextAnalysis.tokenCount(col("text"))
          .cast("long"), lit(512L)).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = vals.filter(_._1 == 0).map(_._2)
    val b = vals.filter(_._1 == 1).map(_._2)
    val grid = vals.map(_._2).distinct.sorted
    var (ca, cb, acc) = (0L, 0L, 0L)
    grid.foreach { v =>
      ca += a.count(_ == v); cb += b.count(_ == v)
      acc += math.abs(ca * 1000000L / a.length - cb * 1000000L / b.length)
    }
    assert(acc == w1, s"driver W1 $acc vs $w1")
  }

  test("q358: KL is nonnegative up to micro-rounding; token accounting") {
    val rows = q("q358_source_kl").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nTok, nWords, kl) =>
      assert(nTok > 0L && nWords > 0L)
      assert(kl >= -1L, s"Gibbs violated beyond rounding: $kl")
    }
    // per-source token counts tile the corpus token total
    val total = graft.queries.Tables.documents(spark, sf)
      .select(size(split(lower(col("text")), "\\s+")).cast("long")
        .as("n"))
      .agg(sum(col("n"))).collect()(0).getLong(0)
    assert(rows.map(_._2).sum == total)
  }
}
