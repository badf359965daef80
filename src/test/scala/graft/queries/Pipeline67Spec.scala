package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, fifteenth batch: manifest waves, prefix-cache
  * planner, negative-sampling table.
  */
class Pipeline67Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q365: waves accumulate monotonically; the final wave is the release") {
    val rows = q("q365_manifest_waves").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    val manifest = q("q352_corpus_manifest").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getString(3))).toMap
    val bySrc = rows.groupBy(_._2)
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (src, ws) =>
      val s = ws.sortBy(_._1)
      assert(s.map(_._1).toSeq == (0L to 2L))
      s.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3) }
      // wave 2 = everything: must equal the q352 release manifest
      assert(s.last._3 == manifest(src)._1)
      assert(s.last._4 == manifest(src)._2)
      // roots differ between waves whenever rows were added
      s.sliding(2).foreach { case Array(a, b) =>
        if (b._3 > a._3) assert(a._4 != b._4)
      }
    }
  }

  test("q366: family accounting and the cacheable-token identity") {
    val rows = q("q366_prefix_cache_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == Seq(4L, 16L, 64L))
    rows.foreach { case (k, elig, nPfx, nFam, inFam, prefills, toks) =>
      assert(nPfx <= elig)
      assert(nFam <= nPfx)
      assert(inFam >= 2 * nFam || nFam == 0L)
      assert(prefills == inFam - nFam,
        "each family caches all members but the first")
      assert(toks == prefills * k)
    }
    // longer prefixes can only shrink eligibility and family sharing
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, "eligible docs non-increasing in k")
      assert(a._6 >= b._6, "cacheable prefills non-increasing in k")
    }
  }

  test("q367: 3/4-power weights compress the head (boost < 1) and lift the tail") {
    val rows = q("q367_negative_sampling").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 64)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, "counts sorted by rank")
      // p^0.75 is monotone: sampling ppm ordered with the counts
      assert(a._4 >= b._4, "sampling ppm non-increasing in rank")
    }
    // the most frequent word is downweighted relative to its raw share,
    // the least frequent upweighted (the whole point of the 3/4 power),
    // unless the distribution is flat
    if (rows.head._3 > rows.last._3) {
      assert(rows.head._6 < 1000L, s"head boost ${rows.head._6}")
      assert(rows.last._6 > 1000L, s"tail boost ${rows.last._6}")
    }
    // sampling distribution sums to ~1 (ppm truncation per row)
    val total = rows.map(_._4).sum
    assert(total <= 1000000L && total >= 1000000L - rows.length)
  }
}
