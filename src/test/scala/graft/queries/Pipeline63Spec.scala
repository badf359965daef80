package graft.queries

import graft.SparkSpec

/** Round-13 pack, eleventh batch: audio VAD, Poisson bootstrap,
  * threshold sweep.
  */
class Pipeline63Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q353: planted speech runs recovered; blip merges iff gap <= 2") {
    val rows = q("q353_audio_vad").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (id, segs) =>
      val s1 = 2 + id % 4; val e1 = s1 + 2 + id % 3
      val s2 = 14 + id % 6; val e2 = s2 + 3 + id % 4
      val blip = e2 + 2 + id % 3
      val gap = blip - e2 - 1
      assert(segs.length == 2, s"media $id: ${segs.length} segments")
      val Array(a, b) = segs.sortBy(_._2)
      assert(a._3 == s1 && a._4 == e1 && a._6 == e1 - s1 + 1)
      assert(b._3 == s2)
      if (gap <= 2) {
        assert(b._4 == blip, s"media $id: blip (gap $gap) should merge")
        assert(b._6 == e2 - s2 + 2)
      } else {
        assert(b._4 == e2, s"media $id: blip (gap $gap) should drop")
        assert(b._6 == e2 - s2 + 1)
      }
      assert(a._5 == a._4 - a._3 + 1 && b._5 == b._4 - b._3 + 1)
    }
  }

  test("q354: replicate accounting, CI order statistics, concentration") {
    val rows = q("q354_poisson_bootstrap").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 16)
    assert(rows.map(_._1).toSeq == (0L until 16L))
    val ests = rows.map(_._3).sorted
    val (lo, hi) = (rows.head._5, rows.head._6)
    assert(rows.forall(t => t._5 == lo && t._6 == hi))
    assert(lo == ests(1) && hi == ests(14),
      "CI must be the 2nd/15th order statistics")
    assert(lo <= hi)
    val point = rows.head._3
    val pm = rows.head._4
    // Poisson(1) weights concentrate: n_eff within 20% of n, and the
    // replicate estimates bracket the point estimate loosely
    val n = graft.queries.Tables.documents(spark, sf).count()
    rows.foreach { t =>
      assert(math.abs(t._2 - n) * 5L <= n, s"n_eff ${t._2} vs n $n")
      assert(math.abs(t._3 - pm) * 2L <= pm,
        s"estimate ${t._3} vs point $pm")
    }
    assert(point > 0L)
  }

  test("q355: retention curve is monotone in the threshold") {
    val rows = q("q355_dedup_threshold_sweep").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.map(_._1).toSeq == Seq(60L, 70L, 80L, 90L))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, "rep pairs non-increasing in t")
      assert(a._3 >= b._3, "implied pairs non-increasing in t")
      assert(a._4 >= b._4, "removable reps non-increasing in t")
      assert(a._5 >= b._5, "removable tokens non-increasing in t")
    }
    rows.foreach { t =>
      assert(t._3 >= t._2, "implied >= rep pairs (dup groups expand)")
      assert(t._4 <= t._2 || t._2 == 0L,
        "distinct removable b-side <= passing pairs")
      assert(t._6 == rows.head._6, "exact-dup members are t-independent")
    }
  }
}
