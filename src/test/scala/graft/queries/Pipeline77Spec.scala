package graft.queries

import graft.SparkSpec

/** Round-14 pack, fourth batch: cross-source mirror census. */
class Pipeline77Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q386: mirrors read full containment, shares are consistent") {
    val rows = q("q386_mirror_census").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (sa, sb, shared, na, nb, bpA, bpB) =>
      assert(sa < sb, "pairs are id-normalized")
      assert(shared >= 1L && shared <= math.min(na, nb))
      assert(bpA == shared * 10000L / na && bpB == shared * 10000L / nb)
    }
    // every planted mirror is FULLY contained in its origin
    val mirrorPairs = rows.filter { case (sa, sb, _, _, _, _, _) =>
      sa.startsWith("mirror_") && sa == s"mirror_$sb"
    }
    assert(mirrorPairs.nonEmpty, "no mirror pairs in the census")
    mirrorPairs.foreach { case (sa, _, _, _, _, bpA, _) =>
      assert(bpA == 10000L, s"$sa not fully contained in its origin")
    }
    // the agg feed overlaps both the origin and its mirror (h%25 ⊂ h%5)
    val aggSides = rows.filter(_._1 == "agg").map(_._2).toSet
    assert(aggSides.exists(_.startsWith("mirror_")) &&
      aggSides.exists(s => !s.startsWith("mirror_")),
      "agg triangle missing a side")
  }
}
