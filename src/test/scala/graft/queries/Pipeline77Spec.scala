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

  test("q387: cell evidence is consistent with each detector's rule") {
    val rows = q("q387_detector_disagreement").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    assert(rows.map(t => (t._1, t._2)).distinct.length == rows.length)
    val cells = rows.groupBy(_._3)
    // every audit cell fires on the planted fixtures
    Seq("both", "minhash_only", "simhash_only").foreach(c =>
      assert(cells.contains(c), s"cell $c never fired"))
    rows.foreach { case (a, b, cell, jacc, ham) =>
      assert(a < b)
      cell match {
        // minhash verify is exactly jaccard >= 0.8 (inter*5 >= uni*4)
        case "both" =>
          assert(jacc >= 8000L && ham <= 3L, s"($a,$b) both: $jacc/$ham")
        case "minhash_only" =>
          assert(jacc >= 8000L, s"($a,$b) minhash_only at jacc $jacc")
        case "simhash_only" =>
          assert(ham <= 3L, s"($a,$b) simhash_only at hamming $ham")
      }
    }
    // the calibration story: the simhash-only mass sits BELOW the
    // minhash threshold on average (shared-vocab false positives)
    val so = cells("simhash_only").map(_._4)
    assert(so.sum / so.length < 8000L,
      "simhash_only cell should average below the jaccard threshold")
  }

  test("q388: LOO identities — removing a source moves the mean away") {
    val rows = q("q388_source_influence").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    val fulls = rows.map(t => (t._5, t._6)).distinct
    assert(fulls.length == 1, "full-corpus profile must ride identically")
    rows.foreach { case (src, n, ml, sl, mf, sf0, dm, ds) =>
      assert(n > 0L)
      assert(dm == ml - mf && ds == sl - sf0, s"$src delta identities")
      assert(sl >= 0L && sf0 >= 0L)
    }
    // sign law: removing a below-average source RAISES the LOO mean
    // (and vice versa), up to the ±1 milli truncation of each side —
    // recompute each source's own mean from the fixture to check
    val own = graft.queries.Tables.documents(spark, sf)
      .selectExpr("source",
        "CAST(size(split(lower(text), '\\\\s+')) AS BIGINT) AS x")
      .groupBy("source")
      .agg(org.apache.spark.sql.functions.expr("sum(x) * 1000 div count(1)")
        .as("own_milli"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { case (src, _, _, _, mf, _, dm, _) =>
      if (own(src) < mf - 2) assert(dm >= -1, s"$src below-avg but dm=$dm")
      if (own(src) > mf + 2) assert(dm <= 1, s"$src above-avg but dm=$dm")
    }
  }
}
