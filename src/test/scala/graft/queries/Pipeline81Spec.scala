package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, second batch: n-gram decontamination, PII scrub
  * census, and the measured LSH S-curve.
  */
class Pipeline81Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q397: every quote-injected doc is dirty; benchmark docs never appear") {
    val rows = q("q397_ngram_decontaminate").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    assert(byId.keys.forall(_ % 10 != 0), "benchmark docs must be excluded")
    val nDocs = graft.queries.Tables.documents(spark, sf).count()
    assert(rows.length == nDocs - byId.keys.count(_ => false) -
      (0L until nDocs).count(_ % 10 == 0))
    byId.foreach { case (id, r) =>
      val (nGrams, nHit, maxRun) =
        (r.getLong(1), r.getLong(2), r.getLong(4))
      assert(nHit <= nGrams)
      assert(r.getLong(3) >= 0L && r.getLong(3) <= 10000L)
      if (id % 13 == 0) {
        // the quote plant: 12 verbatim benchmark tokens => a run of
        // >= 5 consecutive 8-gram hits
        assert(r.getString(5) == "dirty" && maxRun >= 2L,
          s"planted doc $id escaped: run $maxRun")
      }
      if (maxRun >= 2L) assert(r.getString(5) == "dirty")
      else if (nHit > 0L) assert(r.getString(5) == "suspect")
      else assert(r.getString(5) == "clean")
    }
  }

  test("q398: plants extract and scrub; clean docs are untouched") {
    val rows = q("q398_pii_scrub_census").collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // doc 0 carries all three plants (0 % 9 = 0 % 11 = 0 % 17 = 0)
    val d0 = byId(0L)
    assert(d0.getLong(2) >= 1L && d0.getLong(3) >= 1L &&
      d0.getLong(4) >= 1L && d0.getString(8) == "pii")
    // doc 99 overlaps email + phone
    assert(byId(99L).getLong(2) >= 1L && byId(99L).getLong(3) >= 1L)
    rows.foreach { r =>
      val total = r.getLong(5)
      assert(total == r.getLong(2) + r.getLong(3) + r.getLong(4))
      if (total == 0L) {
        assert(r.getString(8) == "clean")
        assert(r.getLong(6) == r.getLong(7),
          "scrub must not touch clean docs")
      } else {
        assert(r.getString(8) == "pii")
        assert(r.getLong(7) < r.getLong(6),
          "scrub must shorten a PII doc")
      }
    }
  }

  test("q399: the measured S-curve is a step — dead floor, live knee, saturated top") {
    val rows = q("q399_lsh_scurve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // random panel pairs pile at shingle-J ~ 0 and are NEVER caught
    val floor = rows.filter(_._1 <= 8L)
    assert(floor.map(_._2).sum > 1000L, "random mass missing")
    assert(floor.forall(_._4 == 0L),
      "bands caught a pair below shingle-J 0.45 — the 4x4 config " +
        "should be dead there")
    // the planted knee (mild edits): at least one band in [11, 16]
    // catches at >= 50%
    val knee = rows.filter(r => r._1 >= 11L && r._1 <= 16L)
    assert(knee.nonEmpty && knee.exists(_._4 >= 500000L),
      "no live knee — the planted edit arms vanished")
    // catch_ppm is the exact ratio
    rows.foreach { case (_, n, c, ppm) =>
      assert(ppm == c * 1000000L / n)
      assert(c <= n)
    }
  }

  test("q400: hashed order reads mixed, source-sorted reads clumped") {
    val rows = q("q400_shuffle_quality_audit").collect()
    val byOrd = rows.groupBy(_.getString(0))
    assert(byOrd.keySet == Set("hashed", "source_sorted"))
    // every shard covered, doc counts tile the corpus exactly, per arm
    val n = graft.queries.Tables.documents(spark, sf).count()
    byOrd.foreach { case (ord, rs) =>
      assert(rs.map(_.getLong(2)).sum == n, s"$ord shards do not tile")
      assert(rs.map(_.getString(5)).distinct.length == 1)
      rs.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(4) <= 1000000L))
    }
    assert(byOrd("hashed").head.getString(5) == "mixed",
      "the md5 shuffle must pass the audit")
    assert(byOrd("source_sorted").head.getString(5) == "clumped",
      "the pathological order must fail the audit")
    // the clumped arm is clumped for the right reason: each of its
    // shards sees strictly fewer sources than the corpus has
    val nSrc = graft.queries.Tables.documents(spark, sf)
      .select("source").distinct().count()
    byOrd("source_sorted").foreach(r => assert(r.getLong(3) < nSrc))
  }
}
