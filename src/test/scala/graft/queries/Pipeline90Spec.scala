package graft.queries

import graft.SparkSpec

/** Round-15 pack, eleventh batch: templates, source map, dup-quality,
  * opt-out.
  */
class Pipeline90Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q432: slot templates read near-total positional agreement; prose stays diffuse") {
    val rows = q("q432_template_slots").collect()
    rows.foreach { r =>
      val (src, modal, present, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(modal <= present && bp == modal * 10000L / present)
      if (srcMod(src, 5) == 3)
        assert(r.getString(4) == "template_farm" && bp > 8000L,
          s"farm $src read $bp bp")
      else
        assert(r.getString(4) == "organic" && bp < 2000L,
          s"organic $src read $bp bp agreement")
    }
    assert(rows.exists(_.getString(4) == "template_farm"))
  }

  test("q433: every mirror's nearest neighbor is its original, and self-ce < ce to strangers") {
    val rows = q("q433_source_xentropy_map").collect()
    val bySrc = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      val src = r.getString(0)
      if (src.startsWith("mirror_")) {
        assert(r.getString(2) == src.stripPrefix("mirror_"),
          s"$src nearest is ${r.getString(2)} — the dialect marker lost")
      } else {
        // the reverse direction is NOT asserted: a 5-doc mirror is a
        // heavily-smoothed model of its 25-doc original, so an
        // original's nearest can be another small mirror — only the
        // mirror→original direction carries the dialect-marker signal
        val _ = bySrc
      }
      assert(r.getLong(4) == r.getLong(3) - r.getLong(1))
    }
    // for full-size originals, self is the best model of itself
    rows.filter(r => !r.getString(0).startsWith("mirror_"))
      .foreach(r => assert(r.getLong(4) > 0L,
        s"${r.getString(0)}: a stranger models it better than itself"))
  }

  test("q434: duplicated content is junk — k=3 clusters read zero mean score") {
    val rows = q("q434_dup_quality_interaction").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.contains(1L) && rows.contains(3L),
      s"expected singleton + triple clusters, got ${rows.keys.toSeq.sorted}")
    assert(rows(3L).getLong(2) == 0L,
      "re-published zero-stopword docs must average zero")
    assert(rows(1L).getLong(2) > 100000L,
      "singletons lost the corpus-average score")
    // every re-published doc forms exactly one k=3 cluster
    assert(rows(3L).getLong(1) > 0L)
  }

  test("q435: only mirrors of opted-out sources violate, at 100% of their docs") {
    val rows = q("q435_optout_compliance").collect()
    val optedOut = rows.map(_.getString(0))
      .filter(!_.startsWith("mirror_")).filter(srcMod(_, 11) == 8)
    // opted-out sources are absent from the release entirely
    rows.foreach { r =>
      val src = r.getString(0)
      assert(!(!src.startsWith("mirror_") && srcMod(src, 11) == 8),
        s"opted-out $src leaked into the release as itself")
      if (src.startsWith("mirror_") &&
        srcMod(src.stripPrefix("mirror_"), 11) == 8) {
        assert(r.getString(4) == "non_compliant" &&
          r.getLong(2) == r.getLong(1),
          s"$src must violate on every doc (pure re-publication)")
      } else {
        assert(r.getString(4) == "compliant" && r.getLong(2) == 0L,
          s"$src reads violations without opted-out content")
      }
      assert(r.getLong(3) == r.getLong(2) * 10000L / r.getLong(1))
    }
    val _ = optedOut
    assert(rows.exists(_.getString(4) == "non_compliant"),
      "no violation despite the opted-out mirror plant")
  }
}
