package graft.queries

import graft.SparkSpec

/** Round-15 pack, eighth batch: instruction diversity, tool calls,
  * truncation, provenance.
  */
class Pipeline87Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q420: template farms page on top-verb share and entropy collapses with them") {
    val rows = q("q420_instruction_diversity").collect()
    rows.foreach { r =>
      val (src, top, ent) = (r.getString(0), r.getLong(3), r.getLong(4))
      if (srcMod(src, 10) == 6) {
        assert(r.getString(5) == "templated" && top > 5000L,
          s"template farm $src read $top bp")
        // entropy collapses well below the diverse band
        assert(ent < 1500000L, s"$src entropy $ent didn't collapse")
      } else {
        assert(r.getString(5) == "diverse" && top <= 5000L,
          s"diverse $src read $top bp")
        // 8-verb uniform draw: entropy near ln 8 ≈ 2.079e6 micro-nats
        assert(ent > 1500000L && ent < 2100000L,
          s"$src entropy $ent outside the uniform band")
      }
      assert(r.getLong(2) <= 8L)
    }
    assert(rows.exists(_.getString(5) == "templated"))
  }

  test("q421: corruption kinds are disjoint, attributed, and page only broken feeds") {
    val rows = q("q421_toolcall_schema_audit").collect()
    var (fnAll, missAll, typeAll) = (0L, 0L, 0L)
    rows.foreach { r =>
      val (src, n, fn, miss, typ, valid) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      if (srcMod(src, 8) == 5) {
        assert(r.getString(7) == "broken_feed",
          s"broken feed $src read well_formed")
        assert(fn + miss + typ > 0L)
        // the three plants are disjoint draws — flags tile the invalid
        assert(valid + fn + miss + typ == n,
          s"$src: corruption flags overlap or leak")
        fnAll += fn; missAll += miss; typeAll += typ
      } else {
        assert(r.getString(7) == "well_formed" && valid == n,
          s"clean feed $src reads invalid calls")
      }
      assert(r.getLong(6) == valid * 10000L / n)
    }
    assert(fnAll > 0L && missAll > 0L && typeAll > 0L,
      s"a corruption kind is dead: fn=$fnAll miss=$missAll type=$typeAll")
  }

  test("q422: only chopping sources lose terminal punctuation, and the cut sits at the cap") {
    val rows = q("q422_truncation_audit").collect()
    rows.foreach { r =>
      val (src, noTerm, atCap, both) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4))
      if (srcMod(src, 12) == 7) {
        assert(r.getString(6) == "truncating_ingest",
          s"chopping $src read intact")
        // every truncated doc sits exactly at the cap
        assert(both == noTerm && noTerm > 0L,
          s"$src: truncation fingerprints disagree")
      } else {
        // the '.' convention makes clean docs always end terminal
        assert(noTerm == 0L && r.getString(6) == "intact",
          s"clean $src reads $noTerm unterminated docs")
        // a natural 80-char doc may sit at the cap without truncation
        assert(both == 0L && atCap <= 2L)
      }
      assert(r.getLong(5) == noTerm * 10000L / r.getLong(1))
    }
    assert(rows.exists(_.getString(6) == "truncating_ingest"))
  }

  test("q423: the syndication feed is all copies; its victims read copied_by_others") {
    val rows = q("q423_dup_provenance").collect()
    val feed = rows.find(_.getString(0) == "agg_feed").get
    assert(feed.getLong(2) == 0L, "a copy beat its original's doc_id")
    assert(feed.getLong(3) == feed.getLong(1) &&
      feed.getString(6) == "mostly_copies")
    val victims = rows.filter(_.getString(0) != "agg_feed")
    // total foreign copies == the feed's copied mass (size-2 clusters;
    // plus any natural cross-source dups would only add equally to
    // both sides of this ledger)
    assert(victims.map(_.getLong(4)).sum >= feed.getLong(3),
      "copied_by_others ledger lost feed copies")
    victims.foreach { r =>
      assert(r.getString(6) == "mostly_original",
        s"${r.getString(0)} misread as mostly_copies")
      // an origin is counted in the victim's own origin_docs
      assert(r.getLong(4) <= 0L + rows.map(_.getLong(3)).sum)
      assert(r.getLong(5) == r.getLong(3) * 10000L / r.getLong(1))
    }
    assert(victims.map(_.getLong(2)).sum == feed.getLong(1),
      "every feed copy must have exactly one origin among the victims")
  }
}
