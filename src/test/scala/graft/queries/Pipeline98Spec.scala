package graft.queries

import graft.SparkSpec

/** Round-17 session-2 second batch: takedown propagation through
  * derived artifacts (q459) and the eval-refresh contamination delta
  * (q460). */
class Pipeline98Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q459: actions partition correctly; re-election picks the min survivor; packs flag only hit bins") {
    val rows = q("q459_takedown_propagation").collect()
    assert(rows.nonEmpty)
    val byKind = rows.groupBy(_.getString(0))
    // all three artifact kinds fire on the fixture
    assert(byKind.keySet == Set("doc", "family", "pack"), byKind.keySet)
    val docs = byKind("doc")
    val fams = byKind("family")
    // every takedown family action is attributable: a re_elected family
    // carries a new_rep strictly greater than the old rep (min-id-keep
    // means the shipped copy was the smallest id); family_removed never
    // carries one
    fams.foreach { r =>
      r.getString(2) match {
        case "re_elected" =>
          assert(!r.isNullAt(3) &&
            r.getLong(3) > r.getString(1).toLong, r.toString)
          assert(r.getLong(4) > 0, s"re-elected family with no survivors: $r")
        case "family_removed" =>
          assert(r.isNullAt(3), r.toString)
          assert(r.getLong(4) > 0, r.toString)
        case other => fail(s"unknown family action $other: $r")
      }
    }
    // a family row exists only when its rep was removed — so the old
    // rep must appear among the removed docs as 'removed_shipped'
    val shipped = docs.filter(_.getString(2) == "removed_shipped")
      .map(_.getString(1)).toSet
    fams.foreach(r => assert(shipped.contains(r.getString(1)),
      s"family action without a removed_shipped rep: $r"))
    // unshipped removals never trigger a family rewrite
    val unshipped = docs.filter(_.getString(2) == "removed_unshipped")
      .map(_.getString(1)).toSet
    fams.foreach(r => assert(!unshipped.contains(r.getString(1))))
    // both doc flavors fire (the fixture plants multi-member families
    // whose non-rep members can be individually named)
    assert(shipped.nonEmpty && unshipped.nonEmpty)
    // pack rows: positive removed-count, id shaped source#bin
    byKind("pack").foreach { r =>
      assert(r.getString(2) == "rebuild", r.toString)
      assert(r.getString(1).contains("#"), r.toString)
      assert(r.getLong(4) > 0, r.toString)
    }
  }

  test("q460: mirrors of the new slice are convicted; pulls are exactly the released new-slice docs") {
    val rows = q("q460_eval_refresh_delta").collect()
    assert(rows.nonEmpty)
    val byAction = rows.groupBy(_.getString(2))
    assert(byAction.keySet == Set("now_holdout", "newly_contaminated"),
      byAction.keySet)
    // planted crawl mirrors (+60M) of new-slice docs were invisible to
    // the old decontamination and must be convicted now — every mirror
    // whose source doc has >= 6 tokens shares all its 6-grams
    val convicted = byAction("newly_contaminated")
    assert(convicted.exists(_.getLong(0) >= 60000000L),
      "no planted mirror convicted")
    convicted.foreach(r => assert(r.getLong(3) > 0,
      s"convicted with zero new-gram hits: $r"))
    // pulls are new-slice members (id % 43 = 5, not old-eval, base ids)
    byAction("now_holdout").foreach { r =>
      val id = r.getLong(0)
      assert(id % 43 == 5 && id % 41 != 3 && id < 10000000L, r.toString)
      assert(r.getLong(3) == 0L, r.toString)
    }
    // no doc appears twice (pull and conviction are disjoint by
    // construction: convictions exclude the new slice)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
  }
}
