package graft.queries

import graft.SparkSpec

/** Round-13 pack, sixth batch: keep-policy and negative-mining
  * invariants.
  */
class Pipeline58Spec extends SparkSpec {

  test("q341: policies keep one member per cluster and the token accounting balances") {
    val rows = graft.SparkEntry.queries("q341_keep_policy_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.keySet == Set("earliest", "longest", "quality"))
    val nClusters = rows("earliest")._1
    assert(nClusters > 0)
    // same cluster count and the same TOTAL token mass under every
    // policy (policies move tokens between kept and dropped, never
    // create them)
    val total = rows("earliest")._2 + rows("earliest")._3
    rows.foreach { case (p, (n, kept, dropped, agree)) =>
      assert(n == nClusters, s"$p cluster count")
      assert(kept + dropped == total, s"$p token mass")
      assert(agree >= 0L && agree <= 10000L)
    }
    assert(rows("earliest")._4 == 10000L, "earliest agrees with itself")
    // padded variant always wins 'longest', so it never picks the base
    assert(rows("longest")._4 == 0L)
    // and longest retains strictly more tokens than earliest
    assert(rows("longest")._2 > rows("earliest")._2)
  }

  test("q342: negatives are wrong-label, ranked, and kinds don't overlap by construction") {
    val rows = graft.SparkEntry.queries("q342_hard_negatives")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val labels = Tables.embeddings(spark, sf)
      .select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    rows.foreach { case (q, n, kind, rank) =>
      assert(labels(n) != labels(q), s"negative $n shares label with $q")
      assert(rank >= 1L && rank <= 5L)
      assert(kind == "hard" || kind == "easy")
    }
    // every query contributes exactly 5 hard + 5 easy
    rows.groupBy(t => (t._1, t._3)).foreach { case ((q, k), g) =>
      assert(g.map(_._4).sorted.sameElements(Array(1L, 2L, 3L, 4L, 5L)),
        s"query $q kind $k ranks")
    }
  }
}
