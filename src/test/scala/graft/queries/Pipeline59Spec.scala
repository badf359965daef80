package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, seventh batch: augmentation determinism, shard
  * integrity, budget-selection accounting.
  */
class Pipeline59Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q343: augmentation is deterministic, counts match the fingerprint story") {
    val rows = q("q343_augmentation").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_._1)
    byDoc.values.foreach { v =>
      assert(v.map(_._2).toSet == Set("dropout", "swap"))
    }
    // two runs produce identical fingerprints — the rerun-stable claim
    val again = q("q343_augmentation").collect().map(_.getString(4))
    assert(again.sameElements(rows.map(_._5)))
    rows.foreach { case (_, variant, nOut, changed, _) =>
      if (variant == "swap") assert(changed == 0L || changed == 2L)
      else assert(changed >= 0L && nOut >= 0L)
    }
    // dropout really drops ~10%: aggregate across the corpus
    val drops = rows.filter(_._2 == "dropout")
    val total = drops.map(t => t._3 + t._4).sum.toDouble
    val dropped = drops.map(_._4).sum.toDouble
    assert(dropped / total > 0.05 && dropped / total < 0.15,
      s"dropout rate ${dropped / total}")
  }

  test("q344: rep-hash sharding never splits a cluster; doc-hash does") {
    val rows = q("q344_shard_integrity").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows("rep_hash")._1 == 0L && rows("rep_hash")._2 == 0L)
    assert(rows("doc_hash")._1 > 0L, "the leaky default must leak")
    rows.foreach { case (_, (_, bp, mx, mn)) =>
      assert(bp >= 0L && bp <= 10000L); assert(mx >= mn)
    }
  }

  test("q345: budget selection takes best buckets first and lands on the budget") {
    val rows = q("q345_budget_selection").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5)))
    // monotone: take* (partial)? drop* in descending bucket order
    val statuses = rows.map(_._5)
    val boundary = statuses.indexWhere(_ != "take")
    assert(statuses.take(math.max(boundary, 0)).forall(_ == "take"))
    if (boundary >= 0) {
      assert(statuses(boundary) == "partial" || statuses(boundary) == "drop")
      assert(statuses.drop(boundary + 1).forall(_ == "drop"))
    }
    // selected token mass = the 50% budget (up to the partial bucket's
    // integer ppm truncation)
    val totalTok = rows.map(_._3).sum
    val budget = totalTok / 2
    val selected = rows.map { t =>
      if (t._5 == "take") t._3
      else if (t._5 == "partial") t._3 * t._6 / 1000000L
      else 0L
    }.sum
    assert(math.abs(selected - budget) <= rows.length + 1,
      s"selected $selected vs budget $budget")
    // cum_before is consistent with the running sum
    var cum = 0L
    rows.foreach { t => assert(t._4 == cum); cum += t._3 }
  }
}
