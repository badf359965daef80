package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 eighth batch: decay bounds, S-curve bracket ordering,
  * rep-selection regret accounting.
  */
class Pipeline44Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q312 decayed mix: weights bounded, shares sum to ~1e6") {
    val out = q("q312_decayed_mix").collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) * 1000000L,
        s"decayed mass exceeds undecayed: $r")
    }
    val rawSum = out.map(_.getLong(3)).sum
    val decSum = out.map(_.getLong(4)).sum
    assert(rawSum <= 1000000L && rawSum > 1000000L - out.length,
      s"raw shares sum $rawSum")
    assert(decSum <= 1000000L && decSum > 1000000L - out.length,
      s"decayed shares sum $decSum")
  }

  test("q313 LSH planner: one winner, aggressive/conservative bracket") {
    val out = q("q313_lsh_planner").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out.values.count(_.getLong(6) == 1) == 1, "not exactly one best")
    assert(out.values.map(_.getLong(2)).toSet.size == 1,
      "pair totals differ across configs")
    // b=64,r=1 candidates almost everything (high fp, low fn);
    // b=1,r=64 candidates almost nothing (low fp, high fn)
    assert(out(64L).getDouble(3) >= out(1L).getDouble(3),
      "aggressive config should have more false candidates")
    assert(out(64L).getDouble(4) <= out(1L).getDouble(4),
      "aggressive config should miss fewer true pairs")
  }

  test("q314 rep selection: every planted group, nonnegative regret") {
    val out = q("q314_rep_selection").collect()
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") % 40 === 0)
      .select(md5(col("text"))).distinct().count()
    assert(out.length == expected,
      s"${out.length} groups != $expected planted")
    out.foreach { r =>
      assert(r.getLong(1) >= 2)
      assert(r.getLong(4) >= r.getLong(2), s"best_q < min_q: $r")
      assert(r.getLong(5) == r.getLong(4) - r.getLong(2),
        s"regret arithmetic: $r")
    }
  }
}
