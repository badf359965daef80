package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, second/third batches: planner invariants. */
class Pipeline54Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q333: salt plan is self-bounding and every fan-out is real") {
    val rows = q("q333_salt_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // hot = share > 0.1% ⇒ at most 1000 rows, salt ≥ 2, and the
    // planned post-salt group always shrinks below the original
    assert(rows.length <= 1000)
    rows.foreach { case (_, n, share, salt, after) =>
      assert(share > 1000L)
      assert(salt >= 2L)
      assert(after < n && after * salt >= n, s"ceil split broken: $n/$salt")
    }
  }

  test("q334: compaction plan preserves rows and bytes, bins are day-local") {
    val rows = q("q334_compaction_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    val nOrders = Tables.orders(spark, sf).count()
    assert(rows.map(_._4).sum == nOrders, "every row lands in some bin")
    rows.foreach { case (_, bin, nIn, _, _) =>
      assert(bin >= 0L && nIn >= 1L)
    }
    // the plan never has more output files than input files
    val inputFiles = Tables.orders(spark, sf)
      .select(expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 " +
        "00:00:00', o_orderdate) div 86400000000").as("day"),
        (col("o_orderkey") % 8).as("task"))
      .distinct().count()
    assert(rows.length <= inputFiles)
    assert(rows.map(_._3).sum == inputFiles, "every input file is packed")
  }

  test("q335: encoding verdicts read as a parquet writer would hope") {
    val m = q("q335_encoding_advisor").collect()
      .map(r => r.getString(0) -> r.getString(7)).toMap
    assert(m("o_orderkey") == "delta") // monotone arrival order
    assert(m("o_orderstatus") == "dictionary")
    assert(m("o_orderpriority") == "dictionary")
    assert(m("o_custkey") == "plain")
  }

  test("q337: Bradley-Terry strengths rank with win rates") {
    val rows = graft.SparkEntry.queries("q337_bradley_terry")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length == 5) // the five order priorities
    rows.foreach { case (_, ng, w, s) =>
      assert(w <= ng); assert(s > 0L)
    }
    // the strongest item by fitted strength is also the win-rate leader
    val byStrength = rows.maxBy(_._4)._1
    val byWinRate = rows.maxBy(t => t._3.toDouble / t._2)._1
    assert(byStrength == byWinRate)
  }

  test("q338: HT accounting is internally consistent") {
    val rows = graft.SparkEntry.queries("q338_importance_sample")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, tt, ns, ht, err) =>
      assert(ns <= nd)
      assert(tt >= 0L && err >= 0L)
      assert((ns == 0L) == (ht == 0L), "HT estimate nonzero iff sampled")
    }
    assert(rows.exists(_._4 > 0L), "something must be sampled")
  }
}
