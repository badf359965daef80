package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, fifth batch: erasure-audit consistency. */
class Pipeline57Spec extends SparkSpec {

  test("q340: censuses match direct recomputation and cascade consistently") {
    val rows = graft.SparkEntry.queries("q340_erasure_audit")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(rows.keySet == Set("customer", "orders", "lineitem", "events"))
    // direct recomputation of the customer census
    val nSubj = Tables.customer(spark, sf)
      .filter(col("c_custkey") % 97 === 0).count()
    assert(rows("customer")._1 == nSubj)
    assert(rows("customer")._2 == nSubj) // custkey unique ⇒ 1 row each
    rows.foreach { case (t, (subj, affected, total, bp)) =>
      assert(affected >= subj, s"$t: fewer rows than subjects")
      assert(affected <= total)
      assert(bp == affected * 10000 / math.max(1L, total))
    }
    // the transitive hop can't touch more orders than the FK hop rows
    assert(rows("lineitem")._1 <= rows("orders")._2,
      "affected lineitem orders exceed affected orders")
  }
}
