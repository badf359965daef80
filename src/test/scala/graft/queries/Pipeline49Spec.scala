package graft.queries

import graft.SparkSpec

/** Round-12 pack, thirteenth batch: bloom-audit soundness (no false
  * negatives — every truly-containing file is hit) and split-audit
  * accounting.
  */
class Pipeline49Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q326: blooms never miss, fp accounting consistent") {
    val rows = q("q326_bloom_skipping").collect()
    assert(rows.nonEmpty)
    val ordersN = Tables.orders(spark, sf).count()
    val wantFiles = (ordersN + 63) / 64
    rows.foreach { r =>
      val (tot, exact, bloom, fp, fpBp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))
      assert(tot == wantFiles)
      assert(exact >= 1 && exact <= tot)
      assert(bloom >= exact, "bloom filters cannot produce false negatives")
      assert(bloom <= tot)
      assert(fp == bloom - exact)
      assert(fpBp == fp * 10000L / math.max(1L, tot - exact))
    }
  }

  test("q327: split accounting closes") {
    val r = q("q327_temporal_leakage").collect().head
    val (n, trainOnly, testOnly, leaky) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(trainOnly + testOnly + leaky == n,
      "every active user is in exactly one split class")
    val evN = Tables.events(spark, sf).count()
    assert(r.getLong(4) + r.getLong(5) == evN, "events partition")
    assert(r.getLong(6) == leaky * 1000000L / n)
  }
}
