package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, fourteenth batch: Zipf fit, Hill tail, bigram
  * surprisal.
  */
class Pipeline66Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q362: ranked cloud is sorted; slope is the exact integer LSQ") {
    val rows = q("q362_zipf_fit").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty && rows.length <= 256)
    assert(rows.map(_._1).toSeq == (1L to rows.length))
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._3 >= b._3, "counts non-increasing with rank")
    }
    val slope = rows.head._6
    assert(rows.forall(_._6 == slope))
    assert(slope <= 0L, "Zipf slope cannot be positive")
    val m = BigInt(rows.length)
    val sx = rows.map(t => BigInt(t._4)).sum
    val sy = rows.map(t => BigInt(t._5)).sum
    val sxx = rows.map(t => BigInt(t._4) * BigInt(t._4)).sum
    val sxy = rows.map(t => BigInt(t._4) * BigInt(t._5)).sum
    val expected = (m * sxy - sx * sy) * BigInt(1000000) /
      (m * sxx - sx * sx)
    assert(slope == expected.toLong)
  }

  test("q363: order statistics sorted; alpha is the exact Hill estimate") {
    val rows = q("q363_hill_tail").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 64)
    assert(rows.map(_._1).toSeq == (1L to 64L))
    rows.sliding(2).foreach { case Array(a, b) => assert(a._3 >= b._3) }
    val xk1 = rows.head._4
    rows.foreach { t =>
      assert(t._4 == xk1)
      assert(t._3 >= xk1, "top-64 lengths dominate x_(k+1)")
      assert(t._5 >= 0L, "log ratios nonnegative")
    }
    val alpha = rows.head._6
    assert(rows.forall(_._6 == alpha))
    assert(alpha == 64L * 1000000000000L /
      math.max(1L, rows.map(_._5).sum))
    assert(alpha > 0L)
  }

  test("q364: bigram accounting and a driver surprisal recompute") {
    val rows = q("q364_bigram_surprisal").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    rows.foreach { t =>
      assert(t._2 >= 0L)
      assert(t._3 >= 0L, "c_x >= c_xy forces nonnegative surprisal")
    }
    // accounting: n_bigrams = max(0, tok - 1) per doc
    val toks = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { t =>
      assert(t._2 == math.max(0L, toks(t._1) - 1L),
        s"doc ${t._1} bigram count")
    }
    // driver recompute over the full (small) fixture LM
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), lower(col("text")).as("t"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bigrams = texts.flatMap { case (_, t) =>
      val w = t.split("\\s+"); w.dropRight(1).zip(w.drop(1))
    }
    val cxy = bigrams.groupBy(identity).view.mapValues(_.length.toLong)
      .toMap
    val cx = bigrams.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    texts.take(25).foreach { case (id, t) =>
      val w = t.split("\\s+")
      if (w.length >= 2) {
        val terms = w.dropRight(1).zip(w.drop(1)).map { bg =>
          math.round(math.log(cx(bg._1).toDouble / cxy(bg)) * 1e6)
        }
        val expected = terms.sum / terms.length
        val got = rows.find(_._1 == id).get._3
        assert(got == expected, s"doc $id surprisal $got vs $expected")
      }
    }
  }
}
