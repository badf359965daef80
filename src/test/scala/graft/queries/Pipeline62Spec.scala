package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, tenth batch: greedy coverage selection, MAD outliers,
  * corpus manifest.
  */
class Pipeline62Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q350: greedy selection matches a driver-side greedy replay") {
    val rows = q("q350_coverage_selection").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 5)
    assert(rows.map(_._1).toSeq == (1L to 5L))
    // gains are non-increasing (submodularity of coverage)
    rows.sliding(2).foreach { case Array(a, b) => assert(a._3 >= b._3) }
    // cum tiles the gains; coverage bounded
    var cum = 0L
    rows.foreach { t => cum += t._3; assert(t._4 == cum) }
    assert(rows.last._6 <= 1000000L)
    // winners are distinct docs
    assert(rows.map(_._2).distinct.length == 5)

    // driver greedy replay over the same postings
    val posts = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.expressions.functions.ngram_shingles(
          split(lower(col("text")), "\\s+"), 3, distinct = true)).as("sh"))
      .select(col("doc_id"),
        conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
          .as("g"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = posts.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var covered = Set.empty[Long]
    (1 to 5).foreach { r =>
      val (winner, gain) = byDoc.view
        .map { case (d, gs) => (d, (gs -- covered).size.toLong) }
        .toSeq.sortBy { case (d, g) => (-g, d) }.head
      val row = rows(r - 1)
      assert(row._2 == winner && row._3 == gain,
        s"round $r: got (${row._2}, ${row._3}), expected ($winner, $gain)")
      covered ++= byDoc(winner)
    }
  }

  test("q351: medians match a driver recompute; z signs and flags consistent") {
    val rows = q("q351_mad_outliers").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6)))
    assert(rows.nonEmpty)
    def lowerMedian(xs: Seq[Long]): Long = {
      val s = xs.sorted
      s((s.length + 1) / 2 - 1)
    }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val med = lowerMedian(g.map(_._3))
      assert(g.forall(_._4 == med))
      val mad = lowerMedian(g.map(t => math.abs(t._3 - med)))
      assert(g.forall(_._5 == mad))
      g.foreach { t =>
        val z = (if (t._3 >= med) 1L else -1L) *
          ((6745L * math.abs(t._3 - med)) / (10L * math.max(1L, mad)))
        assert(t._6 == z)
        assert(t._7 == (math.abs(z) > 3500L))
      }
    }
  }

  test("q352: manifest is deterministic and the bucket fold is mergeable") {
    val a = q("q352_corpus_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val b = q("q352_corpus_manifest").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(a.sameElements(b), "manifest must be rerun-stable")
    a.foreach { case (_, nRows, nBuckets, root) =>
      assert(nRows > 0L && nBuckets >= 1L && nBuckets <= 256L)
      assert(root.length == 32)
    }
    // mergeability: bucket folds over even/odd doc halves sum (mod M)
    // to the full-corpus fold — the partial-agg/shard-merge contract
    val M = BigInt(2305843009213693951L)
    def folds(filterExpr: String): Map[(String, Long), BigInt] =
      graft.queries.Tables.documents(spark, sf)
        .filter(expr(filterExpr))
        .select(col("source"),
          conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text"))), 1, 15), 16, 10).cast("long").as("h"))
        .select(col("source"), col("h"), pmod(col("h"), lit(256L)).as("b"))
        .groupBy(col("source"), col("b"))
        .agg((sum(col("h").cast("decimal(38,0)")) %
          lit(2305843009213693951L)).cast("long").as("fold"))
        .collect()
        .map(r => (r.getString(0), r.getLong(1)) -> BigInt(r.getLong(2)))
        .toMap
    val full = folds("true")
    val even = folds("doc_id % 2 = 0")
    val odd = folds("doc_id % 2 = 1")
    full.foreach { case (k, f) =>
      val merged = (even.getOrElse(k, BigInt(0)) +
        odd.getOrElse(k, BigInt(0))) % M
      assert(merged == f, s"bucket $k: merged $merged vs full $f")
    }
  }
}
