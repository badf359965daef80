package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, twentieth batch: weighted reservoir, join-size
  * estimation.
  */
class Pipeline72Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q378: driver replay; heavier docs overrepresented in the sample") {
    val rows = q("q378_weighted_reservoir").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.map(_._2).sorted.toSeq == (1L to g.length))
      // keys descend with rank
      g.sortBy(_._2).sliding(2).foreach { case Array(a, b) =>
        assert(a._5 >= b._5)
      }
    }
    // driver replay of the whole ranking
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"),
        greatest(lit(1L), size(split(lower(col("text")), "\\s+"))
          .cast("long")).as("w"),
        expr("CAST(conv(substring(md5(concat('es:', " +
          "CAST(doc_id AS STRING))), 1, 6), 16, 10) AS BIGINT) " +
          "% 999999 + 1").as("u"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = docs.groupBy(_._1).toSeq.flatMap { case (src, g) =>
      g.toSeq.map { case (_, id, w, u) =>
        (src, id, w, math.round(math.log(u.toDouble / 1e6) / w * 1e9))
      }.sortBy { case (_, id, _, k) => (-k, id) }.take(3).zipWithIndex
        .map { case ((s2, id, w, k), i) => (s2, i + 1L, id, w, k) }
    }.toSet
    assert(rows.toSet == expected)

    // selection probability tracks weight: sampled docs' mean weight
    // exceeds the corpus mean (heavier docs float up)
    val sampledMean = rows.map(_._4).sum.toDouble / rows.length
    val corpusMean = docs.map(_._3).sum.toDouble / docs.length
    assert(sampledMean > corpusMean,
      s"sampled mean $sampledMean vs corpus $corpusMean")
  }

  test("q379: estimates are collision-biased high and tighten with buckets") {
    val rows = q("q379_join_size_estimate").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.map(_._1).toSeq == Seq(256L, 1024L, 4096L))
    val exact = rows.head._3
    assert(rows.forall(_._3 == exact))
    rows.foreach { t =>
      assert(t._2 >= exact, "bucket collisions only add mass")
      assert(t._4 == (t._2 - exact) * 10000L / exact)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 >= b._2, "finer histograms estimate no worse")
    }
    // exact join size cross-check
    val li = graft.queries.Tables.lineitem(spark, sf).count()
    // every lineitem row joins exactly one order: exact = |lineitem|
    assert(exact == li)
  }
}
