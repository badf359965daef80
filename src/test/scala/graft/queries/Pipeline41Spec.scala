package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 fifth batch: zone-map audit dominance, Markov mass
  * conservation, curriculum stage monotonicity, vocab-coverage curve
  * shape.
  */
class Pipeline41Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q302 zonemap: sorted layout skips at least as much, and more overall") {
    val rows = q("q302_zonemap_audit").collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val years = rows.keys.map(_._2).toSeq.distinct
    years.foreach { y =>
      val (ta, ha, sa) = rows(("arrival", y))
      val (ts, hs, ss) = rows(("shipdate", y))
      assert(ha <= ta && hs <= ts, s"hits exceed totals at $y")
      assert(ss >= sa, s"sorted layout skips less at year $y: $ss < $sa")
    }
    val skipA = years.map(y => rows(("arrival", y))._3).sum
    val skipS = years.map(y => rows(("shipdate", y))._3).sum
    assert(skipS > skipA,
      s"sorted layout shows no aggregate skip win: $skipS <= $skipA")
  }

  test("q303 stationary: mass conserved up to div truncation, nonnegative") {
    val out = q("q303_markov_stationary").collect()
    val total = out.map(_.getLong(1)).sum
    assert(out.forall(_.getLong(1) >= 0))
    val nTrans = Tables.events(spark, sf)
      .select(col("event_type")).distinct().count()
    val T = 1000000000000L
    // < 1 pico-unit lost per (src,dst) div per round, 3 rounds, plus
    // the initial T div n split
    val slack = 3L * nTrans * nTrans + nTrans + 10
    assert(total <= T && total >= T - slack,
      s"stationary mass $total outside [$T - $slack, $T]")
  }

  test("q304 curriculum: partition of the corpus, monotone stages") {
    val out = q("q304_curriculum_schedule").orderBy(col("stage")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    val nDocs = Tables.documents(spark, sf).count()
    assert(out.map(_.getLong(1)).sum == nDocs)
    assert(out.last.getLong(5) == out.map(_.getLong(2)).sum,
      "terminal cum_tok != total tokens")
    out.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(3) >= a.getLong(4),
        s"stage ${b.getLong(0)} min_tok below stage ${a.getLong(0)} max_tok")
      case _ => ()
    }
  }

  test("q305 vocab coverage: monotone, bounded, consistent") {
    val out = q("q305_vocab_coverage").orderBy(col("k")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(100L, 1000L, 10000L))
    out.foreach { r =>
      assert(r.getLong(1) <= r.getLong(0), s"vocab_words > k: $r")
      assert(r.getLong(2) <= r.getLong(3), s"covered > total: $r")
      assert(r.getLong(4) <= 1000000L, s"coverage_ppm > 1e6: $r")
    }
    assert(out.map(_.getLong(2)).toSeq == out.map(_.getLong(2)).toSeq.sorted,
      "coverage not monotone in k")
  }
}
