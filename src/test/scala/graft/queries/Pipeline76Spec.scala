package graft.queries

import graft.SparkSpec

/** Round-14 pack, third batch: mixture planners. */
class Pipeline76Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q384: waterfill hits the budget within truncation slack") {
    val rows = q("q384_token_budget_waterfill").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val lambdas = rows.map(_._4).distinct
    assert(lambdas.length == 1, "lambda is a single global water level")
    val lam = lambdas.head
    val budgetMilli = rows.map(_._2).sum * 2000L
    val spentMilli = rows.map(r => math.min(r._3, lam) * r._2).sum
    rows.foreach { case (src, t, cap, _, alloc, allocTok, capped) =>
      assert(alloc == math.min(cap, lam), s"$src alloc != min(cap, lam)")
      assert(allocTok == alloc * t / 1000L, s"$src alloc_tokens identity")
      assert((capped == 1L) == (cap <= lam), s"$src capped flag")
    }
    // the level either exhausts the budget up to integer-div slack
    // (< suffix token mass in milli) or every source sits at cap
    if (rows.exists(_._7 == 0L)) {
      val interiorT = rows.filter(_._7 == 0L).map(_._2).sum
      assert(spentMilli <= budgetMilli, "over-allocated")
      assert(budgetMilli - spentMilli < interiorT,
        s"slack ${budgetMilli - spentMilli} >= interior mass $interiorT")
    } else {
      assert(spentMilli <= budgetMilli, "all-capped must fit the budget")
    }
  }

  test("q385: retention curve is a monotone CDF complement") {
    val rows = q("q385_quality_retention_curve").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (src, g) =>
      val s = g.sortBy(_._2)
      assert(s.map(_._2).toSeq == (0L until 10L).map(_ * 250L),
        s"$src threshold grid")
      assert(s.head._5 == 10000L && s.head._6 == 10000L,
        s"$src thr=0 must retain everything")
      s.sliding(2).foreach { case Array(a, b) =>
        assert(a._3 >= b._3 && a._4 >= b._4,
          s"$src retention not monotone at thr=${b._2}")
      }
    }
  }
}
