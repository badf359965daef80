package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("points match containing intervals, boundaries inclusive") {
    val points = Seq((1L, 5L), (2L, 10L), (3L, 20L), (4L, 25L), (5L, 99L))
      .toDF("pid", "pt")
    val intervals = Seq((100L, 5L, 10L), (200L, 18L, 26L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, "pt", intervals, "lo", "hi", binWidth = 10L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    // 5 and 10 are both inside [5,10] (inclusive both ends); 20 and 25 in
    // [18,26]; 99 matches nothing.
    assert(got == Set((1L, 100L), (2L, 100L), (3L, 200L), (4L, 200L)))
  }

  test("an interval spanning a bin boundary still catches points on both sides") {
    val points = Seq((1L, 9L), (2L, 11L)).toDF("pid", "pt")
    val intervals = Seq((7L, 8L, 12L)).toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, "pt", intervals, "lo", "hi", binWidth = 10L)
      .select("pid").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // bins 0 and 1, one match through each
  }

  test("overlapping intervals each match; no dedup artifacts") {
    val points = Seq((1L, 10L)).toDF("pid", "pt")
    val intervals = Seq((1L, 5L, 15L), (2L, 9L, 11L), (3L, 11L, 12L))
      .toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, "pt", intervals, "lo", "hi", binWidth = 20L)
      .select("iid").as[Long].collect().sorted.toSeq
    assert(got == Seq(1L, 2L))
  }

  test("an interval longer than binWidth fails loudly, not silently") {
    val points = Seq((1L, 10L)).toDF("pid", "pt")
    val intervals = Seq((1L, 0L, 100L)).toDF("iid", "lo", "hi")
    val ex = intercept[Exception] {
      RangeJoin.binned(points, "pt", intervals, "lo", "hi", binWidth = 10L).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("longer than binWidth")),
      s"unexpected failure: $ex")
  }
}

class HeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  test("Misra-Gries per-partition sweep keeps every > n/cap key") {
    // 10 x a, 4 x b, 6 singletons; n = 20, cap = 3 → keys over 20/3 ≈ 6.7
    // (only "a") MUST survive; the sketch may keep a few extras.
    val it = Iterator.fill(10)("a") ++ Iterator.fill(4)("b") ++
      (1 to 6).iterator.map(i => s"s$i")
    val kept = HeavyHitters.misraGries(3)(it).toSet
    assert(kept.contains("a"), s"guaranteed hitter evicted: $kept")
    assert(kept.size <= 3)
  }

  test("exact heavy hitters: one planted hitter, exact count, no false positives") {
    // n = 110; k = 3 → threshold 36.7: only "hot" (50) qualifies ("t*"
    // singletons and the 20-row "warm" key must be recounted away).
    val rows = Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++ (1 to 40).map(i => s"t$i")
    val df = rows.toDF("k").repartition(4)
    val got = HeavyHitters.exact(df, col("k"), k = 3)
      .as[(String, Long)].collect().toMap
    assert(got == Map("hot" -> 50L), s"wrong hitters: $got")
  }

  test("multiple hitters across partitions, counts exact") {
    val rows = Seq.fill(30)("a") ++ Seq.fill(25)("b") ++ (1 to 45).map(i => s"t$i")
    val df = rows.toDF("k").repartition(8)
    val got = HeavyHitters.exact(df, col("k"), k = 5) // n/k = 20
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 30L, "b" -> 25L), s"wrong hitters: $got")
  }

  test("capacity below k is rejected (superset guarantee would break)") {
    val df = Seq("x").toDF("k")
    intercept[IllegalArgumentException] {
      HeavyHitters.exact(df, col("k"), k = 10, capacity = 5)
    }
  }

  test("a NULL key above threshold is reported (GROUP BY semantics)") {
    // n = 100, k = 3 → threshold 33.3: null (40) qualifies, "b" (25)
    // doesn't. A null-unsafe recount join would silently drop the null
    // group even though GROUP BY (and the q63 oracle shape) reports it.
    val rows: Seq[String] = Seq.fill(40)(null: String) ++
      Seq.fill(25)("b") ++ (1 to 35).map(i => s"t$i")
    val df = rows.toDF("k").repartition(4)
    val got = HeavyHitters.exact(df, col("k"), k = 3).collect()
      .map(r => (Option(r.getString(0)), r.getLong(1))).toMap
    assert(got == Map(Option.empty[String] -> 40L), s"wrong hitters: $got")
  }
}

class MultiDistinctSpec extends SparkSpec {

  import spark.implicits._

  private val df = Seq(
    ("g1", Some(1), "x"), ("g1", Some(1), "y"), ("g1", Some(2), "x"),
    ("g2", None, "x"), ("g2", None, "x"),
    ("g3", Some(5), "z"), ("g3", None, "z")
  ).toDF("g", "a", "b")

  test("matches Spark's own count_distinct, including the all-null group") {
    val got = MultiDistinct.exact(df, Seq("g"), Seq("nd_a" -> "a", "nd_b" -> "b"))
      .orderBy("g")
      .select("g", "cnt", "nd_a", "nd_b")
      .as[(String, Long, Long, Long)].collect().toSeq
    val exp = df.groupBy("g")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("a")).as("nd_a"),
        count_distinct(col("b")).as("nd_b"))
      .orderBy("g")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == exp, s"got $got vs expand-based $exp")
    assert(got.find(_._1 == "g2").get._3 == 0L) // all-null → 0, group kept
  }

  test("the plan has no Expand (the point of the rewrite)") {
    val plan = MultiDistinct.exact(df, Seq("g"), Seq("nd_a" -> "a", "nd_b" -> "b"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"Expand in plan:\n$plan")
  }

  test("a NULL grouping key keeps its distinct counts (null-safe join)") {
    // groupBy treats NULL as a real group; a name-based equi-join would
    // never match it and coalesce its counts to 0.
    val ndf = Seq((Some("g1"), Some(1)), (None, Some(2)), (None, Some(3)),
      (None, Option.empty[Int])).toDF("g", "a")
    val got = MultiDistinct.exact(ndf, Seq("g"), Seq("nd_a" -> "a"))
      .select("g", "cnt", "nd_a").collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    val exp = ndf.groupBy("g")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("a")).as("nd_a"))
      .collect()
      .map(r => (Option(r.getString(0)), r.getLong(1), r.getLong(2))).toSet
    assert(got == exp, s"got $got vs expand-based $exp")
    assert(got.contains((None, 3L, 2L)), s"null group wrong: $got")
  }
}
