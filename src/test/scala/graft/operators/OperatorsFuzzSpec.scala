package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized differentials: each operator vs its brute-force
  * definition on adversarial-ish random data (negatives, boundary
  * collisions, skew). Deterministic (fixed seeds) — failures reproduce. */
class OperatorsFuzzSpec extends SparkSpec {

  import spark.implicits._

  test("range join == brute-force BETWEEN join on random data with negatives") {
    val rnd = new Random(42)
    val points = (1 to 300).map(i => (i.toLong, rnd.between(-500L, 500L))).toDF("pid", "pt")
    val intervals = (1 to 80).map { i =>
      val lo = rnd.between(-500L, 480L)
      (i.toLong, lo, lo + rnd.between(0L, 50L)) // width <= 50 = binWidth
    }.toDF("iid", "lo", "hi")
    val got = RangeJoin.binned(points, "pt", intervals, "lo", "hi", binWidth = 50L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val brute = points.crossJoin(intervals)
      .filter(col("pt").between(col("lo"), col("hi")))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "degenerate fixture: no matches at all")
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("band join == brute-force |a-b| <= eps self-join on random data") {
    val rnd = new Random(99)
    val pts = (1 to 400).map(i => (i.toLong, rnd.between(-1000L, 1000L))).toDF("id", "v")
    val got = RangeJoin.bandJoin(pts, "id", "v", eps = 7L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    val a = pts.select(col("id").as("a_id"), col("v").as("av"))
    val brute = a.crossJoin(pts.select(col("id").as("b_id"), col("v").as("bv")))
      .filter(col("a_id") < col("b_id") && abs(col("av") - col("bv")) <= 7)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("heavy hitters == GROUP BY HAVING on random zipf-ish data") {
    val rnd = new Random(7)
    // skewed: ~half the mass on 6 hot keys, rest over ~400 tail keys
    val rows = (1 to 4000).map { _ =>
      if (rnd.nextBoolean()) s"hot_${rnd.nextInt(6)}" else s"tail_${rnd.nextInt(400)}"
    }
    val df = rows.toDF("k").repartition(8)
    for (k <- Seq(10, 25, 50)) {
      val got = HeavyHitters.exact(df, col("k"), k = k)
        .as[(String, Long)].collect().toMap
      val n = rows.size
      val brute = rows.groupBy(identity).view.mapValues(_.size.toLong)
        .filter { case (_, c) => c * k > n }.toMap
      assert(got == brute, s"k=$k: got $got vs brute $brute")
    }
  }

  test("fuzzy join == brute-force levenshtein<=1 join on random strings") {
    val rnd = new Random(21)
    def word() = (1 to rnd.between(3, 9)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    val lefts = (1 to 150).map(i => (i.toLong, word())).toDF("id", "s")
    val rights = (1 to 150).map(i => (i.toLong, word())).toDF("id", "s")
    val got = FuzzyJoin.editDistance1(lefts, "id", "s", rights, "id", "s")
      .select("left_id", "right_id").as[(Long, Long)].collect().toSet
    val brute = lefts.select(col("id").as("l"), col("s").as("a"))
      .crossJoin(rights.select(col("id").as("r"), col("s").as("b")))
      .filter(levenshtein(col("a"), col("b")) <= 1)
      .select("l", "r").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty, "degenerate fixture: no close pairs")
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
  }

  test("multi-distinct == count_distinct on random data with null stripes") {
    val rnd = new Random(13)
    val df = (1 to 2000).map { _ =>
      (s"g${rnd.nextInt(5)}",
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(40)),
        rnd.nextInt(300).toString)
    }.toDF("g", "a", "b")
    val got = MultiDistinct.exact(df, Seq("g"), Seq("nd_a" -> "a", "nd_b" -> "b"))
      .orderBy("g").select("g", "cnt", "nd_a", "nd_b")
      .as[(String, Long, Long, Long)].collect().toSeq
    val exp = df.groupBy("g")
      .agg(count(lit(1)).as("cnt"), count_distinct(col("a")).as("nd_a"),
        count_distinct(col("b")).as("nd_b"))
      .orderBy("g").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == exp)
  }
}
