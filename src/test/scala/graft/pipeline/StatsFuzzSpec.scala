package graft.pipeline

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Seeded randomized differentials for the Stats kernels: each
  * scale-shaped formulation (reflection identity, dimension runmax,
  * block rank-sum, life-table cumsum) vs its brute-force or
  * sequential textbook definition. Fixed seeds — failures reproduce. */
class StatsFuzzSpec extends SparkSpec {

  import spark.implicits._

  test("cusum reflection identity == sequential max(0, S+d) recursion") {
    val rnd = new Random(31)
    for (trial <- 1 to 3) {
      val n = 120 + trial * 40
      // mix of drifty and mean-zero stretches, with negatives
      val devs = (1 to n).map(_ => rnd.between(-1000L, 1100L))
      val df = devs.zipWithIndex
        .map { case (d, i) => (1L, i.toLong, d) }
        .toDF("g", "i", "dev")
      val got = Stats.cusum(df, col("g"), col("i"), col("dev"), "s")
        .orderBy(col("i")).select("s").as[Long].collect()
      val brute = devs.scanLeft(0L)((s, d) => math.max(0L, s + d)).tail
      assert(got.toSeq == brute,
        s"trial $trial: first diff at ${got.toSeq.zip(brute).indexWhere(p => p._1 != p._2)}")
    }
  }

  test("skyline2d == brute-force non-dominated filter") {
    val rnd = new Random(47)
    for (trial <- 1 to 3) {
      val pts = (1 to 500).map(_ =>
        (rnd.between(0L, 80L), rnd.between(0L, 80L)))
      val df = pts.toDF("x", "y")
      val got = Stats.skyline2d(df, col("x"), col("y"))
        .select("__x", "__best").as[(Long, Long)].collect().toSet
      // brute force: (x, best y at x) is on the frontier iff no other
      // point dominates it (x' <= x, y' >= y, strict somewhere)
      val byX = pts.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val brute = byX.filter { case (x, y) =>
        !pts.exists { case (x2, y2) =>
          x2 <= x && y2 >= y && (x2 < x || y2 > y)
        }
      }.toSet
      assert(got == brute,
        s"trial $trial: missing=${(brute -- got).take(3)} extra=${(got -- brute).take(3)}")
    }
  }

  test("aucU2 == brute-force pair count (2 wins + ties) under heavy ties") {
    val rnd = new Random(83)
    for (trial <- 1 to 3) {
      // scores from a TINY range so ties are everywhere
      val rows = (1 to 300).map { _ =>
        val y = if (rnd.nextInt(4) == 0) 1L else 0L
        // positives slightly up-shifted so AUC > 0.5
        val s = rnd.between(0L, 12L) + y * rnd.between(0L, 3L)
        (s, y)
      }
      val df = rows.toDF("s", "y")
      val r = Stats.aucU2(df, col("s"), col("y")).head()
      val np = r.getAs[Long]("np"); val nn = r.getAs[Long]("nn")
      val u2 = r.getAs[Long]("u2")
      val pos = rows.filter(_._2 == 1L).map(_._1)
      val neg = rows.filter(_._2 == 0L).map(_._1)
      assert(np === pos.size.toLong && nn === neg.size.toLong)
      // U2 - np(np+1) = 2*wins + ties over all pos x neg pairs
      val wins = (for (p <- pos; q <- neg) yield
        if (p > q) 2L else if (p == q) 1L else 0L).sum
      assert(u2 - np * (np + 1) === wins, s"trial $trial")
    }
  }

  test("kmLogSurvival == sequential life-table product in the log domain") {
    val rnd = new Random(59)
    for (trial <- 1 to 3) {
      val durs = (1 to 200).map { _ =>
        (rnd.between(0L, 25L), if (rnd.nextInt(3) == 0) 1L else 0L)
      }
      val df = durs.toDF("t", "c")
      val got = Stats.kmLogSurvival(df, col("t"), col("c"))
        .orderBy(col("t"))
        .select("t", "n_risk", "n_events", "log_surv_unats")
        .as[(Long, Long, Long, Long)].collect()
      // sequential replay: walk durations ascending, shrink the risk
      // set, accumulate rounded hazard terms
      var risk = durs.size.toLong
      var ls = 0L
      val expected = durs.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (t, group) =>
          val e = group.count(_._2 == 0L).toLong
          val c = group.count(_._2 == 1L).toLong
          if (e > 0)
            ls += math.round(math.log(
              math.max(risk - e, 1L).toDouble / risk) * 1e6)
          val row = (t, risk, e, ls)
          risk -= (e + c)
          row
      }
      assert(got.toSeq == expected, s"trial $trial")
    }
  }
}
