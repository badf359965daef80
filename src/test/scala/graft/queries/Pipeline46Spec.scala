package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.expressions.{JaroWinkler, StringSimKernels}

/** Round-12 pack, tenth batch: the Jaro–Winkler kernel pinned to the
  * published worked examples and its algebraic properties; isotonic
  * calibration differentialed against a sequential PAVA; FD-audit and
  * blocking-audit invariants on the gate outputs.
  */
class Pipeline46Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def jw(a: String, b: String): Double =
    StringSimKernels.jaroWinkler(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))

  test("jaro-winkler matches the published worked examples") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111) < 1e-9)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333) < 1e-9)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962963) < 1e-9)
    // above the 0.7 boost threshold but zero common prefix -> unboosted
    assert(math.abs(jw("CRATE", "TRACE") - 0.7333333333) < 1e-9)
    // transposition accounting: m=2, both matched chars out of order
    assert(math.abs(jw("ABCD", "DCBA") - 0.5) < 1e-9)
  }

  test("jaro-winkler edge cases and algebraic properties") {
    assert(jw("", "") == 1.0)
    assert(jw("A", "") == 0.0)
    assert(jw("ABC", "ABC") == 1.0)
    assert(jw("ABC", "XYZ") == 0.0)
    // symmetry + bounds over generated pairs
    val words = Seq("Customer#000000001", "Customer#000000010",
      "Custmer#000000001", "supplier", "Supplier#01", "a", "ab", "ba")
    for (a <- words; b <- words) {
      assert(math.abs(jw(a, b) - jw(b, a)) < 1e-15, s"symmetry $a/$b")
      assert(jw(a, b) >= 0.0 && jw(a, b) <= 1.0, s"bounds $a/$b")
    }
  }

  test("JaroWinkler expression: codegen path agrees with the kernel, nulls propagate") {
    import spark.implicits._
    val df = Seq(("MARTHA", "MARHTA"), ("DIXON", "DICKSONX"),
      ("Customer#000000001", "Customer#000000002"))
      .toDF("a", "b")
    val got = df.select(JaroWinkler(col("a"), col("b")).as("j"))
      .collect().map(_.getDouble(0))
    val want = Seq(jw("MARTHA", "MARHTA"), jw("DIXON", "DICKSONX"),
      jw("Customer#000000001", "Customer#000000002"))
    got.zip(want).foreach { case (g, w) => assert(g == w) }
    val withNull = Seq((Some("x"), None: Option[String])).toDF("a", "b")
      .select(JaroWinkler(col("a"), col("b")).as("j")).collect()
    assert(withNull.head.isNullAt(0))
  }

  test("q318: single-deletion typos score near 1 and usually outrank the control") {
    val rows = q("q318_jaro_winkler").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (typo, next) = (r.getDouble(1), r.getDouble(2))
      // single deletion in an 18-char name: JW stays near 1
      assert(typo > 0.9, s"jw_typo $typo")
      // the flag is the rounded comparison, exactly
      assert((r.getInt(3) == 1) == (typo > next))
    }
    // adjacent-key controls are DELIBERATELY hard: they keep the full
    // prefix-4 boost (trailing-digit difference) while an early
    // deletion forfeits it, so they edge out some typos — the typo
    // still wins the majority, and the gate pins every exact value
    val wins = rows.count(_.getInt(3) == 1)
    assert(wins * 2 > rows.length, s"typo wins $wins/${rows.length}")
  }

  test("q319 isotonic fit equals sequential PAVA and is monotone") {
    val rows = q("q319_isotonic_calibration").orderBy("bin").collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1))
    val pos = rows.map(_.getLong(2))
    val iso = rows.map(_.getLong(4))
    // monotone non-decreasing
    iso.sliding(2).foreach {
      case Array(a, b) => assert(a <= b, s"fit not monotone: $a > $b")
      case _ =>
    }
    // sequential pool-adjacent-violators on exact rationals
    case class Block(var num: Long, var den: Long)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[Block]
    for (i <- n.indices) {
      blocks += Block(pos(i), n(i))
      // pool while the last block's rate < the previous block's rate
      var merged = true
      while (merged && blocks.size >= 2) {
        val a = blocks(blocks.size - 2)
        val b = blocks.last
        if (b.num * a.den < a.num * b.den) {
          blocks.remove(blocks.size - 1)
          a.num += b.num; a.den += b.den
        } else merged = false
      }
    }
    // expand block rates back over their bins by re-walking n
    val expanded = scala.collection.mutable.ArrayBuffer.empty[Long]
    var bi = 0
    var acc = 0L
    for (bl <- blocks) {
      acc = 0L
      while (acc < bl.den) { acc += n(bi); expanded += bl.num * 1000000L / bl.den; bi += 1 }
      assert(acc == bl.den, "PAVA blocks must align with bin boundaries")
    }
    assert(expanded.toSeq == iso.toSeq,
      s"PAVA ${expanded.mkString(",")} vs gate ${iso.mkString(",")}")
  }

  test("q320: constant RHS always holds; holds == (distinct_pairs == n_keys)") {
    val rows = q("q320_fd_audit").collect()
    assert(rows.length == 20) // 5 columns, ordered pairs
    rows.foreach { r =>
      val (lhs, rhs) = (r.getString(0), r.getString(1))
      val nKeys = r.getLong(2)
      val viol = r.getLong(3)
      val pairs = r.getLong(4)
      val maxF = r.getLong(5)
      val holds = r.getInt(6)
      assert(viol <= nKeys)
      assert(pairs >= nKeys && maxF >= 1)
      assert((holds == 1) == (pairs == nKeys), s"$lhs->$rhs")
      assert((holds == 1) == (viol == 0), s"$lhs->$rhs")
      if (rhs == "o_shippriority")
        assert(holds == 1, s"constant RHS must hold for $lhs")
    }
    // at least one genuine violation in the grid (clerk -> status etc.)
    assert(rows.exists(_.getInt(6) == 0))
  }

  test("q321: deletion blocking is complete on the planted truth") {
    val r = q("q321_blocking_audit").collect().head
    val nRecords = r.getLong(0)
    val nCand = r.getLong(1)
    val nTruth = r.getLong(2)
    assert(nTruth > 0 && r.getLong(3) == nTruth)
    assert(r.getLong(4) == 1000000L, "pair completeness must be 1e6")
    // the blocker must actually block (zero-padded fixture names are
    // digit-dense, so tiny-SF collision rates are high — the reduction
    // sharpens with scale; the gate value pins the exact number)
    val allPairs = nRecords * (nRecords - 1) / 2
    assert(nCand * 2 < allPairs, s"$nCand of $allPairs")
    assert(r.getLong(5) == 1000000L - nCand * 1000000L / allPairs)
  }

  test("deletionCandidates: distance-1 pairs covered, distance-2 pair absent") {
    import spark.implicits._
    val df = Seq((1L, "abcd"), (2L, "abd"), (3L, "abxd"), (4L, "cd"))
      .toDF("id", "s")
    val got = graft.operators.FuzzyJoin.deletionCandidates(df, "id", "s")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // dist("abcd","abd")=1, dist("abcd","abxd")=1, dist("abd","abxd")=1
    assert(got.contains((1L, 2L)) && got.contains((1L, 3L)) &&
      got.contains((2L, 3L)))
    // dist("abcd","cd")=2 — must not be a candidate
    assert(!got.contains((1L, 4L)))
  }
}
