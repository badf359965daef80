package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 pack, eleventh batch: the simplified-Soundex variant pinned
  * on the classic worked examples (including where it deliberately
  * diverges from archival h/w-bridging Soundex), blocking-census
  * accounting, and the q323 power iteration differentialed against a
  * sequential long-arithmetic replay of the same integer recipe.
  */
class Pipeline47Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  /** The gate's Soundex recipe, sequentially. */
  private def soundex(word: String): String = {
    val map = "01230120022455012623010202"
    val w = word.toUpperCase
    val codes = w.map(c => map(c - 'A'))
    val collapsed = new StringBuilder
    for (c <- codes) {
      if (collapsed.isEmpty || collapsed.last != c) collapsed += c
    }
    val tail = collapsed.toString.drop(1).filter(_ != '0')
    (w.head + tail).take(4).padTo(4, '0')
  }

  test("simplified soundex matches the worked examples (variant pinned)") {
    assert(soundex("ROBERT") == "R163") // = archival
    assert(soundex("RUPERT") == "R163")
    assert(soundex("TYMCZAK") == "T522") // = archival
    assert(soundex("PFISTER") == "P236") // adjacent same-code collapse
    assert(soundex("WIDGET") == "W323")
    // the DOCUMENTED divergence: archival h/w-bridging would give A261
    // (S and C merge across the H); the simplified variant keeps both
    assert(soundex("ASHCRAFT") == "A226")
  }

  test("q322: codes well-formed, census accounts for every part") {
    val rows = q("q322_soundex_blocking").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getString(0).matches("[A-Z][0-9]{3}"), r.getString(0))
      assert(r.getLong(1) >= r.getLong(2)) // n_parts >= n_words
      assert(soundex(r.getString(3)) == r.getString(0),
        s"sample word must code to its own block: ${r.getString(3)}")
    }
    val total = rows.map(_.getLong(1)).sum
    val parts = Tables.part(spark, sf).count()
    assert(total == parts)
  }

  test("q323 equals a sequential long-arithmetic replay of the recipe") {
    val rows = q("q323_power_iteration").orderBy("i").collect()
    assert(rows.length == 16)
    val vUnit = rows.map(_.getLong(1))
    val lambda = rows.head.getLong(2)
    val trace = rows.head.getLong(3)

    // sequential replay from the raw fixture
    val vecs = Tables.embeddings(spark, sf)
      .select(graft.pipeline.Similarity.quantize(col("embedding")).as("q"))
      .collect().map(_.getSeq[Long](0).take(16).toArray)
    val n = vecs.length.toLong
    val mu = Array.tabulate(16)(i => vecs.map(_(i)).sum / n)
    val cov = Array.tabulate(16, 16) { (i, j) =>
      val sp = vecs.map(v => v(i) * v(j)).sum
      (sp - n * mu(i) * mu(j)) / n
    }
    var v = Array.fill(16)(1000000L)
    var lastMax = 0L
    for (_ <- 1 to 3) {
      val w = Array.tabulate(16)(i =>
        (0 until 16).map(j => cov(i)(j) * v(j)).sum)
      lastMax = w.map(math.abs).max
      val sc = math.max(1L, lastMax / 1000000L)
      v = w.map(_ / sc)
    }
    assert(v.toSeq == vUnit.toSeq,
      s"replay ${v.mkString(",")} vs gate ${vUnit.mkString(",")}")
    assert(lambda == lastMax / 1000000L)
    assert(trace == (0 until 16).map(i => cov(i)(i)).sum)
    // renormalized direction: the peak component sits on the 1e6 grid
    val mx = vUnit.map(math.abs).max
    assert(mx >= 1000000L && mx <= 1000002L, s"max |v| = $mx")
    assert(lambda > 0 && lambda <= trace, "PSD spectrum sanity")
  }
}
