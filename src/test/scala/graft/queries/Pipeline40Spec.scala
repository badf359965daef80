package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.pipeline.{Retrieval, TextAnalysis}

/** Round-12 fourth batch: ACF recomputed brute-force on the collected
  * day dim, clustering coefficients cross-checked against q185's
  * triangle census, TextRank pinned on a hand graph + the
  * mass-conservation bound, RBO pinned at its identity/disjoint
  * brackets.
  */
class Pipeline40Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q298 ACF: |acf| <= 1 and brute-force recompute agrees") {
    val out = q("q298_acf_daily").collect()
    assert(out.length == 7 * out.map(_.getString(0)).distinct.length)
    out.foreach { r =>
      assert(math.abs(r.getDouble(4)) <= 1.0 + 1e-9, s"acf out of range: $r")
    }
    // brute-force one type from the tiny (type, day) dim
    val someType = out.head.getString(0)
    val days = graft.queries.Tables.events(spark, sf)
      .filter(col("event_type") === someType)
      .select(expr("ts div 86400000000000").as("day"))
      .groupBy("day").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = days.size.toLong
    val s0 = days.values.sum
    val dev = days.map { case (d, c) => d -> (n * c - s0) }
    val den = dev.values.map(v => v * v).sum
    for (lag <- 1L to 7L) {
      val num = dev.collect { case (d, v) if dev.contains(d + lag) =>
        v * dev(d + lag)
      }.sum
      val row = out.find(r => r.getString(0) == someType && r.getLong(1) == lag).get
      assert(row.getLong(2) == num && row.getLong(3) == den,
        s"lag $lag: got (${row.getLong(2)}, ${row.getLong(3)}), " +
          s"want ($num, $den)")
    }
  }

  test("q299 clustering coefficients: in range, triangles match q185") {
    val cc = q("q299_clustering_coeff")
    cc.collect().foreach { r =>
      val (dg, tri, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ppm >= 0 && ppm <= 1000000, s"cc_ppm out of [0, 1e6]: $r")
      if (dg < 2) assert(ppm == 0 && tri == 0)
      // a vertex participates in at most C(dg, 2) triangles
      assert(2 * tri <= dg * (dg - 1), s"triangles exceed wedge count: $r")
    }
    val mismatch = cc.select(col("doc_id"), col("n_triangles"))
      .except(q("q185_triangles")).count()
    assert(mismatch == 0, s"$mismatch vertices disagree with q185")
  }

  test("textrank: hand path-graph values exact after one iteration") {
    import spark.implicits._
    // alpha—beta—gamma: wdeg = 1, 2, 1; T = 1e12, n = 3
    val docs = Seq(Seq("alpha", "beta", "gamma")).toDF("w")
    val one = TextAnalysis.textrankScores(docs, "w", iters = 1)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val init = 1000000000000L / 3      // 333333333333
    val base = 150000000000L / 3       // 50000000000
    val prBeta = base + (85L * (2 * init)) / 100
    val prEnd = base + (85L * (init / 2)) / 100
    assert(one("beta") == prBeta, s"beta: ${one("beta")} != $prBeta")
    assert(one("alpha") == prEnd && one("gamma") == prEnd,
      s"ends: ${one("alpha")}, ${one("gamma")} != $prEnd")
  }

  test("textrank: mass conserved up to div truncation on the corpus") {
    val toks = Tables.documents(spark, sf)
      .select(filter(split(lower(col("text")), "\\s+"),
        t => length(t) >= 4).as("w"))
    val scores = TextAnalysis.textrankScores(toks, "w", iters = 3)
      .localCheckpoint()
    val nWords = scores.count()
    // sum(wdeg) = 2·Σ edge weights >= #directed edges — a valid (loose)
    // upper bound on the per-round truncating-div sites
    val nEdges = scores.agg(sum(col("wdeg"))).head().getLong(0)
    val total = scores.agg(sum(col("pr"))).head().getLong(0)
    val T = 1000000000000L
    // each round loses < 1 pico-unit per directed edge (contribution
    // div) and < 2 per word (damping div + base rounding); the init
    // split truncates < 1 per word once. 3 rounds.
    val slack = 3L * (nEdges + 2 * nWords) + nWords + 10
    assert(total <= T, s"mass exceeds T: $total")
    assert(total >= T - slack, s"mass leaked past the bound: $total " +
      s"(T - slack = ${T - slack})")
    // determinism: a second evaluation is bit-identical
    val again = TextAnalysis.textrankScores(toks, "w", iters = 3)
    assert(scores.select("w", "pr").except(again.select("w", "pr")).count() == 0)
  }

  test("rboGrid brackets: self-RBO = 1 - p^k, disjoint = 0") {
    import spark.implicits._
    val self = (1L to 10L).map(i => (i, i)).toDF("ra", "rb")
    val got = Retrieval.rboGrid(self, p = 0.9, maxDepth = 10)
      .orderBy(col("depth")).collect()
    got.foreach { r =>
      val d = r.getLong(0)
      assert(r.getLong(1) == d, s"self overlap at $d")
      assert(r.getDouble(2) == 1.0)
      val want = BigDecimal(1.0 - math.pow(0.9, d.toDouble))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(3) - want) <= 1e-6,
        s"self rbo at $d: ${r.getDouble(3)} != $want")
    }
    val disjoint = Seq((1L, 11L), (2L, 12L)).toDF("ra", "rb")
    Retrieval.rboGrid(disjoint, p = 0.9, maxDepth = 10).collect().foreach { r =>
      assert(r.getLong(1) == 0 && r.getDouble(3) == 0.0, s"disjoint: $r")
    }
  }
}
