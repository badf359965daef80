package graft.operators

import graft.SparkSpec

/** Integer-exact PageRank: hand-computed tiny graph, sink/hub ordering,
  * determinism, self-edge and duplicate-edge hygiene. */
class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private val S = 1000000000000L

  test("one iteration on a hand-computed 3-node chain") {
    // 1 -> 2, 1 -> 3, 2 -> 3. N=3, pr0 = S/3 each, base = 15S/300.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L, 3L).toDF("id")
    val got = PageRank.run(edges, nodes, iters = 1)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val p0 = S / 3
    val base = S * 15 / 300
    val c12 = p0 * 85 / 200 // node 1 has outdeg 2
    val c23 = p0 * 85 / 100 // node 2 has outdeg 1
    assert(got == Seq(
      (1L, base),             // no in-edges: damping base only
      (2L, base + c12),
      (3L, base + c12 + c23)))
  }

  test("self-edges and duplicate edges are ignored; result deterministic") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 2L), (2L, 1L)).toDF("src", "dst")
    val nodes = Seq(1L, 2L).toDF("id")
    val a = PageRank.run(edges, nodes, iters = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    val b = PageRank.run(edges, nodes, iters = 3)
      .orderBy("id").as[(Long, Long)].collect().toSeq
    assert(a == b)
    // after de-dup/self-drop the graph is the symmetric 1<->2: equal ranks
    assert(a(0)._2 == a(1)._2)
  }

  test("a node every page links to outranks the periphery") {
    val nodes = (0L to 20L).toDF("id")
    val edges = (1L to 20L).map(i => (i, 0L)) // star into 0
      .toDF("src", "dst")
    val pr = PageRank.run(edges, nodes, iters = 2)
      .orderBy("id").as[(Long, Long)].collect().toMap
    assert(pr(0L) > pr(1L) * 10, s"hub not dominant: $pr")
  }
}
