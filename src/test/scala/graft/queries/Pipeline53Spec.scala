package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, first batch: the end-to-end linkage chain's cluster
  * invariants and planted recall.
  */
class Pipeline53Spec extends SparkSpec {

  test("q332: cluster invariants + planted typo recall") {
    val rows = graft.SparkEntry.queries("q332_linkage_pipeline")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    // each linked record appears once; canonical = min of its cluster;
    // cluster_size matches the actual census; every cluster is
    // bipartite-connected so it holds >=1 clean and >=1 dirty record
    assert(rows.map(_._1).distinct.length == rows.length)
    val byComp = rows.groupBy(_._2)
    byComp.foreach { case (canon, members) =>
      assert(members.map(_._1).min == canon, s"canonical $canon not min")
      assert(members.forall(_._3 == members.length), s"size mismatch at $canon")
      assert(members.length >= 2)
      assert(members.exists(_._1 < 10000000L) &&
        members.exists(_._1 >= 10000000L), s"cluster $canon not bipartite")
    }
    // planted recall at the AUTO-LINK threshold: every dirty record
    // that auto-linked sits in the same cluster as its base (directly,
    // or through same-name parts — either way the cluster is right)
    val compOf = rows.map(t => t._1 -> t._2).toMap
    val autoLinked = rows.map(_._1).filter(_ >= 10000000L)
    assert(autoLinked.nonEmpty)
    autoLinked.foreach { b =>
      assert(compOf.get(b - 10000000L).contains(compOf(b)),
        s"dirty $b linked away from its base") }
  }

  test("q336: three-way decision bands cover the planted typos") {
    val bands = graft.SparkEntry.queries("q336_linkage_bands")(spark, sf)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    val dirtyN = Tables.part(spark, sf)
      .filter(col("p_partkey") % 100 === 0).count()
    // ratio ranges respect the band cuts
    bands.get("match").foreach { case (_, _, mn, _) => assert(mn >= 100L) }
    bands.get("possible").foreach { case (_, _, mn, mx) =>
      assert(mn >= 1L && mx < 100L) }
    bands.get("non_match").foreach { case (_, _, _, mx) => assert(mx < 1L) }
    // nearly every dirty record is REACHABLE (match or possible) —
    // the two-pass blocking guarantee: one deletion breaks at most
    // one of the two key words
    val reachable = bands.get("match").map(_._2).getOrElse(0L) +
      bands.get("possible").map(_._2).getOrElse(0L)
    assert(reachable * 10 >= dirtyN * 9,
      s"only $reachable/$dirtyN dirty records reachable")
  }
}
