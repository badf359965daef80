package graft.queries

import graft.SparkSpec

/** Round-13 pack, fourth batch: shot segmentation recovers the planted
  * cut structure exactly.
  */
class Pipeline56Spec extends SparkSpec {

  test("q339: every media segments into its three planted shots at the planted cuts") {
    val rows = graft.SparkEntry.queries("q339_shot_segmentation")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue, r.getAs[Number](3).longValue,
        r.getLong(4), r.getAs[Number](5).longValue))
    val nMedia = Tables.documents(spark, sf).count()
    assert(rows.length == nMedia * 3, "three shots per media")
    rows.groupBy(_._1).foreach { case (m, shots) =>
      val s = shots.sortBy(_._2)
      assert(s.map(_._2) sameElements Array(0L, 1L, 2L))
      val (c1, c2) = (3 + m % 5, 9 + m % 4)
      // segments tile [0, 15] and break exactly at the planted cuts
      assert(s(0)._3 == 0L && s(0)._4 == c1 - 1)
      assert(s(1)._3 == c1 && s(1)._4 == c2 - 1)
      assert(s(2)._3 == c2 && s(2)._4 == 15L)
      s.foreach { t =>
        assert(t._5 == t._4 - t._3 + 1) // n_frames consistent
        assert(t._6 == t._3) // keyframe = first frame
      }
    }
  }
}
