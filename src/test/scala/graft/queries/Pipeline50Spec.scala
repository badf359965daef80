package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 pack, fourteenth batch: dHash recall on the planted
  * brightness shifts and the banding guarantee's accounting.
  */
class Pipeline50Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q328: every planted brightness-shifted copy is recovered near its original") {
    val rows = q("q328_phash_neardup").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    val found = rows.filter { case (a, b, _) => b == a + 10000000L }
    assert(found.map(_._1).toSet == planted,
      "every planted pair must surface (dHash survives the +3 shift)")
    // brightness shift flips a bit only at luminance saturation: the
    // planted pairs sit at tiny Hamming distances
    found.foreach { case (a, _, h) =>
      assert(h <= 3, s"planted pair of $a at hamming $h")
    }
    // and every reported pair respects the verify threshold
    rows.foreach { case (_, _, h) => assert(h >= 0 && h <= 6) }
  }
}
