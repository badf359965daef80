package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 pack, fourteenth batch (rebuilt round 13): dHash recall on
  * the planted brightness shifts under the collapsed contract, the
  * planted 4-way duplicate-image groups, and the incremental arm's
  * emission accounting.
  */
class Pipeline50Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def rows(name: String) = q(name).collect()
    .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)))

  test("q328: planted shifted copies surface (near at small hamming, or collapse to dup)") {
    val out = rows("q328_phash_neardup")
    val planted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted.nonEmpty)
    // every planted copy id appears in the output: as a near rep pair
    // with its original (hamming 1..3 — +40 flips bits only at
    // saturation, and the fixture's flips stay within the 4-band ≤3
    // guarantee) or as a dup member when no luminance saturated (fp
    // unchanged → collapsed)
    val asNear = out.filter { case (k, _, b, _, _) =>
      k == "near" && b >= 10000000L && b < 20000000L }.map(_._3).toSet
    val asDup = out.filter { case (k, _, b, _, _) =>
      k == "dup" && b >= 10000000L && b < 20000000L }.map(_._3).toSet
    assert(asNear ++ asDup == planted.map(_ + 10000000L),
      "every planted shifted copy must surface as near or dup")
    out.filter { case (k, a, b, _, _) =>
      k == "near" && b >= 10000000L && b < 20000000L && a == b - 10000000L }
      .foreach { case (_, a, _, h, _) =>
        assert(h >= 1 && h <= 3, s"planted near pair of $a at hamming $h") }
    // both arms are really exercised by the fixture
    assert(asNear.nonEmpty, "some planted copies must survive as near pairs")
    assert(asDup.nonEmpty, "some planted copies must collapse to dup")
    // collapsed contract: near pairs never sit at hamming 0 (equal
    // fingerprints collapse), dup edges always do
    out.foreach {
      case ("near", _, _, h, imp) =>
        assert(h >= 1 && h <= 6); assert(imp >= 1L)
      case ("dup", a, b, h, imp) =>
        assert(h == 0L && imp == 1L && a < b)
      case other => fail(s"unexpected kind in $other")
    }
  }

  test("q328: planted 4-way identical groups come back as dup edges, never near pairs") {
    val out = rows("q328_phash_neardup")
    val planted25 = Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(planted25.nonEmpty)
    val dupB = out.filter(_._1 == "dup").map(_._3).toSet
    for (id <- planted25; off <- Seq(20000000L, 30000000L, 40000000L))
      assert(dupB.contains(id + off),
        s"identical copy ${id + off} must be a dup member")
    // identical copies never band-join: no near pair touches them
    val nearIds = out.filter(_._1 == "near")
      .flatMap(p => Seq(p._2, p._3)).toSet
    assert(!nearIds.exists(_ >= 20000000L),
      "byte-identical copies must collapse before banding")
  }

  test("q331: incremental emissions = batch q328 minus corpus-internal structure") {
    val batch = rows("q328_phash_neardup")
    val inc = rows("q331_phash_incremental")
    // seed = ids < 10M: q331 must emit exactly the batch rows that
    // touch an arrival (id >= 10M), on (kind, a, b, hamming) — the
    // implied_pairs differ by design (as-of-batch vs final counts)
    val key = (t: (String, Long, Long, Long, Long)) => (t._1, t._2, t._3, t._4)
    val expected = batch.filter(t => t._2 >= 10000000L || t._3 >= 10000000L)
      .map(key).toSet
    assert(inc.map(key).toSet == expected)
    // and nothing corpus-internal leaked
    assert(inc.forall(t => t._2 >= 10000000L || t._3 >= 10000000L))
    // as-of-batch implied never exceeds the batch-final implied
    val finalImp = batch.map(t => key(t) -> t._5).toMap
    inc.foreach(t => assert(t._5 >= 1L && t._5 <= finalImp(key(t))))
  }
}
