package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, thirteenth batch: embedding decontamination,
  * burstiness, Heaps law.
  */
class Pipeline65Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def panelHash(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q359: Cauchy-Schwarz bound, hit consistency, brute-force probe") {
    val rows = q("q359_embedding_decontamination").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val stride = math.max(1L, emb.length / 30L)
    val corpusN = emb.count(e => panelHash(e._1) % stride != 0).toLong
    rows.foreach { case (_, nScored, nHits, _, topCos2) =>
      assert(nScored == corpusN)
      assert(topCos2 <= 1000000L, "cos^2 must respect Cauchy-Schwarz")
      assert(nHits >= 0L && nHits <= nScored)
      if (topCos2 >= 998001L) assert(nHits >= 1L)
      else assert(nHits == 0L)
    }
    // brute-force one probe end to end
    val probeId = rows.map(_._1).min
    val qe = emb.find(_._1 == probeId).get._2
      .map(v => math.round(v.toDouble * 10000.0))
    var hits = 0L; var best = (Long.MinValue, Long.MaxValue)
    emb.filter(e => panelHash(e._1) % stride != 0).foreach { case (id, ve) =>
      val ce = ve.map(v => math.round(v.toDouble * 10000.0))
      val dot = BigInt(qe.zip(ce).map { case (a, b) =>
        BigInt(a) * BigInt(b) }.sum.toString)
      val na = qe.map(x => BigInt(x) * BigInt(x)).sum
      val nb = ce.map(x => BigInt(x) * BigInt(x)).sum
      val mag = (dot * dot * BigInt(1000000)) / (na * nb)
      val s = (if (dot >= 0) mag else -mag).toLong
      if (dot > 0 && dot * dot * 1000000 >= BigInt(998001) * na * nb)
        hits += 1
      if (s > best._1 || (s == best._1 && id < best._2)) best = (s, id)
    }
    val row = rows.find(_._1 == probeId).get
    assert(row._3 == hits, s"probe $probeId hits ${row._3} vs $hits")
    assert(row._4 == best._2 && row._5 == best._1)
  }

  test("q360: gap accounting and a BigInt VMR recompute") {
    val rows = q("q360_burstiness").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nUsers, nGaps, mean, vmr) =>
      assert(nUsers > 0L && nGaps >= nUsers)
      assert(mean >= 0L && vmr >= 0L)
    }
    // total gaps = sum over users of (n_events - 1)
    val perUser = graft.queries.Tables.events(spark, sf)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1))
    assert(rows.map(_._3).sum == perUser.filter(_ >= 2).map(_ - 1).sum)
  }

  test("q361: monotone growth, terminal vocab, exact beta recompute") {
    val rows = q("q361_heaps_law").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.length == 8)
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a._2 <= b._2 && a._3 <= b._3 && a._4 <= b._4)
    }
    val totalVocab = graft.queries.Tables.documents(spark, sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .agg(countDistinct(col("w"))).collect()(0).getLong(0)
    assert(rows.last._4 == totalVocab)
    val beta = rows.head._5
    assert(rows.forall(_._5 == beta))
    // Heaps growth is sublinear; the sf0.001 fixture's vocabulary
    // saturates inside the first checkpoint, so beta may be exactly 0
    assert(beta >= 0L && beta < 1200000L, s"implausible beta $beta")
    // exact integer regression replay
    val pts = rows.map(t => (
      BigInt(math.round(math.log(t._3.toDouble) * 1e6)),
      BigInt(math.round(math.log(t._4.toDouble) * 1e6))))
    val m = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val expected = (m * sxy - sx * sy) * BigInt(1000000) /
      (m * sxx - sx * sx)
    assert(beta == expected.toLong, s"beta $beta vs $expected")
  }
}
