package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, seventeenth batch: MaxSim, seasonal residuals,
  * cohort retention.
  */
class Pipeline69Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def panelHash(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q370: ranking shape, score bound, one-probe driver replay") {
    val rows = q("q370_maxsim_late_interaction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val s = g.sortBy(_._2)
      assert(s.map(_._2).toSeq == (1L to s.length))
      s.sliding(2).foreach { case Array(a, b) => assert(a._4 >= b._4) }
    }
    // 4 slices, each cos ≤ 1 (+½ rounding): maxsim ≤ 4e6 + 2
    rows.foreach(t => assert(t._4 <= 4000002L))

    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray
          .map(x => math.round(x.toDouble * 10000.0))))
    val stride = math.max(1L, emb.length / 30L)
    val probeId = rows.map(_._1).min
    val qv = emb.find(_._1 == probeId).get._2
    def sub(v: Array[Long], i: Int) = v.slice(i * 16, i * 16 + 16)
    def cosMicro(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      math.round(dot / (na * nb) * 1e6)
    }
    val scored = emb.filter(e => panelHash(e._1) % stride != 0).map { case (id, v) =>
      val ms = (0 until 4).map { i =>
        (0 until 4).map(j => cosMicro(sub(qv, i), sub(v, j))).max
      }.map(BigInt(_)).sum
      (id, ms.toLong)
    }.sortBy { case (id, m) => (-m, id) }.take(5)
    val got = rows.filter(_._1 == probeId).sortBy(_._2)
      .map(t => (t._3, t._4))
    assert(got.toSeq == scored.toSeq, s"probe $probeId MaxSim ranking")
  }

  test("q371: residual identities and per-type MAPE recompute") {
    val rows = q("q371_seasonal_residuals").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.nonEmpty)
    rows.foreach { t =>
      assert(t._5 == t._3 - t._4)
      assert(t._6 == math.abs(t._5) * 10000L / math.max(1L, t._4))
    }
    rows.groupBy(_._1).foreach { case (_, g) =>
      val mape = g.map(_._6).sum / g.length
      assert(g.forall(_._7 == mape))
      assert(g.forall(_._8 == g.length))
    }
  }

  test("q372: triangle invariants and user accounting") {
    val rows = q("q372_cohort_retention").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    rows.filter(_._2 == 0L).foreach(t => assert(t._5 == 10000L))
    rows.foreach { t =>
      assert(t._3 <= t._4, "active users are a subset of the cohort")
      assert(t._5 >= 0L && t._5 <= 10000L)
    }
    val users = graft.queries.Tables.events(spark, sf)
      .agg(countDistinct(col("user_id"))).collect()(0).getLong(0)
    assert(rows.filter(_._2 == 0L).map(_._4).sum == users,
      "cohort sizes tile the user base")
  }
}
