package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, sixteenth batch: RAG chunk planner, quantized recall.
  */
class Pipeline68Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def panelHash(id: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(id.toString.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("q368: closed-form chunk geometry matches a driver recompute") {
    val rows = q("q368_rag_chunk_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(rows.map(_._1).toSeq == Seq(64L, 128L, 256L))
    val toks = graft.queries.Tables.documents(spark, sf)
      .select(size(split(lower(col("text")), "\\s+")).cast("long"))
      .collect().map(_.getLong(0))
    rows.foreach { case (cs, ov, nDocs, corpusTok, chunks, dup, pad, util) =>
      assert(ov == cs / 8)
      assert(nDocs == toks.length && corpusTok == toks.sum)
      val expChunks = toks.map { t =>
        if (t <= cs) 1L else 1L + (t - cs + (cs - ov) - 1) / (cs - ov)
      }
      assert(chunks == expChunks.sum)
      assert(dup == (chunks - nDocs) * ov,
        "every chunk after a doc's first duplicates ov tokens")
      val expPad = toks.zip(expChunks).map { case (t, n) =>
        cs - (t - (n - 1) * (cs - ov))
      }.sum
      assert(pad == expPad)
      assert(util == corpusTok * 10000L / (chunks * cs))
      assert(util <= 10000L)
    }
  }

  test("q369: recall bounds and a full driver replay of one probe") {
    val rows = q("q369_quantized_recall").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, recall, top1) =>
      assert(recall >= 0L && recall <= 10000L && recall % 1000L == 0L)
      if (top1) assert(recall >= 1000L)
    }
    // driver replay for the smallest probe id
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray
          .map(v => math.round(v.toDouble * 10000.0))))
    val stride = math.max(1L, emb.length / 30L)
    val dims = emb.head._2.indices
    val mins = dims.map(i => emb.map(_._2(i)).min).toArray
    val rgs = dims.map(i =>
      math.max(1L, emb.map(_._2(i)).max - mins(i))).toArray
    def deq(v: Array[Long]): Array[Long] =
      dims.map(i => mins(i) +
        ((v(i) - mins(i)) * 255 / rgs(i)) * rgs(i) / 255).toArray
    val probeId = rows.map(_._1).min
    def top10(qv: Array[Long], f: Array[Long] => Array[Long]) = {
      emb.filter(e => panelHash(e._1) % stride != 0).map { case (id, v) =>
        val cv = f(v)
        val dot = qv.zip(cv).map { case (a, b) => a.toDouble * b }.sum
        val na = math.sqrt(qv.map(x => x.toDouble * x).sum)
        val nb = math.sqrt(cv.map(x => x.toDouble * x).sum)
        (id, dot / (na * nb))
      }.sortBy { case (id, c) => (-c, id) }.take(10).map(_._1).toSet
    }
    val qv = emb.find(_._1 == probeId).get._2
    val exact = top10(qv, identity)
    val coarse = top10(deq(qv), deq)
    val expected = (exact intersect coarse).size.toLong * 1000L
    assert(rows.find(_._1 == probeId).get._2 == expected,
      s"probe $probeId recall")
  }
}
