package graft.queries

import graft.SparkSpec

/** Round-14 pack, second batch: release health + IVF-routed MaxSim. */
class Pipeline75Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def sev(source: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(source.getBytes("UTF-8"))
      .map(x => f"$x%02x").mkString
    (Integer.parseInt(hex.substring(0, 2), 16) % 3)
  }

  test("q382: verdicts track the planted per-source severity") {
    val rows = q("q382_release_health").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val src = r.getString(0)
      val verdict = r.getString(9)
      assert(Set("ok", "warn", "alert").contains(verdict))
      sev(src) match {
        case 0 => assert(verdict != "alert",
          s"$src is clean (sev 0) but alerted")
        case 1 => assert(verdict != "ok",
          s"$src has a doubled-text delta (sev 1) but read ok")
        case 2 => assert(verdict == "alert",
          s"$src has a tripled-text + re-embedded delta (sev 2): $verdict")
      }
      // release B is a superset of A; every source gained its delta
      assert(r.getLong(2) > r.getLong(1), s"$src rows_b <= rows_a")
      assert(r.getLong(3) > 0L, s"$src delta must change buckets")
      // Gibbs: KL >= 0 up to micro rounding
      assert(r.getLong(6) >= -2L, s"$src negative KL")
      assert(r.getLong(7) >= 0L, s"$src negative MMD^2")
    }
  }

  test("q383: candidate path recall against its own brute-force panel") {
    val rows = q("q383_maxsim_ivf_rerank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val n = graft.queries.Tables.embeddings(spark, sf).count()
    rows.foreach { case (qid, nc, hits, bp) =>
      assert(hits >= 0L && hits <= 5L)
      assert(bp == hits * 10000L / 5L)
      assert(nc >= 1L, s"probe $qid routed to an empty candidate set")
      // the scale path: candidates stay a strict subset of the corpus
      assert(nc < n, s"probe $qid candidates not sub-corpus")
    }
    // panel-pinned floors (measured 6384 bp at sf0.001 / 7153 at
    // sf0.01 with ~41% mean candidate mass): routing must beat the
    // random-candidate baseline at equal cost, with margin
    val meanRecall = rows.map(_._4).sum / rows.length
    val meanFrac = rows.map(_._2).sum.toDouble / (rows.length * n)
    assert(meanRecall >= 5000L,
      s"mean recall@5 $meanRecall bp under the 5000 bp floor")
    assert(meanFrac <= 0.6,
      s"mean candidate fraction $meanFrac — rerank is no longer sub-corpus")
  }
}
