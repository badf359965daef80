package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-16 pack, first batch: the composed SFT release gate. */
class Pipeline95Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q449: every stage fires; verdicts consistent; drops attributable") {
    val rows = q("q449_sft_release_gate").collect()
    assert(rows.nonEmpty)
    val stages = Set("malformed", "inverted_label", "injection",
      "canary_leak", "hidden_chars", "dup_dropped", "overflow_dropped",
      "low_yield", "mode_collapsed", "kept")
    val byStage = rows.groupBy(_.getString(4)).view.mapValues(_.length)
    stages.foreach(st =>
      assert(byStage.getOrElse(st, 0) > 0, s"stage $st never fired"))
    // exactly one manifest row per conversation; verdict keyed on stage
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(stages.contains(r.getString(4)))
      assert(r.getString(3) ==
        (if (r.getString(4) == "kept") "keep" else "drop"))
    }
    // drop attributability: each planted stage only fires on its
    // source slice (the same md5 slices the query derives)
    def srcSlice(src: String, mod: Int): Long =
      java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
          .substring(0, 2), 16) % mod
    rows.foreach { r =>
      val src = r.getString(1)
      r.getString(4) match {
        case "malformed"      => assert(srcSlice(src, 7) == 0L)
        case "inverted_label" => assert(srcSlice(src, 12) == 9L)
        case "injection"      => assert(srcSlice(src, 10) == 7L)
        case "canary_leak"    => assert(srcSlice(src, 8) == 2L)
        case "hidden_chars"   => assert(srcSlice(src, 13) == 11L)
        case _                => ()
      }
    }
    // mode-collapse only hits the templated shared pools (pool id
    // % 7 = 3), and leaves exactly one survivor per collapsed pool
    val collapsed = rows.filter(_.getString(4) == "mode_collapsed")
    assert(collapsed.nonEmpty)
    collapsed.foreach { r =>
      val p = r.getString(2)
      assert(p.startsWith("shared_p") &&
        p.stripPrefix("shared_p").toLong % 7 == 3, s"pool $p not templated")
    }
    // chain rescoping: a dup-dropped doc shares (prompt, stage-3 text)
    // with a SMALLER surviving or later-dropped id — spot-check that no
    // dup-dropped doc is the minimum id of its prompt pool
    val minByPrompt = rows.groupBy(_.getString(2))
      .map { case (p, rs) => p -> rs.map(_.getLong(0)).min }
    rows.filter(_.getString(4) == "dup_dropped").foreach { r =>
      assert(r.getLong(0) > minByPrompt(r.getString(2)),
        s"min-id ${r.getLong(0)} of pool ${r.getString(2)} dup-dropped")
    }
  }

  test("q450: stream == direct processBatch replay; novelty bounded") {
    // the QEntry drives the REAL foreachBatch stream
    val streamed = q("q450_stream_cdc_dedup").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(streamed.map(_._1).distinct.toSeq == Seq(0L, 1L, 2L),
      "expected exactly batches 0..2")
    streamed.foreach { case (_, src, n, bytes, nc, nb, bp) =>
      assert(nc <= n && nb <= bytes, s"$src novelty exceeds census")
      assert(bp == nb * 10000 / math.max(1L, bytes))
    }
    // direct replay: same seed, same three batch frames, no stream
    val base = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val draw = conv(substring(md5(col("doc_id").cast("string")),
      1, 4), 16, 10).cast("long")
    val seed = base.filter(col("doc_id") % 5 =!= 0)
    val wave = base.filter(col("doc_id") % 5 === 0)
      .join(base.select((col("doc_id") - 1L).as("doc_id"),
        col("text").as("prev_text")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(draw % 2 === 0 && col("prev_text").isNotNull,
          concat(lit("edited intro "), col("prev_text")))
          .otherwise(col("text")).as("text"))
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val gate = new graft.pipeline.Dedup.StreamingCdcDedup(
      seed, "text", 8, 16,
      onBatch = df => emitted.synchronized { emitted += df })
    for (b <- 0 until 3)
      gate.processBatch(wave.filter(expr(s"(doc_id div 5) % 3 = $b")), b.toLong)
    val direct = emitted.reduce(_ union _).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2))
    assert(direct.toSeq == streamed.toSeq, "stream != direct replay")
  }

  test("q451: curve monotone in τ; graded plant families live where expected") {
    val rows = q("q451_dedup_threshold_curve").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(5000L, 6000L, 7000L, 8000L, 9000L))
    // pairs / implied pairs / involved reps all non-increasing in τ
    rows.sliding(2).foreach { case Array(lo, hi) =>
      assert(lo._2 >= hi._2 && lo._3 >= hi._3 && lo._4 >= hi._4,
        s"curve not monotone: $lo -> $hi")
    }
    assert(rows.head._2 > rows.last._2,
      "loosening the threshold must find strictly more pairs on the graded plant")
    assert(rows.last._2 > 0, "light edits (J≈(n-1)/n) must survive τ=.9")
    // implied >= rep pairs (multiplicities only add)
    rows.foreach { case (_, np, imp, _) => assert(imp >= np) }
  }

  test("q452: verdict keys on co-occurrence; plants attributable") {
    val rows = q("q452_contact_block_census").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, em, ph, cb) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(cb <= math.min(em, ph) && em <= n && ph <= n)
      assert(r.getString(6) == (if (cb > 0) "pii_risk" else "clean"))
      if (r.getString(6) == "pii_risk") {
        // only the planted risky slice may carry contact blocks
        val s = java.lang.Long.parseLong(
          org.apache.commons.codec.digest.DigestUtils
            .md5Hex(r.getString(0)).substring(0, 2), 16) % 14
        assert(s == 6L, s"${r.getString(0)} flagged but not a risky source")
        // email-only and phone-only plants exceed the co-occurrence mass
        assert(em > cb && ph > cb)
      }
    }
    assert(rows.exists(_.getString(6) == "pii_risk"), "plant never fired")
  }

  // VERDICT r16 item 2: the q450 state made production-shaped — tiered
  // compaction bounds plan leaves; the parquet stateDir arm is a single
  // scan leaf, restart-safe, idempotent under at-least-once replay, and
  // compactable offline. Differential: three state configurations must
  // emit IDENTICAL per-batch frames over a 12-micro-batch run.
  test("StreamingCdcDedup: tiered/parquet state arms agree over 12 batches; leaves bounded; restart + compaction + replay") {
    import graft.pipeline.Dedup.StreamingCdcDedup
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    val seed = docs.filter(col("doc_id") % 13 === 0)
    val arrivals = docs.filter(col("doc_id") % 13 =!= 0)
    def batchOf(b: Int) = arrivals.filter(col("doc_id") % 12 === b)

    def collectEmit(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .sortBy(t => (t._1, t._2)).toSeq

    val outA = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Long, Long, Long, Long)]]
    val gateA = new StreamingCdcDedup(seed, "text", 8, 16,
      onBatch = df => outA += collectEmit(df), compactK = 3)
    val outB = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Long, Long, Long, Long)]]
    val gateB = new StreamingCdcDedup(seed, "text", 8, 16,
      onBatch = df => outB += collectEmit(df), compactK = 64)
    val dir = Scratch.dir(spark, "cdc_state_spec")
    val outC = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Long, Long, Long, Long)]]
    val gateC = new StreamingCdcDedup(seed, "text", 8, 16,
      onBatch = df => outC += collectEmit(df), stateDir = Some(dir))
    for (b <- 0 until 12) {
      gateA.processBatch(batchOf(b), b.toLong)
      gateB.processBatch(batchOf(b), b.toLong)
      gateC.processBatch(batchOf(b), b.toLong)
    }
    assert(outA.toSeq == outB.toSeq,
      "compactK=3 arm diverged from compactK=64 arm")
    assert(outA.toSeq == outC.toSeq,
      "parquet stateDir arm diverged from in-memory arm")
    assert(outA.exists(_.exists(_._5 > 0)), "no batch ever saw novelty")
    // leaf bounds: force-merge cap is ABSOLUTE; tiering alone is
    // logarithmic (12 batches + seed -> <= ~log2(13)+2 tiers); parquet
    // is a single scan leaf by construction
    assert(gateA.stateLeaves <= 3, s"compactK=3 arm at ${gateA.stateLeaves} leaves")
    assert(gateB.stateLeaves <= 6,
      s"tiered merge did not bound leaves: ${gateB.stateLeaves} after 12 batches")
    assert(gateC.stateLeaves == 1)

    // restart: a NEW instance over the existing stateDir must resume
    // (no re-seed; prior digests judge novelty) — replaying batch 0's
    // docs as batch 12 yields ZERO novel chunks
    val outD = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Long, Long, Long, Long)]]
    val gateD = new StreamingCdcDedup(seed, "text", 8, 16,
      onBatch = df => outD += collectEmit(df), stateDir = Some(dir))
    gateD.processBatch(batchOf(0), 12L)
    assert(outD.head.forall(_._5 == 0L),
      s"restarted instance lost state: ${outD.head.filter(_._5 > 0)}")

    // at-least-once replay: re-processing batch 5 (overwrite of its own
    // partition) leaves the distinct state unchanged
    val before = spark.read.parquet(dir).select(col("h")).distinct().count()
    gateD.processBatch(batchOf(5), 5L)
    val after = spark.read.parquet(dir).select(col("h")).distinct().count()
    assert(before == after, s"replay mutated state: $before -> $after")

    // offline compaction: partitions fold to one generation; novelty
    // behavior is unchanged afterwards
    gateD.compactState()
    val parts = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir)).iterator()
    var n = 0
    while (parts.hasNext) { if (parts.next().getFileName.toString
      .startsWith("batch_id=")) n += 1 }
    assert(n == 1, s"compaction left $n partitions")
    assert(spark.read.parquet(dir).select(col("h")).distinct().count() == after,
      "compaction changed the digest set")
    val outE = scala.collection.mutable.ArrayBuffer.empty[Seq[(Long, String, Long, Long, Long, Long, Long)]]
    val gateE = new StreamingCdcDedup(seed, "text", 8, 16,
      onBatch = df => outE += collectEmit(df), stateDir = Some(dir))
    gateE.processBatch(batchOf(3), 13L)
    assert(outE.head.forall(_._5 == 0L), "novelty leaked after compaction")
  }
}
