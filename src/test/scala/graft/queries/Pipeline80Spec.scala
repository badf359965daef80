package graft.queries

import graft.SparkSpec

/** Round-15 pack, first batch: the collapse-first detector-disagreement
  * cell census (q394, the production arm of q387).
  */
class Pipeline80Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q394: cell invariants — flags, evidence geometry, implied-pair expansion") {
    val rows = q("q394_detector_disagreement_cells").collect()
    assert(rows.nonEmpty)
    val flags = rows.map(_.getString(0)).toSet
    // the planted mild/strong edits put mass in every disagreement class
    assert(flags == Set("both", "minhash_only", "simhash_only"))
    rows.foreach { r =>
      val (flag, jBand, hamming) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      val (nRep, implied) = (r.getLong(3), r.getLong(4))
      assert(jBand >= 0L && jBand <= 20L, s"j_band $jBand out of range")
      assert(hamming >= 0L && hamming <= 32L)
      assert(nRep >= 1L)
      // every rep pair expands to >= 1 raw pair; dup groups to more
      assert(implied >= nRep, s"cell ($flag,$jBand,$hamming): " +
        s"implied $implied < n_rep_pairs $nRep")
      flag match {
        // both: passed the 4/5 Jaccard verify AND Hamming <= 3
        case "both" => assert(jBand >= 16L && hamming <= 3L)
        // minhash_only: Jaccard passed; the 4x8-bit bands GUARANTEE
        // recall at Hamming <= 3 (3 flips cannot hit all 4 bands), so
        // absent cap events the signature distance must exceed 3
        case "minhash_only" => assert(jBand >= 16L && hamming > 3L)
        // simhash_only: within Hamming 3; Jaccard is usually below the
        // 4/5 bar, but can sit above it when the pair escaped all 4
        // MinHash bands (LSH recall at J ~= 0.8 is ~0.88, not 1 — the
        // calibration gap this census exists to surface)
        case "simhash_only" => assert(hamming <= 3L)
      }
    }
    // the exact-dup plants (every 8th/16th doc) must make the collapse
    // visible: at least one cell carries more raw mass than rep pairs
    assert(rows.exists(r => r.getLong(4) > r.getLong(3)),
      "no cell shows implied_pairs > n_rep_pairs — collapse not exercised")
  }

  test("q395: true stream == direct processBatch replay; gate structure") {
    import org.apache.spark.sql.functions._
    val streamed = q("q395_stream_release_gate").collect()
    // direct replay: same state machine, batches fed by hand in order
    val base = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
      .localCheckpoint()
    val bench = base.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h")).distinct().localCheckpoint()
    val seed = base.filter(col("doc_id") % 7 =!= 0)
    val seedSurv = graft.pipeline.ReleaseGate.scored(seed)
      .filter(col("score_bp") >= 500L)
      .withColumn("h", md5(col("text")))
      .join(broadcast(bench), Seq("h"), "left_anti")
      .select(col("doc_id"), col("source"), col("text"))
    val seedDigests = seed.select(md5(col("text")).as("h")).distinct()
    val wave = base.filter(col("doc_id") % 7 === 0)
      .join(base.select((col("doc_id") + 1L).as("doc_id"),
        col("text").as("prev_text")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 21 === 0 && col("prev_text").isNotNull,
          col("prev_text")).otherwise(col("text")).as("text"))
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val gate = new graft.pipeline.ReleaseGate.StreamingReleaseGate(
      seedSurv, seedDigests, bench,
      onManifest = df => emitted += df)
    for (b <- 0 until 3)
      gate.processBatch(wave.filter(expr(s"(doc_id div 7) % 3 = $b")), b)
    val direct = emitted.reduce(_ union _).orderBy(col("doc_id")).collect()
    assert(streamed.map(_.toString).toSeq == direct.map(_.toString).toSeq,
      "Structured Streaming emission differs from the direct replay")
    // structure: the re-upload plants drop as duplicates; roots/alloc
    // ride only on kept rows; batch ids partition the wave
    val byStage = streamed.groupBy(_.getString(3)).view.mapValues(_.length)
    assert(byStage.getOrElse("duplicate", 0) > 0, "no re-upload caught")
    assert(byStage.getOrElse("kept", 0) > 0)
    streamed.foreach { r =>
      val kept = r.getString(3) == "kept"
      assert(r.getString(2) == (if (kept) "keep" else "drop"))
      assert(kept == !r.isNullAt(5) && kept == !r.isNullAt(7),
        "alloc/root must ride exactly on kept rows")
      assert(r.getLong(8) == (r.getLong(0) / 7) % 3, "batch id mismatch")
    }
    // state monotonicity: a source's root changes only when the batch
    // keeps one of its docs; allocs are per (batch, source) constants
    val perBatchSrc = streamed.filter(_.getString(3) == "kept")
      .groupBy(r => (r.getLong(8), r.getString(1)))
    perBatchSrc.foreach { case (_, rs) =>
      assert(rs.map(_.getLong(5)).distinct.length == 1)
      assert(rs.map(_.getString(7)).distinct.length == 1)
    }
  }

  test("q396: the rotting source is the UNIQUE trend alert; the blip pages once, never escalates") {
    import org.apache.spark.sql.functions._
    val rows = q("q396_release_trend_monitor").collect()
    val srcs = graft.queries.Tables.documents(spark, sf)
      .select(col("source")).distinct()
    assert(rows.length == srcs.count() * 5)
    // md5-rank: rn=1 rots, rn=2 blips — recompute independently
    val ranked = srcs
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(md5(col("source")), col("source"))))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val rot = ranked.find(_._2 == 1).get._1
    val blip = ranked.find(_._2 == 2).get._1
    val verdictBySrc = rows.map(r => r.getString(0) -> r.getString(6))
      .distinct.toMap
    assert(verdictBySrc.size == ranked.size, "verdict must be per-source constant")
    assert(verdictBySrc(rot) == "trend_alert",
      s"rot source $rot must trend-alert")
    assert(verdictBySrc(blip) == "step_warn",
      s"blip source $blip must step-warn, not escalate")
    verdictBySrc.foreach { case (src, v) =>
      if (src != rot && src != blip)
        assert(v == "ok", s"stable source $src flagged $v")
    }
    // the rot never crosses the single-step threshold — the whole
    // point: only the accumulated statistic pages
    val rotSteps = rows.filter(_.getString(0) == rot).map(_.getLong(4))
    assert(rotSteps.max <= 60L,
      s"rot step ${rotSteps.max} pm crossed the naive threshold — the " +
        "fixture no longer demonstrates slow rot")
    // the blip's cusum resets after recovery (release 3 back near 0)
    val blipCusum = rows.filter(r => r.getString(0) == blip)
      .sortBy(_.getLong(1)).map(_.getLong(5))
    assert(blipCusum.last <= 20L, "blip cusum failed to reset")
  }
}
