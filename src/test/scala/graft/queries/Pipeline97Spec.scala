package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 session-2 pack: the composed pretraining-corpus release
  * gate (q456), the gate-regression diff (q457), and the streaming
  * ingest gate (q458). */
class Pipeline97Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private val qualityStages = Set("quality_len", "quality_word_len",
    "quality_stopword", "quality_repetition")
  private val allStages = qualityStages ++ Set("non_english", "exact_dup",
    "near_dup", "eval_contaminated", "contact_block", "eval_holdout",
    "kept")

  test("q456: one row per doc, verdict keyed on stage, plants behave") {
    val rows = q("q456_pretraining_release_gate").collect()
    assert(rows.nonEmpty)
    // exactly one manifest row per corpus doc, stage from the known set
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(allStages.contains(r.getString(3)), r.toString)
      val expected = r.getString(3) match {
        case "kept" => "keep"
        case "eval_holdout" => "hold"
        case _ => "drop"
      }
      assert(r.getString(2) == expected, r.toString)
      assert(r.getLong(4) > 0, s"empty token ledger: $r")
    }
    // eval membership is exactly the holdout slice
    rows.foreach { r =>
      val isEval = r.getLong(0) % 41 == 3 && r.getLong(0) < 10000000L
      assert((r.getString(3) == "eval_holdout") == isEval, r.toString)
    }
    // every non-holdout stage fires on the fixture
    val byStage = rows.groupBy(_.getString(3)).view.mapValues(_.length)
    (allStages - "quality_word_len" - "quality_stopword").foreach(st =>
      assert(byStage.getOrElse(st, 0) > 0, s"stage $st never fired"))
    // exact plants: identical text => identical stateless verdicts, so
    // a mirror_exact doc either fails lang/quality WITH its seed or is
    // convicted at the exact stage — it can never reach stage 4+
    rows.filter(_.getString(1) == "mirror_exact").foreach(r =>
      assert(r.getString(3) == "exact_dup" ||
        r.getString(3) == "non_english" ||
        qualityStages.contains(r.getString(3)),
        s"exact re-publication leaked past the digest stage: $r"))
    // near families: at most ONE member of {seed, 3 replicas} survives
    // past the near-dup stage (min-id-keep collapses the family)
    val survivors = rows.filter(r => Set("kept", "eval_contaminated",
      "contact_block").contains(r.getString(3)))
      .map(_.getLong(0)).toSet
    val nearFamilies = rows.filter(_.getString(1) == "mirror_near")
      .map(r => (r.getLong(0) - 40000000L) / 1000L).distinct
    nearFamilies.foreach { seed =>
      val fam = Seq(seed) ++ (1 to 3).map(i => seed * 1000L + i + 40000000L)
      assert(fam.count(survivors.contains) <= 1,
        s"near-dup family of seed $seed not collapsed")
    }
    // crawl mirrors: any mirror that survives lang+quality+dedup holds
    // every 6-gram of its (>= 8-token, via the >= 10-token quality
    // floor) eval source, so it MUST fall to contamination — a kept or
    // contact_block crawl mirror is a decontamination hole
    rows.filter(_.getString(1) == "crawl_mirror").foreach(r =>
      assert(r.getString(3) != "kept" && r.getString(3) != "contact_block",
        s"eval mirror leaked through decontamination: $r"))
  }

  test("q457: all three flip kinds fire; A-side agrees with the shipped q456 gate") {
    val diff = q("q457_gate_regression_diff").collect()
    assert(diff.nonEmpty)
    val kinds = diff.map(_.getString(4)).toSet
    assert(kinds == Set("tightened", "loosened", "reclassified"),
      s"flip kinds on the fixture: $kinds")
    // a diff row never shows the same stage twice, and flip is keyed
    // on the verdict transition implied by the stages
    diff.foreach(r => assert(r.getString(2) != r.getString(3), r.toString))
    diff.filter(_.getString(4) == "loosened").foreach(r =>
      assert(r.getString(3) == "kept" && r.getString(2) != "kept", r.toString))
    diff.filter(_.getString(4) == "tightened").foreach(r =>
      assert(r.getString(2) == "kept" && r.getString(3) != "kept", r.toString))
    // run A IS the shipped gate: every flipped doc's stage_a matches
    // the q456 manifest (knob drift between the two entries fails here)
    val manifest = q("q456_pretraining_release_gate").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    diff.foreach(r => assert(manifest(r.getLong(0)) == r.getString(2),
      s"stage_a diverges from the shipped gate: $r"))
    // holdout docs never flip (they are outside both chains)
    diff.foreach(r => assert(r.getString(2) != "eval_holdout", r.toString))
  }

  test("q458: stream equals direct processBatch replay; state leaves bounded; plants behave") {
    val streamed = q("q458_stream_ingest_gate").collect()
    // direct replay: same gate logic driven batch-by-batch, no stream
    val arr = Pipeline97.ingestArrivals(spark, sf).localCheckpoint()
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val gate = new graft.pipeline.Curation.StreamingIngestGate(
      90, df => emitted += df, batchLabel = Some(col("wave")))
    for (b <- 0 to 2) gate.processBatch(arr.filter(col("wave") === b), b)
    val direct = emitted.reduce(_ union _).orderBy(col("doc_id")).collect()
    assert(streamed.toSeq == direct.toSeq,
      "streaming and direct replay disagree")
    assert(gate.stateLeaves >= 1 && gate.stateLeaves <= 8,
      s"tier invariant broken: ${gate.stateLeaves} leaves")
    // one keep per digest: a re-published pair (base, +50M twin) that
    // both pass the stateless stages never keeps twice
    val byId = streamed.map(r => r.getLong(1) -> r).toMap
    val passing: org.apache.spark.sql.Row => Boolean = r =>
      Set("kept", "dup_vs_state", "dup_in_batch").contains(r.getString(4))
    byId.keys.filter(_ >= 50000000L).filter(_ < 70000000L).foreach { id =>
      val (twin, base) = (byId(id), byId(id - 50000000L))
      assert(passing(twin) == passing(base),
        s"identical text, different stateless verdicts: $twin vs $base")
      if (passing(twin)) {
        assert(Seq(twin, base).count(_.getString(4) == "kept") == 1,
          s"re-publication pair kept ${Seq(twin, base)}")
      }
    }
    // same-wave duplicates: the larger id never wins its wave
    streamed.filter(_.getLong(1) >= 70000000L).filter(passing).foreach(r =>
      assert(r.getString(4) != "kept",
        s"same-batch duplicate out-kept its smaller-id twin: $r"))
  }

  test("q458 parquet stateDir arm: emits equal the in-memory arm; crash-replayed batch is emit-idempotent") {
    val arr = Pipeline97.ingestArrivals(spark, sf).localCheckpoint()
    def run(stateDir: Option[String]) = {
      val emitted = scala.collection.mutable.ArrayBuffer
        .empty[org.apache.spark.sql.DataFrame]
      val gate = new graft.pipeline.Curation.StreamingIngestGate(
        90, df => emitted += df, batchLabel = Some(col("wave")),
        stateDir = stateDir)
      for (b <- 0 to 2) gate.processBatch(arr.filter(col("wave") === b), b)
      (gate, emitted.map(_.orderBy(col("doc_id")).collect().toSeq))
    }
    val dir = Scratch.dir(spark, "q458_state")
    val (gp, ep) = run(Some(dir))
    val (gm, em) = run(None)
    assert(ep == em, "parquet and in-memory state arms disagree")
    assert(gp.stateLeaves == 1 && gm.stateLeaves >= 1)
    // restart recovery: a NEW gate instance over the same stateDir
    // replays wave 2 (whose digests are already on disk) — the emit
    // must match the original run exactly (own-partition exclusion),
    // and the replay must not have duplicated state (wave-2 digests
    // appear in exactly one partition)
    val replayed = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.DataFrame]
    val g2 = new graft.pipeline.Curation.StreamingIngestGate(
      90, df => replayed += df, batchLabel = Some(col("wave")),
      stateDir = Some(dir))
    g2.processBatch(arr.filter(col("wave") === 2), 2)
    assert(replayed.head.orderBy(col("doc_id")).collect().toSeq == ep(2),
      "crash-replayed batch emitted a different manifest")
    val st = spark.read.parquet(dir)
    assert(st.count() == st.select(col("h"), col("batch_id")).distinct().count())
    assert(st.groupBy(col("h")).count().filter(col("count") > 1).count() == 0,
      "a digest landed in more than one state partition after replay")
  }
}
