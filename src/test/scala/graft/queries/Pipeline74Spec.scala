package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-14 pack, first batch: the composed multimodal manifest. */
class Pipeline74Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q381: manifest covers the corpus, stages gate in order") {
    val rows = q("q381_multimodal_pipeline").collect()
    val nDocs = graft.queries.Tables.documents(spark, sf).count()
    val nCopies20 = graft.queries.Tables.documents(spark, sf)
      .filter(col("doc_id") % 20 === 0).count()
    val nCopies25 = graft.queries.Tables.documents(spark, sf)
      .filter(col("doc_id") % 25 === 0).count()
    // spine: one row per media, ids unique
    assert(rows.length == nDocs + nCopies20 + nCopies25)
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    val stages = Set("decode_short", "static_scene", "duplicate",
      "near_duplicate", "no_speech", "kept")
    rows.foreach { r =>
      val stage = r.getString(2)
      assert(stages.contains(stage), s"unknown stage $stage")
      assert(r.getString(1) == (if (stage == "kept") "keep" else "drop"))
      // stats are null exactly past the drop point
      val nShots = Option(r.get(4))
      val nVoiced = Option(r.get(6))
      val p0 = Option(r.get(7))
      stage match {
        case "decode_short" =>
          assert(nShots.isEmpty && nVoiced.isEmpty && p0.isEmpty)
        case "static_scene" | "duplicate" | "near_duplicate" =>
          assert(nShots.nonEmpty && nVoiced.isEmpty && p0.isEmpty)
        case "no_speech" =>
          assert(nShots.nonEmpty && nVoiced.nonEmpty && p0.isEmpty)
        case "kept" =>
          assert(nShots.nonEmpty && nVoiced.nonEmpty && p0.nonEmpty)
          assert(r.getLong(5) <= 7L) // max_shot gate
          assert(r.getLong(6) >= 10L) // VAD gate
      }
    }
    // the fixtures exercise EVERY stage (planted copies + id-keyed
    // cut/run positions guarantee it at every SF)
    val byStage = rows.groupBy(_.getString(2)).view.mapValues(_.length)
    stages.foreach(s =>
      assert(byStage.getOrElse(s, 0) > 0, s"stage $s never fired"))
    // a byte-identical +20M copy whose original survives to dedup must
    // drop as 'duplicate' (same text, same id mod 20 → same gates)
    val byId = rows.map(r => r.getLong(0) -> r.getString(2)).toMap
    byId.foreach { case (id, stage) =>
      if (id >= 20000000L) {
        val base = byId(id - 20000000L)
        if (base == "kept" || base == "no_speech")
          assert(stage == "duplicate",
            s"copy $id should collapse onto surviving base (base=$base)")
      }
    }
  }

  // ADVICE r14 item 3: q381's decode gate counts CHARACTERS
  // (length(text), matching the char-based oracle) while stage-5
  // pooling frames BYTES (encode(text,'UTF-8'), 64-byte frames) — the
  // two agree iff the fixture is ASCII-only. Pin that assumption at
  // both gate SFs so a non-ASCII fixture lands as a test failure here
  // instead of a silent Spark/oracle divergence.
  test("q381 fixture guard: documents text is ASCII-only (chars == bytes) at both gate SFs") {
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01").foreach { d =>
      val nonAscii = graft.queries.Tables.documents(spark, d)
        .filter(length(col("text")) =!= octet_length(col("text")))
        .count()
      assert(nonAscii == 0L,
        s"$d: $nonAscii non-ASCII documents break q381's char/byte convention")
    }
  }
}
