package graft.queries

import graft.SparkSpec

/** Round-14 pack, sixth batch: the release-cut composition. */
class Pipeline79Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q392: stages gate in order; kept rows carry the full record") {
    val rows = q("q392_release_pipeline").collect()
    assert(rows.nonEmpty)
    val stages = Set("duplicate", "low_quality", "contaminated", "kept")
    val byStage = rows.groupBy(_.getString(3)).view.mapValues(_.length)
    stages.foreach(st =>
      assert(byStage.getOrElse(st, 0) > 0, s"stage $st never fired"))
    val perSourceRoot = scala.collection.mutable.Map.empty[String, String]
    val perSourceAlloc = scala.collection.mutable.Map.empty[String, Long]
    rows.foreach { r =>
      val (id, src, verdict, stage) =
        (r.getLong(0), r.getString(1), r.getString(2), r.getString(3))
      assert(stages.contains(stage))
      assert(verdict == (if (stage == "kept") "keep" else "drop"))
      stage match {
        case "duplicate" =>
          assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
          assert(id >= 10000000L,
            s"min-id rep $id dropped as duplicate")
        case "low_quality" =>
          assert(r.getLong(4) < 500L)
          assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
        case "contaminated" =>
          assert(r.getLong(4) >= 500L && id % 50 == 0,
            s"$id contaminated but not a benchmark doc")
        case "kept" =>
          assert(r.getLong(4) >= 500L)
          assert(!r.isNullAt(5) && !r.isNullAt(6) && !r.isNullAt(7))
          assert(r.getLong(6) >= 0L && r.getLong(6) < 256L)
          // roots and allocations are per-source constants
          perSourceRoot.get(src).foreach(x => assert(x == r.getString(7)))
          perSourceRoot(src) = r.getString(7)
          perSourceAlloc.get(src).foreach(x => assert(x == r.getLong(5)))
          perSourceAlloc(src) = r.getLong(5)
      }
    }
    // allocations respect the cap range (1..4 epochs in milli)
    perSourceAlloc.values.foreach(a => assert(a >= 1L && a <= 4000L))
  }

  test("q393: wave gating + the incremental root equals the batch fold") {
    val rows = q("q393_incremental_release").collect()
    assert(rows.nonEmpty)
    val byStage = rows.groupBy(_.getString(3)).view.mapValues(_.length)
    Seq("duplicate", "low_quality", "contaminated", "kept").foreach(st =>
      assert(byStage.getOrElse(st, 0) > 0, s"stage $st never fired"))
    rows.foreach { r =>
      val (id, stage) = (r.getLong(0), r.getString(3))
      assert(id % 7 == 0, s"$id is not a wave arrival")
      // the re-upload plant is exactly the swapped docs (fixture texts
      // are otherwise unique)
      assert((stage == "duplicate") == (id % 21 == 0 && id > 0),
        s"$id dup mismatch: $stage")
      if (stage == "kept")
        assert(!r.isNullAt(5) && !r.isNullAt(6) && !r.isNullAt(7))
      else
        assert(r.isNullAt(5) && r.isNullAt(6) && r.isNullAt(7))
    }
    // mergeability, operator-level: the root each kept row carries must
    // equal the BATCH fold over (shipped survivors ∪ wave keeps)
    val keptRoots = rows.filter(_.getString(3) == "kept")
      .map(r => r.getString(1) -> r.getString(7)).toMap
    assert(keptRoots.nonEmpty)
    import org.apache.spark.sql.functions._
    val base = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("text"))
    def score(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("toks",
        graft.pipeline.TextAnalysis.tokenCount(col("text")).cast("long"))
      .withColumn("score_bp",
        expr("CAST(size(filter(split(lower(text), '\\\\s+'), w -> w IN (" +
          "'the','a','of','and','to','in','is','on','for','with'" +
          "))) AS BIGINT) * 10000 div greatest(1L, toks)"))
    val bench = base.filter(col("doc_id") % 10 === 0)
      .select(md5(col("text")).as("h")).distinct()
    val seedSurv = score(base.filter(col("doc_id") % 7 =!= 0))
      .filter(col("score_bp") >= 500L)
      .withColumn("h", md5(col("text")))
      .join(bench, Seq("h"), "left_anti")
    val seedDig = base.filter(col("doc_id") % 7 =!= 0)
      .select(md5(col("text")).as("h")).distinct()
    val wave = score(base.filter(col("doc_id") % 7 === 0)
      .join(base.select((col("doc_id") + 1L).as("doc_id"),
        col("text").as("pt")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % 21 === 0 && col("pt").isNotNull, col("pt"))
          .otherwise(col("text")).as("text")))
      .withColumn("h", md5(col("text")))
    val waveKept = wave
      .join(seedDig.withColumnRenamed("h", "hh"),
        col("h") === col("hh"), "left_anti")
      .filter(col("score_bp") >= 500L)
      .join(bench.withColumnRenamed("h", "hb"),
        col("h") === col("hb"), "left_anti")
    val union = seedSurv.select(col("source"), col("doc_id"), col("text"))
      .union(waveKept.select(col("source"), col("doc_id"), col("text")))
    val batchRoots = graft.pipeline.Manifest.roots(
        graft.pipeline.Manifest.bucketFolds(union))
      .collect().map(r => r.getString(0) -> r.getString(3)).toMap
    keptRoots.foreach { case (src, root) =>
      assert(batchRoots(src) == root,
        s"$src incremental root != batch fold over the union")
    }
  }
}
