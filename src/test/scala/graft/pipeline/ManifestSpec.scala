package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental manifest: the streaming fold's roots after every wave
  * must equal the q365 batch replay, and the final state must equal the
  * one-shot q352 manifest.
  */
class ManifestSpec extends SparkSpec {

  test("incremental roots after each wave == q365; final == q352") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    val expected = graft.SparkEntry
      .queries("q365_manifest_waves")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))

    val inc = new Manifest.IncrementalManifest
    (0L to 2L).foreach { w =>
      inc.processBatch(docs.filter(col("doc_id") % 3 === w), w)
      val got = inc.currentRoots()
      val exp = expected.filter(_._1 == w)
        .map(t => (t._2, t._3, t._4)).sortBy(_._1)
      assert(got == exp.toSeq, s"wave $w roots diverge")
    }

    val fin = graft.SparkEntry.queries("q352_corpus_manifest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(inc.currentRoots() == fin,
      "final incremental state must equal the one-shot manifest")
  }

  test("incremental manifest drives a real stream (AvailableNow)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mani")
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("source"), col("doc_id"), col("text"))
    docs.repartition(4).write.mode("overwrite")
      .parquet(dir.resolve("in").toString)
    val inc = new Manifest.IncrementalManifest
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1) // force several micro-batches
      .parquet(dir.resolve("in").toString)
    val q = inc.start(stream)
    q.awaitTermination()
    val batch = graft.SparkEntry.queries("q352_corpus_manifest")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(3)))
      .sortBy(_._1).toSeq
    assert(inc.currentRoots() == batch,
      "streamed state must equal the batch manifest")
  }
}
