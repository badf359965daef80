package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsProfileSpec extends SparkSpec {

  test("streaming windowed profile matches the batch twin") {
    // file-source streaming needs a directory; the fixture is one file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))
    val q = EventsProfile.start(spark, dir.toString, "ep_test")
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ep_test")
      .select(col("window_start"), col("event_type"), col("n"), col("sum_cents"))

    val batch = EventsProfile.windowedProfile(
      EventsProfile.withEventTime(graft.queries.Tables.events(spark, sf)))

    // Append mode emits only watermark-closed windows; every emitted row
    // must match the batch result, and most windows should have closed.
    val b = batch.collect().map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val s = streamed.collect()
    assert(s.nonEmpty, "no windows closed")
    s.foreach { r =>
      val key = (r.getTimestamp(0), r.getString(1))
      assert(b.contains(key), s"streamed window $key missing from batch")
      assert(b(key) == ((r.getLong(2), r.getLong(3))), s"mismatch at $key")
    }
    assert(s.length >= b.size / 2, s"too few closed windows: ${s.length} of ${b.size}")
  }

  test("streaming dedup drops watermark-window re-deliveries exactly") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // simulate an at-least-once source: every event delivered twice
    val ev = graft.queries.Tables.events(spark, sf).limit(500)
    val dir = java.nio.file.Files.createTempDirectory("events_dup")
    ev.unionAll(ev).repartition(4)
      .write.mode("overwrite").parquet(dir.toString)

    val stream = spark.readStream
      .schema(EventsProfile.eventsSchema).parquet(dir.toString)
    val q = EventsProfile.dedupped(EventsProfile.withEventTime(stream))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ep_dedup")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()

    val got = spark.table("ep_dedup")
    assert(got.count() == 500, s"expected 500 distinct events, got ${got.count()}")
    assert(got.select("event_id").distinct().count() == 500)
  }

  test("stream-stream attribution join equals the batch join") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ev = EventsProfile.withEventTime(graft.queries.Tables.events(spark, sf))
      .select(col("event_id"), col("user_id"), col("event_type"), col("event_time"))
    def writeType(t: String) = {
      val dir = java.nio.file.Files.createTempDirectory(s"ev_$t")
      ev.filter(col("event_type") === t).write.mode("overwrite").parquet(dir.toString)
      dir.toString
    }
    val (clickDir, purchDir) = (writeType("click"), writeType("purchase"))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("user_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("event_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("event_time", org.apache.spark.sql.types.TimestampType)))
    def readStream(dir: String) = spark.readStream.schema(schema).parquet(dir)
    val q = EventsProfile.attributionJoin(readStream(clickDir), readStream(purchDir))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ep_attr")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ep_attr")
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventsProfile.attributionJoin(
      spark.read.schema(schema).parquet(clickDir),
      spark.read.schema(schema).parquet(purchDir))
      .select("purchase_id", "click_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batch.nonEmpty, "no attribution pairs in fixture")
    assert(streamed == batch,
      s"stream vs batch: missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
  }

  test("streaming LSH: arriving docs find their corpus near-dup candidates") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.pipeline.Dedup
    val docs = graft.queries.Tables.documents(spark, sf)
    val corpus = docs.filter(col("doc_id") < 400)
    val arriving = docs.filter(col("doc_id") >= 400)
      .select(col("doc_id"), col("text"))
    // static corpus bucket table (precomputed once, the incremental
    // pattern's whole point)
    val corpusBuckets = Dedup.minhashBuckets(corpus, "doc_id", "text")
      .localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("docs_stream")
    arriving.write.mode("overwrite").parquet(dir.toString)
    val schema = arriving.schema
    val stream = spark.readStream.schema(schema).parquet(dir.toString)
    val q = Dedup.streamingNearDupCandidates(stream, corpusBuckets, "doc_id", "text")
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("lsh_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("lsh_stream")
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = Dedup.streamingNearDupCandidates(
      arriving, corpusBuckets, "doc_id", "text")
      .select("new_id", "corpus_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"missing=${(batch -- streamed).take(5)} extra=${(streamed -- batch).take(5)}")
    // and the candidates agree with the all-pairs batch operator where
    // scopes overlap: every verified cross-boundary near-dup pair must
    // have been a streaming candidate (candidates are a superset).
    val allPairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text")
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val crossBoundary = allPairs.collect {
      case (a, b) if a < 400 && b >= 400 => (b, a)
      case (a, b) if b < 400 && a >= 400 => (a, b)
    }.toSet
    assert(crossBoundary.subsetOf(streamed),
      s"verified cross pairs missed by the stream: ${(crossBoundary -- streamed).take(5)}")
  }

  test("stateful sessionization counts all events exactly once") {
    val ev = graft.queries.Tables.events(spark, sf)
    val sessions = EventsProfile.sessionize(spark, ev, gapUs = 60L * 1000 * 1000)
    val total = sessions.agg(sum(col("nEvents"))).collect().head.getLong(0)
    assert(total == ev.count(), s"session event counts must partition the stream")
    val multi = sessions.filter(col("nEvents") > 1).count()
    assert(multi > 0, "expected at least one multi-event session")
  }

  test("batch window sessionize is equivalent to the typed-state operator") {
    val ev = graft.queries.Tables.events(spark, sf)
    val gap = 60L * 1000 * 1000
    val key = Seq("user_id", "nEvents", "durationUs", "closed").map(col)
    val typed = EventsProfile.sessionize(spark, ev, gap)
      .select(key: _*).orderBy(key: _*).collect().toSeq
    val batch = EventsProfile.sessionizeBatch(ev, gap)
      .select(key: _*).orderBy(key: _*).collect().toSeq
    assert(batch == typed,
      s"batch/typed sessionize diverge: ${batch.diff(typed).take(3)} vs ${typed.diff(batch).take(3)}")
  }
}
