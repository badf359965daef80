package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventsProfileSpec extends SparkSpec {

  test("streaming windowed profile matches the batch twin") {
    // file-source streaming needs a directory; write the NORMALIZED
    // events frame (ts as int64 nanos — Tables.events' contract) rather
    // than copying the raw fixture file, whose physical timestamp type
    // varies by fixture generation (TIMESTAMP(NANOS) vs TIMESTAMP_NTZ)
    // and must never leak into eventsSchema-typed streaming reads.
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    graft.queries.Tables.events(spark, sf)
      .write.mode("overwrite").parquet(dir.toString)
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

  test("late-data audit matches real append-mode drops under per-event batches") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // Planted arrival log (event-time in us): the 02:05 event advances
    // the watermark to 01:55, so the 00:15 straggler's window (end
    // 01:00) is already closed -> dropped; the 01:20 straggler's window
    // (end 02:00) is still open -> kept. The 09:00 event flushes
    // windows 1 and 2; its own window never closes (append semantics).
    // One subtlety the progress log exposes: Spark filters late INPUT
    // with the PREVIOUS batch's watermark (eviction uses the current
    // one), so the audit's as-of-arrival watermark equals Spark's only
    // when the doomed straggler does not arrive in the very next batch
    // after its watermark-advancer — hence the 01:50 filler between
    // them.
    val h = 3600L * 1000000L
    val evs = Seq(
      (0L, 1L * 60000000L, "click", 1.0),   // 00:01
      (1L, 30L * 60000000L, "click", 2.0),  // 00:30
      (2L, 2L * h + 5L * 60000000L, "click", 4.0), // 02:05 -> wm 01:55
      (3L, 1L * h + 50L * 60000000L, "click", 64.0), // 01:50 filler, kept
      (4L, 15L * 60000000L, "click", 8.0),  // 00:15 LATE (dropped)
      (5L, 1L * h + 20L * 60000000L, "click", 16.0), // 01:20 kept
      (6L, 9L * h, "click", 32.0))          // flush
    val dir = java.nio.file.Files.createTempDirectory("events_late")
    val batchDf = evs.map { case (id, us, t, v) => (id, us * 1000L, id, t, v, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    // one file per event, mtimes in arrival order -> the file source's
    // oldest-first ordering + maxFilesPerTrigger=1 forces one real
    // micro-batch per event, watermark advancing between batches
    evs.zipWithIndex.foreach { case ((id, us, t, v), i) =>
      val f = dir.resolve(f"ev_$i%03d")
      Seq((id, us * 1000L, id, t, v, "{}"))
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.mode("overwrite").parquet(f.toString)
      java.nio.file.Files.walk(f).forEach { p =>
        java.nio.file.Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(1700000000000L + i * 10000L))
      }
    }
    val stream = spark.readStream.schema(EventsProfile.eventsSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$dir/ev_*")
    val q = EventsProfile.windowedProfile(EventsProfile.withEventTime(stream))
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ep_late")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("ep_late").collect()
      .map(r => (r.getTimestamp(0).getTime * 1000L, r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val audit = EventsProfile.lateDataAudit(batchDf, col("event_id")).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // the audit flags exactly one late event, in window 0
    assert(audit.values.map(_._2).sum == 1L, s"audit late total: $audit")
    assert(audit((0L, "click"))._2 == 1L, s"late event not in window 0: $audit")
    // every emitted window matches the audit's on-time view exactly
    assert(streamed.keySet == Set((0L, "click"), (1L * h, "click"), (2L * h, "click")),
      s"closed windows: ${streamed.keySet}")
    streamed.foreach { case (key, (n, cents)) =>
      val (_, _, nOn, centsOn) = audit(key)
      assert((n, cents) == ((nOn, centsOn)),
        s"window $key: streamed ($n, $cents) != audited on-time ($nOn, $centsOn)")
    }
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
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
    val allPairs = Dedup.minhashNearDupPairs(docs, "doc_id", "text",
        collapseExact = false) // raw pairs — candidate-superset comparison
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val crossBoundary = allPairs.collect {
      case (a, b) if a < 400 && b >= 400 => (b, a)
      case (a, b) if b < 400 && a >= 400 => (a, b)
    }.toSet
    assert(crossBoundary.subsetOf(streamed),
      s"verified cross pairs missed by the stream: ${(crossBoundary -- streamed).take(5)}")
  }

  test("streaming decontamination equals the batch edit (pure projection)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import graft.pipeline.TextAnalysis
    val docs = graft.queries.Tables.documents(spark, sf)
    // benchmark set built ONCE from the static split (the broadcast dim)
    val bench = TextAnalysis.benchShingleHashSet(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
      .localCheckpoint()
    val arriving = docs.filter(col("doc_id") % 10 =!= 0)
      .select(col("doc_id"), col("text"))
    val dir = java.nio.file.Files.createTempDirectory("decon_stream")
    arriving.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream.schema(arriving.schema).parquet(dir.toString)
    val q = TextAnalysis.decontaminate(stream, bench, "doc_id", "text", 8)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("decon_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("decon_stream").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    val batch = TextAnalysis.decontaminate(arriving, bench, "doc_id", "text", 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(streamed == batch, s"diverges on ${
      (batch.keySet ++ streamed.keySet)
        .filter(k => batch.get(k) != streamed.get(k)).take(3)}")
    assert(streamed.values.exists(_._2 > 0), "fixture planted no removals")
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
