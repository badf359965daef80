package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry
import graft.streaming.EventsProfile

/** Structural invariants for the q263–q266 pack, including the
  * streaming==batch pin for the rate monitor (the operator q263
  * hash-anchors in batch runs live under readStream here). */
class Pipeline29Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q263 rate monitor STREAMING == batch (AvailableNow over fixture)") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val ev = graft.queries.Tables.events(spark, sf)
    val lo = ev.agg(expr("min(ts div 3600000000000)").as("h0"))
    val mu = ev.crossJoin(broadcast(lo))
      .select(col("event_type"), expr("ts div 3600000000000").as("h"),
        col("h0"))
      .filter(col("h") < col("h0") + 480)
      .groupBy(col("event_type"))
      .agg(expr("(count(*) * 100) div 480").as("mu_centi"))
    val dir = java.nio.file.Files.createTempDirectory("events_rate")
    ev.write.mode("overwrite").parquet(dir.toString)
    val stream = spark.readStream
      .schema(EventsProfile.eventsSchema).parquet(dir.toString)
    val sq = EventsProfile.rateMonitor(
        EventsProfile.withEventTime(stream), mu)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("rate_mon")
      .trigger(Trigger.AvailableNow()).start()
    sq.processAllAvailable()
    sq.stop()
    val streamed = spark.table("rate_mon")
      .select(expr("unix_micros(window_start)"), col("event_type"),
        col("n"), col("alarm"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val batch = q("q263_rate_monitor").collect()
      .map(r => (r.getAs[Long]("window_start_us"),
        r.getAs[String]("event_type")) ->
        (r.getAs[Long]("n"), r.getAs[Long]("alarm"))).toMap
    // Append mode emits a window only once the watermark passes its
    // end: the tail windows inside (max event time - 10 min) of the
    // last micro-batch never close. Equality holds on the closed
    // prefix; nothing outside it may be emitted.
    val maxUs = ev.agg(max(expr("ts div 1000"))).head().getLong(0)
    val closed = batch.filter { case ((ws, _), _) =>
      ws + 3600000000L <= maxUs - 600000000L
    }
    assert(streamed.keySet.subsetOf(batch.keySet))
    closed.foreach { case (k, v) =>
      assert(streamed.get(k).contains(v),
        s"closed window $k: streamed ${streamed.get(k)} != batch $v")
    }
    assert(closed.nonEmpty && streamed.size >= closed.size)
    streamed.foreach { case (k, v) => assert(batch(k) === v) }
    org.apache.commons.io.FileUtils.deleteQuietly(dir.toFile)
  }

  test("q264 SCD-2: intervals tile each user's observed days in order") {
    val out = q("q264_scd2_history").collect()
      .groupBy(_.getAs[Long]("user_id"))
    out.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("valid_from"))
      // exactly one open interval, and it is the LAST one
      assert(sorted.dropRight(1).forall(_.getAs[Long]("valid_to") >= 0))
      assert(sorted.last.getAs[Long]("valid_to") === -1L)
      // consecutive rows: next valid_from > previous valid_to, and the
      // tier actually changes at every boundary
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("valid_from") >
            a.getAs[Long]("valid_from"))
          assert(a.getAs[Long]("valid_to") <
            b.getAs[Long]("valid_from"))
          assert(a.getAs[Long]("tier") !== b.getAs[Long]("tier"))
        case _ =>
      }
    }
  }

  test("q265 Theil-Sen: pair count is C(days,2); slope is an observed pair slope") {
    val out = q("q265_theil_sen").collect()
    assert(out.length === 5)
    val days = graft.queries.Tables.events(spark, sf)
      .select(expr("ts div 86400000000000")).distinct().count()
    out.foreach { r =>
      assert(r.getAs[Long]("n_pairs") === days * (days - 1) / 2)
    }
  }

  test("q266 step latency: percentile ordering and coverage") {
    val r = q("q266_step_latency").head()
    val p50 = r.getAs[Long]("p50_min")
    val p90 = r.getAs[Long]("p90_min")
    val mx = r.getAs[Long]("max_min")
    assert(p50 <= p90 && p90 <= mx)
    assert(r.getAs[Long]("n_steps") > 0)
    // gaps are bounded by the observation window
    assert(mx < 45L * 24 * 60)
  }
}
