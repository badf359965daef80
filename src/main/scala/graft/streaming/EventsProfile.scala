package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming profile over the `events` stream (SURVEY.md §7
  * north-star extension — the reference has no streaming at all,
  * SURVEY.md §2d).
  *
  * Design: `readStream` → event-time watermark → tumbling-window
  * aggregation (count + exact integer cents sum) — the streaming twin of
  * the batch `q14_events_window` query, so batch output doubles as the
  * streaming oracle. Late data beyond the watermark is dropped by Spark's
  * state eviction; state size is bounded by (windows in watermark) ×
  * (event types).
  *
  * At scale: watermark + windowed agg is the canonical unbounded-state
  * guard; `spark.sql.shuffle.partitions` sizes the state store, and the
  * sink sees one row per closed (window, event_type).
  */
object EventsProfile {

  /** Parquet schema of the events fixture with `ts` as TIMESTAMP(NANOS)
    * read as int64 (see Tables.events); streaming needs an explicit
    * schema. */
  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // nanos since epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Nanos-long → event-time timestamp column. */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("event_time", timestamp_micros(expr("ts div 1000")))

  /** Tumbling-window profile aggregation, shared by batch and streaming:
    * per (1-hour window, event_type): count + exact cents sum. */
  def windowedProfile(withTime: DataFrame): DataFrame =
    withTime
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(round(col("value") * 100, 0).cast("long")).as("sum_cents"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_cents"))

  /** Watermark late-data audit — the BATCH twin of what
    * [[windowedProfile]]'s watermark does to late rows, as a defined,
    * engine-reproducible metric. Replays the event log in `arrival`
    * order and flags each event the way the streaming aggregation
    * would: the running watermark is (max event time seen strictly
    * before this arrival) − `delayUs`, and an event is LATE — dropped
    * by the stateful agg — iff its window has already closed
    * (window_end <= watermark). Output per (window_start_us,
    * event_type): total/late/on-time counts and the on-time cents sum,
    * i.e. exactly what the streaming profile would have emitted plus
    * how much it dropped. Spec-pinned against real append-mode
    * streaming with forced per-event batches (EventsProfileSpec).
    * One semantic footnote from that spec: Spark applies the late-input
    * filter with the PREVIOUS micro-batch's watermark (eviction uses
    * the current one — the two-watermark split of SPARK-24634), so this
    * as-of-arrival audit matches the engine exactly except for
    * stragglers landing in the very batch after their watermark-
    * advancer, where Spark is one batch more lenient.
    *
    * Scale shape: the running max needs a global arrival order, which
    * is the [[graft.operators.GlobalRank]] two-pass — range-partition
    * by arrival key, strict-prefix max within partitions, per-partition
    * maxima (<= numPartitions rows) prefix-combined and broadcast back.
    * No single-partition window ever sees event rows. */
  def lateDataAudit(
      events: DataFrame,
      arrival: org.apache.spark.sql.Column,
      delayUs: Long = 600000000L,
      windowUs: Long = 3600000000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = events.select(col("event_id"), col("event_type"),
      expr("ts div 1000").as("us"),
      round(col("value") * 100, 0).cast("long").as("cents"),
      arrival.as("__arr"))
    val parted = base
      .repartitionByRange(col("__arr"), col("event_id"))
      .sortWithinPartitions(col("__arr"), col("event_id"))
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .drop("__mid")
    val strictPrefix = Window.partitionBy(col("__pid"))
      .orderBy(col("__arr"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("__lmax", max(col("us")).over(strictPrefix))
    // per-partition maxima: a <= numPartitions-row frame; its window is
    // the only unpartitioned one and never sees event rows
    val offsets = parted.groupBy(col("__pid")).agg(max(col("us")).as("__pmax"))
      .withColumn("__prev", max(col("__pmax")).over(
        Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("__pid"), col("__prev"))
    val flagged = local.join(broadcast(offsets), "__pid")
      .withColumn("__wmax", greatest(col("__lmax"), col("__prev")))
      .withColumn("window_start_us", expr(s"(us div $windowUs) * $windowUs"))
      .withColumn("late", col("__wmax").isNotNull &&
        (col("window_start_us") + windowUs <= col("__wmax") - delayUs))
    flagged.groupBy(col("window_start_us"), col("event_type"))
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("late"), 1L).otherwise(0L)).as("n_late"),
        sum(when(col("late"), 0L).otherwise(1L)).as("n_ontime"),
        sum(when(col("late"), 0L).otherwise(col("cents"))).as("cents_ontime"))
  }

  /** Streaming exact dedup — the streaming twin of `Dedup.exactGroups`:
    * drops re-deliveries of the same `event_id` arriving within the
    * watermark (at-least-once sources re-deliver; this makes the
    * downstream pipeline effectively-once). State is one tiny record per
    * id seen inside the watermark, evicted as event time advances — the
    * bounded-state analogue of a full-corpus dedup. */
  def dedupped(withTime: DataFrame): DataFrame =
    withTime
      .withWatermark("event_time", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  /** Hourly rate monitor, shared by batch and streaming (q263's
    * operator): per (1-hour tumbling window, type) counts joined to a
    * STATIC per-type expectation dim (`mu_centi` = mean hourly count
    * ×100, trained offline — the stream-static broadcast join shape),
    * alarmed when |n − mu| > mu/2 in exact integers. Streaming state
    * is bounded by (windows inside the watermark) × types; the
    * expectation dim rides a broadcast — no stream-stream join, no
    * unbounded state. */
  def rateMonitor(withTime: DataFrame, expectation: DataFrame)
      : DataFrame =
    withTime
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"))
      .join(broadcast(expectation), "event_type")
      .withColumn("alarm",
        (abs(col("n") * 200 - col("mu_centi") * 2) > col("mu_centi"))
          .cast("long"))

  /** Start the streaming profile over a parquet directory (file-source
    * streaming), writing to an in-memory sink named `queryName`. */
  def start(
      spark: SparkSession,
      inputDir: String,
      queryName: String = "events_profile"): StreamingQuery = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val stream = spark.readStream
      .schema(eventsSchema)
      .parquet(inputDir)
    windowedProfile(withEventTime(stream))
      .writeStream
      .outputMode(OutputMode.Append)
      .format("memory")
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Stream-stream interval join (attribution): each purchase joined to
    * the same user's clicks within the `boundUs` microseconds before it.
    *
    * The canonical streaming-join discipline: BOTH streams carry
    * watermarks and the join condition bounds event time on both sides,
    * so the state store evicts a click once the purchase-side watermark
    * passes `click_time + bound` — state is O(traffic inside the bound),
    * never unbounded history. Inner-join matches emit as soon as both
    * rows arrive (the watermark only gates eviction), so the result
    * equals the batch join row-for-row (spec-pinned). */
  def attributionJoin(
      clicks: DataFrame,    // (event_id, user_id, event_time)
      purchases: DataFrame, // same shape
      boundUs: Long = 3600L * 1000 * 1000): DataFrame = {
    val c = clicks.select(col("event_id").as("click_id"),
        col("user_id").as("c_user"), col("event_time").as("click_time"))
      .withWatermark("click_time", "10 minutes")
    val p = purchases.select(col("event_id").as("purchase_id"),
        col("user_id").as("p_user"), col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "10 minutes")
    p.join(c,
        col("c_user") === col("p_user") &&
          col("click_time") <= col("purchase_time") &&
          col("click_time") >= col("purchase_time") - expr(s"INTERVAL '$boundUs' MICROSECOND"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_time"), col("click_time"))
  }

  // ---------------------------------------------------------------------
  // Stateful per-user sessionization (flatMapGroupsWithState) — the
  // custom-state primitive the reference lacks entirely.
  // ---------------------------------------------------------------------

  /** Batch sessionization as pure windows — the scale-safe formulation:
    * lag → gap marker → running-sum session id → group. Each step is a
    * partitioned window or aggregate, so a user's history is sorted by
    * Spark's spillable external sort instead of being materialized in
    * executor memory (the typed [[sessionize]] operator's
    * `it.toSeq.sortBy` is fine for streaming micro-batches, where state
    * arrives incrementally, but would OOM on one hot user at 100 TB).
    * Output schema and semantics match [[sessionize]] exactly
    * (closed = not the user's last session); equivalence is spec-pinned.
    */
  def sessionizeBatch(
      events: DataFrame,
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val marked = events
      .select(col("user_id"), expr("ts div 1000").as("us"))
      .withColumn("new_s",
        when(col("us") - lag(col("us"), 1).over(byUser) > gapUs, 1).otherwise(0))
    val sess = marked.withColumn("sid",
      sum(col("new_s")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("nEvents"), (max(col("us")) - min(col("us"))).as("durationUs"))
      .withColumn("closed", col("sid") =!= max(col("sid")).over(Window.partitionBy(col("user_id"))))
      .select(col("user_id"), col("nEvents"), col("durationUs"), col("closed"))
  }

  case class Event(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)
  case class SessionState(nEvents: Long, firstTs: Long, lastTs: Long)
  case class SessionUpdate(user_id: Long, nEvents: Long, durationUs: Long, closed: Boolean)

  /** Session aggregator: counts events per user, closing the session
    * after `gapUs` of event-time silence (processing-time timeout in the
    * streaming case; exercised via the batch-like memory test). */
  def sessionize(
      spark: SparkSession,
      events: DataFrame,
      gapUs: Long = 30L * 60 * 1000 * 1000): DataFrame = {
    import spark.implicits._
    val ds = events
      .select(col("event_id"), expr("ts div 1000").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event]
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          var s = state.getOption.getOrElse(SessionState(0L, Long.MaxValue, Long.MinValue))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionUpdate]
          it.toSeq.sortBy(_.ts).foreach { e =>
            if (s.nEvents > 0 && e.ts - s.lastTs > gapUs) {
              out += SessionUpdate(userId, s.nEvents, s.lastTs - s.firstTs, closed = true)
              s = SessionState(0L, Long.MaxValue, Long.MinValue)
            }
            s = SessionState(s.nEvents + 1, math.min(s.firstTs, e.ts), math.max(s.lastTs, e.ts))
          }
          if (s.nEvents > 0) {
            state.update(s)
            out += SessionUpdate(userId, s.nEvents, s.lastTs - s.firstTs, closed = false)
          }
          out.iterator
      }.toDF()
  }
}
