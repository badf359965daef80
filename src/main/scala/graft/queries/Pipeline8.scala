package graft.queries

import org.apache.spark.sql.functions._

/** Round-7 continuation pack: hash-anchored gate rows for the streaming
  * surface (the stream-stream join and streaming dedup were spec-only —
  * VERDICT r6 item 6), then the next LLM-pipeline curation operators.
  * Same conventions as the rest of the suite: integer microseconds for
  * event time, total ordering on a unique key, integer/decimal-exact
  * comparisons.
  */
object Pipeline8 {

  val entries: Seq[QEntry] = Seq(

    // Stream-stream interval join, batch-twin gate row. The operator is
    // SHARED code: EventsProfile.attributionJoin builds the same plan for
    // batch and streaming inputs (the analyzer eliminates the two
    // watermark nodes on batch children, leaving exactly the interval
    // join the state store would compute incrementally; inner-join
    // matches emit as soon as both rows arrive, so streaming == batch
    // row-for-row — EventsProfileSpec pins that equivalence on real
    // micro-batches). This row hash-anchors the shared join against the
    // DuckDB interval self-join, closing the audit chain:
    // oracle == batch (here) == streaming (spec).
    // Event times flow as integer microseconds (the q41 convention) so
    // no timestamp formatting crosses the hash boundary.
    QEntry("q121_attribution_batch",
      (s, d) => {
        val ev = graft.streaming.EventsProfile.withEventTime(
          Tables.events(s, d))
        graft.streaming.EventsProfile.attributionJoin(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"))
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            unix_micros(col("purchase_time")).as("purchase_us"),
            unix_micros(col("click_time")).as("click_us"))
          .orderBy(col("purchase_id"), col("click_id"))
      },
      Some("""SELECT p.user_id, p.event_id AS purchase_id,
                c.event_id AS click_id,
                epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
              FROM events p JOIN events c
                ON p.user_id = c.user_id
               AND p.event_type = 'purchase' AND c.event_type = 'click'
               AND epoch_us(c.ts) <= epoch_us(p.ts)
               AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
              ORDER BY purchase_id, click_id""")),

    // Streaming dedup gate row — runs the ACTUAL streaming operator, not
    // a twin: the events table is re-delivered twice (the at-least-once
    // source failure mode dropDuplicatesWithinWatermark exists for),
    // written as ONE parquet file so Trigger.AvailableNow processes it
    // as a single micro-batch (batch 0's watermark is unset, so nothing
    // is late-filtered — the dedup state sees every row, and the
    // watermark's state-EVICTION behavior is covered separately by the
    // per-event micro-batch specs in EventsProfileSpec). Output = one
    // row per event_id == DISTINCT over the duplicated input; kept rows
    // are deterministic because re-deliveries are exact copies. The
    // memory sink holds one micro-batch of deduped fixture rows —
    // gate-scale only; production streams sink to files/Kafka.
    QEntry("q122_stream_dedup_replay",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, d)
        val inDir = Scratch.dir(s, "q122_redelivered")
        ev.union(ev).coalesce(1).write.mode("overwrite").parquet(inDir)
        val sink = "q122_dedup_sink"
        val stream = s.readStream
          .schema(graft.streaming.EventsProfile.eventsSchema)
          .parquet(inDir)
        val q = graft.streaming.EventsProfile.dedupped(
            graft.streaming.EventsProfile.withEventTime(stream))
          .writeStream.outputMode("append").format("memory")
          .queryName(sink).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(sink)
          .select(col("event_id"), col("event_type"),
            expr("ts div 1000").as("us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type, epoch_us(ts) AS us
              FROM events ORDER BY event_id"""))
  )
}
