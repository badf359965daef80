package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pipeline-health monitoring — the distribution-drift tripwires an
  * ingestion owner wires between the stream and the corpus (a source
  * that silently changes its event/type mix is how a 100 TB pipeline
  * rots without a single job failing).
  */
object Monitor {

  /** Hour-over-hour KL drift of the event-type distribution:
    * KL(P_hour ‖ P_prev-hour) in micro-nats per event, add-one
    * smoothed over the global type alphabet — the alarm signal for
    * "this hour's traffic stopped looking like last hour's".
    *
    * Determinism (the q127/q162 discipline): all counts are exact
    * integers; each (hour, type) log-ratio rounds to integer
    * micro-nats BEFORE the count-weighted sum, so totals are
    * order-independent under any partitioning.
    *
    * Scale shape: ONE corpus-sized aggregate (hour × type counts,
    * map-side combined); everything downstream — the type alphabet,
    * the dense hour grid (missing hours surface as all-zero
    * distributions, maximally drifted: silence IS drift), the
    * hour-to-previous-hour join, the per-hour rollup — is
    * dimension-sized (hours × types). The count frame is
    * localCheckpoint'd: it feeds the alphabet, the bounds, and the
    * grid. */
  def typeDriftByHour(events: DataFrame): DataFrame = {
    val cnt = events
      .select(expr("(ts div 1000) div 3600000000").as("hour"),
        col("event_type"))
      .groupBy(col("hour"), col("event_type"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val types = cnt.select(col("event_type")).distinct()
    val nTypes = types.agg(count(lit(1)).as("nt"))
    val hours = cnt.agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(explode(sequence(col("h0"), col("h1"))).as("hour"))
    val grid = hours.crossJoin(types)
      .join(cnt, Seq("hour", "event_type"), "left")
      .select(col("hour"), col("event_type"),
        coalesce(col("c"), lit(0L)).as("c"))
    val totals = grid.groupBy(col("hour")).agg(sum(col("c")).as("n"))
    val cur = grid.join(totals, "hour").crossJoin(broadcast(nTypes))
    val prev = cur.select((col("hour") + 1).as("hour"),
      col("event_type"), col("c").as("cp"), col("n").as("np"))
    cur.join(prev, Seq("hour", "event_type"))
      .select(col("hour"), col("c"),
        (col("c") * round(
          (log((col("c") + 1).cast("double") / (col("n") + col("nt"))) -
           log((col("cp") + 1).cast("double") / (col("np") + col("nt"))))
          * 1e6, 0).cast("long")).as("term"),
        col("n"))
      .groupBy(col("hour"))
      .agg(max(col("n")).as("n_events"), sum(col("term")).as("kl_sum_unats"))
      .select(col("hour"),
        (col("hour") * 3600000000L).as("hour_start_us"),
        col("n_events"), col("kl_sum_unats"),
        when(col("n_events") > 0,
          floor(col("kl_sum_unats").cast("double") / col("n_events"))
            .cast("long")).otherwise(0L).as("kl_unats_per_event"))
  }
}
