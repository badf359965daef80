package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Dev probe: pin Structured Streaming session_window append-mode
  * emission semantics (which sessions flush under an AvailableNow
  * final watermark) before q413's oracle is written. Not a gate query.
  */
object SessionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = graft.queries.Tables.events(spark, sfDir)
    val inDir = s"/tmp/graft_sessprobe_${spark.sparkContext.applicationId}"
    ev.coalesce(1).write.mode("overwrite").parquet(inDir)
    val stream = spark.readStream
      .schema(graft.streaming.EventsProfile.eventsSchema)
      .parquet(inDir)
    val q = graft.streaming.EventsProfile.withEventTime(stream)
      .withWatermark("event_time", "0 seconds")
      .groupBy(session_window(col("event_time"), "60 seconds"),
        col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .writeStream.outputMode("append").format("memory")
      .queryName("sessprobe").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("sessprobe")
      .select(col("user_id"),
        expr("unix_micros(session_window.start)").as("start_us"),
        expr("unix_micros(session_window.end)").as("end_us"),
        col("n_events"))
    val n = out.count()
    val maxUs = ev.agg(max(expr("ts div 1000"))).collect()(0).getLong(0)
    println(s"[probe] emitted sessions: $n, global max event us: $maxUs")
    println(s"[probe] max emitted end_us: " +
      out.agg(max(col("end_us"))).collect()(0).getLong(0))
    // batch twin: lag-gap sessions with end = last + gap
    val batch = graft.streaming.EventsProfile
      .sessionizeBatch(ev, gapUs = 60L * 1000 * 1000)
    println(s"[probe] batch sessions total: ${batch.count()}")
    batch.printSchema()
    spark.stop()
  }
}
