package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bucketed-layout variants of the heavy joins (SURVEY.md §8.1).
  *
  * Bucketing is the 100 TB answer to REPEATED shuffles on the same key:
  * pay the hash-partition ONCE at write time, and every subsequent join,
  * window, or aggregation keyed on the bucket column reads the layout
  * instead of exchanging. At fixture scale the write+read round-trip is
  * measurable overhead; at cluster scale it replaces a full-data exchange
  * per query with zero — the bucketed scan's hash-partitioning satisfies
  * the operator's required ClusteredDistribution directly
  * (BucketingSpec proves the Exchange disappears; these gate entries
  * oracle-pin that the LAYOUT never changes the RESULT).
  */
object Relational3 {

  private def cents(c: Column): Column = round(c * 100, 0).cast("long")

  /** Managed-table name unique per source dir (sf0.01 verify and sf0.1
    * bench must not read each other's buckets). */
  private def tag(d: String): String = d.replaceAll("[^A-Za-z0-9]", "_")

  /** Bucketed table for `df`, built at most once per layout: the whole
    * point of bucketing is pay-the-shuffle-once-join-forever, so a
    * layout already on disk is REUSED, not rewritten —
    *  - same JVM: the catalog entry is found, read directly;
    *  - new JVM (in-memory catalog forgot, ./spark-warehouse persists):
    *    re-register an external bucketed table over the existing files
    *    (CLUSTERED BY carries the bucket spec; the data was written by
    *    the same bucket hash);
    *  - column mismatch (layout from an older code version): drop,
    *    delete, rebuild.
    * Testdata is immutable and the table name embeds the source dir, so
    * file reuse cannot serve stale rows. */
  private def bucketed(
      s: SparkSession,
      df: org.apache.spark.sql.DataFrame,
      table: String,
      key: String,
      sortKeys: Seq[String]): org.apache.spark.sql.DataFrame = {
    val loc = new org.apache.hadoop.fs.Path(
      s.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table)))
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    def build(): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $table")
      if (fs.exists(loc)) fs.delete(loc, true)
      val w = df.write.bucketBy(16, key)
      (if (sortKeys.nonEmpty) w.sortBy(sortKeys.head, sortKeys.tail: _*) else w)
        .mode("overwrite").format("parquet").saveAsTable(table)
    }
    if (!s.catalog.tableExists(table)) {
      if (fs.exists(loc)) {
        val sorted =
          if (sortKeys.nonEmpty) s"SORTED BY (${sortKeys.mkString(", ")})" else ""
        s.sql(s"""CREATE TABLE $table (${df.schema.toDDL}) USING parquet
                 CLUSTERED BY ($key) $sorted INTO 16 BUCKETS
                 LOCATION '$loc'""")
      } else build()
    }
    if (s.table(table).columns.toSeq != df.columns.toSeq) build()
    s.table(table)
  }

  val entries: Seq[QEntry] = Seq(

    // q10/q46-family fact⋈fact join on bucketed layouts: both sides
    // bucketed+sorted on the order key, so the sort-merge join needs
    // neither Exchange nor Sort (plan gate: BucketingSpec + DumpPlans).
    // The oracle runs the plain-parquet formulation — layout must be
    // invisible in the result.
    QEntry("q78_bucketed_fact_join",
      (s, d) => {
        // project BEFORE the bucketed write: the layout pays off per
        // consumed column, so persist only what the downstream joins
        // read (a bucketed copy of every column is write amplification)
        val li = bucketed(s,
          Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice")),
          s"g5_bl_${tag(d)}", "l_orderkey", Seq("l_orderkey"))
        val ord = bucketed(s,
          Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus")),
          s"g5_bo_${tag(d)}", "o_orderkey", Seq("o_orderkey"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderstatus"))
          .agg(sum(cents(col("l_extendedprice"))).as("revenue_cents"),
            count(lit(1)).as("n"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS n
              FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              GROUP BY o_orderstatus
              ORDER BY o_orderstatus""")),

    // q41's as-of window on a layout bucketed by user_id: the bucketed
    // scan's hash-partitioning satisfies the Window's required
    // distribution, so the per-user event-time pass runs shuffle-free —
    // the natural layout for an event log consumed by many per-user
    // queries. Same oracle as q41: layout must not change the answer.
    QEntry("q79_bucketed_asof",
      (s, d) => {
        val ev = bucketed(s,
          Tables.events(s, d).select(col("event_id"), col("user_id"),
            col("event_type"), expr("ts div 1000").as("us")),
          s"g5_bev_${tag(d)}", "user_id", Seq("user_id", "us", "event_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        ev.withColumn("prev_purchase_id",
            last(when(col("event_type") === "purchase", col("event_id")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("prev_purchase_id"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, user_id, prev_purchase_id FROM (
                SELECT event_id, user_id, event_type,
                  last_value(CASE WHEN event_type = 'purchase' THEN event_id END IGNORE NULLS)
                    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_purchase_id
                FROM events)
              WHERE event_type = 'click'
              ORDER BY event_id"""))
  )
}
