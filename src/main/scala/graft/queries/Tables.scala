package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver fixtures (TESTDATA.md).
  *
  * Scale note: plain `spark.read.parquet` keeps Catalyst in charge of
  * split planning (`spark.sql.files.maxPartitionBytes`), predicate
  * pushdown and column pruning; at 100 TB the same call reads a
  * partitioned directory tree and partition pruning applies unchanged.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, table: String): DataFrame =
    spark.read.parquet(s"$sfDir/$table.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  /** events table — `ts` is ALWAYS presented as nanos-since-epoch int64
    * (`ts div 1000` == DuckDB `epoch_us(ts)` for exact cross-engine time
    * arithmetic), whatever the fixture's physical type:
    *  - TIMESTAMP(NANOS) parquet + a Spark build honoring the legacy
    *    `nanosAsLong` conf → already long, pass through;
    *  - TIMESTAMP_NTZ (micros) — the current fixture/build combination —
    *    → micros since the epoch via timestampdiff against the epoch NTZ
    *    literal (NO session-timezone dependence; a cast through
    *    TimestampType would shift with the session zone), then ×1000.
    *    Sub-microsecond digits are zero, exactly like DuckDB's read of
    *    the same file;
    *  - TIMESTAMP (instant) → unix_micros ×1000. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts) * 1000L"))
      case _ =>
        df.withColumn("ts", org.apache.spark.sql.functions.expr(
          "unix_micros(ts) * 1000L"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Checked-in fixture path (repo-relative), resolved against the cwd —
    * Verify/Bench/sbt all run with cwd = repo root. ADVICE r12: absolute
    * `/root/repo/...` literals broke any other checkout location; every
    * fixture-reading query (and its inlined oracle SQL) resolves through
    * here instead. */
  def fixture(rel: String): String = new java.io.File(rel).getAbsolutePath
}
