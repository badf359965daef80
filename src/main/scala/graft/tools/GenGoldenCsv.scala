package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Synth

/** One-shot generator for the checked-in golden profiling fixture
  * `data/csv_golden_nyc.csv` (VERDICT r10 item 4): a realistic messy
  * NYC-311-shaped CSV with EVERY semantic type the profiler knows —
  * phones, states, boroughs, zips, lat/long, coords, emails, URLs, ISO
  * dates, ipv4, money — plus two honest traps:
  *
  *   - CENSUS_TRACT: 9-digit codes whose first five digits are a real
  *     zip → the reference's Block/CENSUS_TRACT→zip detection false
  *     positive (`zip-lat-long-coords/example-outputs/zip/
  *     311-zip0-subset.txt:1`), reproduced at full-pipeline grain;
  *   - Descriptor: free text that must detect as NOTHING.
  *
  * Values are the Synth residue columns evaluated at id 0..95, so the
  * q287 oracle can replay every verdict from `id % k` CASE arithmetic
  * without re-implementing a validator in SQL. Run once, diff, commit:
  *
  * {{{ sbt "runMain graft.tools.GenGoldenCsv" }}}
  */
object GenGoldenCsv {

  val Path = "data/csv_golden_nyc.csv"

  /** Second golden fixture (VERDICT r11 item 4): a device-registry CSV
    * whose key column is a REGISTRY-defined semantic type — `Device ID`
    * carries the Synth.uuidHex residues (canonical/upper/bare-hex/
    * null-like/garbage/fragment), `Callback Phone` a built-in type so
    * one profile run proves registry + built-ins compose, and `Status`
    * letter-only free text that must detect as NOTHING (no digit runs,
    * no dictionary words, no URL/email shapes). q297 profiles it with
    * `TypeRegistry.register(uuid)` active and hash-compares the full
    * histogram against id-residue CASE arithmetic. */
  val DevicesPath = "data/csv_golden_devices.csv"
  val Rows = 96

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cols = Seq(
      "Phone" -> Synth.phone, "State" -> Synth.state,
      "Borough" -> Synth.boro, "Incident Zip" -> Synth.zip,
      "Latitude" -> Synth.lat, "Longitude" -> Synth.longitude,
      "Location" -> Synth.coords, "Email" -> Synth.email,
      "Website" -> Synth.url, "Created Date" -> Synth.isodate,
      "Server IP" -> Synth.ipv4, "Amount" -> Synth.money)
    // the Synth residue expressions resolve against `c_custkey`
    val df = spark.range(Rows)
      .select(col("id"), col("id").as("c_custkey"))
      .select(
        (col("id") +: (cols.map { case (n, c) => c.as(n) } ++ Seq(
          concat(lit("10012000"), (col("id") % 10).cast("string"))
            .as("CENSUS_TRACT"),
          element_at(array(lit("Loud Music/Party"), lit("Banging/Pounding"),
            lit("Pothole"), lit("Illegal Parking")),
            (col("id") % 4 + 1).cast("int")).as("Descriptor")))): _*)
    writeCsv(df, Path)

    val devices = spark.range(Rows)
      .select(col("id"), col("id").as("c_custkey"))
      .select(col("id"),
        Synth.uuidHex.as("Device ID"),
        Synth.phone.as("Callback Phone"),
        element_at(array(lit("Queued"), lit("Resolved"),
          lit("Escalated"), lit("Archived")),
          (col("id") % 4 + 1).cast("int")).as("Status"))
    writeCsv(devices, DevicesPath)
    spark.stop()
  }

  private def writeCsv(df: org.apache.spark.sql.DataFrame,
      path: String): Unit = {
    val rows = df.collect()
    val header = df.schema.fieldNames
    def cell(v: Any): String = {
      val s = if (v == null) "" else v.toString
      if (s.contains(",") || s.contains("\"") || s.contains("\n"))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    }
    val out = new StringBuilder
    out ++= header.map(cell).mkString(",") += '\n'
    rows.foreach { r =>
      out ++= (0 until r.length).map(i => cell(r.get(i))).mkString(",") += '\n'
    }
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      out.toString.getBytes("UTF-8"))
    println(s"[gen-golden] wrote ${rows.length} rows to $path")
  }
}
