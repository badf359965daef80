package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.profile.Dicts

/** The registered-zip dimension as a real JSON side-input.
  *
  * The reference ships a 42,632-entry `zips.json`
  * (`zip-lat-long-coords/zipcodes.zip!zipcodes/__init__.py:35-36`) whose
  * rows carry `zip_code`, `state`, `area_codes[]`, `lat`, `long`; its
  * `area_codes` union also backs phone-v1 validation
  * (`phone-number-v1.py:88-99`). This loader reads the same-shaped
  * fixture (`data/zips.json`, derived from the public NYC lists in
  * [[Dicts]]) via `spark.read.json` with an explicit schema — no
  * inference job — and downstream queries broadcast-join it (q29) or
  * collect its distinct area codes into a literal set probe (q17),
  * mirroring the reference's driver-side `set(area_codes)`.
  *
  * At scale: a multi-MB JSON dim is one executor read + one broadcast;
  * the explicit schema avoids a schema-inference pass over the file.
  *
  * If the checked-in fixture is not reachable from the process working
  * directory (e.g. the jar runs elsewhere), the loader materializes the
  * identical content from [[Dicts]] into a temp file first — the read
  * path is exercised either way.
  */
object ZipDim {

  val defaultPath = "data/zips.json"

  val schema: StructType = StructType(Seq(
    StructField("zip_code", StringType),
    StructField("state", StringType),
    StructField("area_codes", ArrayType(StringType)),
    StructField("lat", DoubleType),
    StructField("long", DoubleType)))

  /** Resolve the fixture, materializing from Dicts when absent. */
  private def resolve(): String = {
    val p = Paths.get(defaultPath)
    if (Files.exists(p)) p.toString else materialized
  }

  private lazy val materialized: String = {
    val tmp: Path = Files.createTempDirectory("graft-zips")
    val file = tmp.resolve("zips.json")
    val lines = Dicts.NycZips.zipWithIndex.map { case (z, i) =>
      val zi = z.toInt
      val n = Dicts.NycAreaCodes.length
      val base = (0 until 2 + zi % 2).map(j => Dicts.NycAreaCodes((zi + j * 37) % n))
      val cover = if (i < n) Seq(Dicts.NycAreaCodes(i % n)) else Nil
      val acs = (base ++ cover).distinct.sorted
      val lat = 40.5 + (zi % 400) / 1000.0
      val lng = -74.2 + (zi % 500) / 1000.0
      s"""{"area_codes": [${acs.map("\"" + _ + "\"").mkString(", ")}], """ +
        s""""lat": $lat, "long": $lng, "state": "NY", "zip_code": "$z"}"""
    }
    Files.write(file, String.join("\n", lines: _*).getBytes("UTF-8"))
    file.toString
  }

  def load(spark: SparkSession, path: String = null): DataFrame =
    spark.read.schema(schema).json(Option(path).getOrElse(resolve()))

  /** Distinct area codes from the dimension — the driver-side set the
    * reference builds for phone-v1. Cached per JVM (the dim is static). */
  lazy val areaCodesFromFile: SparkSession => Seq[String] = {
    val cache = new java.util.concurrent.ConcurrentHashMap[String, Seq[String]]()
    spark => cache.computeIfAbsent("codes", _ =>
      load(spark).select(explode(col("area_codes")).as("ac"))
        .distinct().collect().map(_.getString(0)).toSeq.sorted)
  }
}
