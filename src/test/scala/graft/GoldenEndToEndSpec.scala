package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.profile.{Detector, Profiler}
import graft.sources.CsvSource

/** Golden end-to-end: a reference-shaped CSV (311-style, FIXTURES.md §A)
  * through CSV ingest → detection → classification → text sink. */
class GoldenEndToEndSpec extends SparkSpec {

  test("311-shaped CSV profiles end to end") {
    val rows = Seq(
      "id,Incident Zip,City,Borough,Phone,Latitude,Location",
      "1,10012,BROOKLYN,BROOKLYN,+12013347135,40.8150748,\"(40.575, -74.107)\"",
      "2,10012-1234,Bronx,BRONX,201-334-7135,40.7128,\"40.575 -74.107\"",
      "3,100121234,staten island,Bx,999-999-9999,91.2,None",
      "4,01310,Narnia,Amherst St,hello,abc,foo",
      "5,n/a,n/a,,,None,",
      "6,10451,Queens,Queens,2013347135,40.6,\"(40.6, -73.9)\"",
      "7,11201,manhattan,MANHATTAN,(201) 334-7135,40.65,\"(40.65, -73.95)\"",
      "8,10301,BROOKLYN,brooklyn,+12129926200,40.58,\"(40.58, -74.15)\"",
      "9,11375,Queens,QUEENS,2129926200,40.72,\"(40.72, -73.84)\"",
      "10,10467,Bronx,BRONX,9179926200,40.88,\"(40.88, -73.87)\"")
    val dir = Files.createTempDirectory("golden").toFile
    val csv = new java.io.File(dir, "311.csv")
    Files.writeString(csv.toPath, rows.mkString("\n"))

    val df = CsvSource.read(spark, csv.getAbsolutePath)
    val detected = Detector.detect(df, Detector.defaultSpecs, sampleN = 100,
      candidateCols = Some(df.schema.fieldNames.filterNot(_ == "id").toSeq))
    val pairs = detected.map(d => (d.column, d.semType)).toSet
    assert(pairs.contains(("Incident Zip", "zip")), s"got $pairs")
    assert(pairs.contains(("Borough", "boro")), s"got $pairs")
    assert(pairs.contains(("City", "boro")), s"got $pairs") // 311 quirk: City holds boroughs
    assert(pairs.contains(("Phone", "phone")), s"got $pairs")
    assert(pairs.contains(("Latitude", "lat")), s"got $pairs")
    assert(pairs.contains(("Location", "coords")), s"got $pairs")

    val verdicts = Profiler.verdicts(df, detected, Detector.defaultSpecs, Some("id"))
    val phoneCodes = verdicts.filter(col("column") === "Phone")
      .select(col("rowId"), col("code")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(phoneCodes(1L) == 1) // +12013347135
    assert(phoneCodes(2L) == 2) // 201-334-7135
    assert(phoneCodes(3L) == 4) // 999-999-9999
    assert(phoneCodes(4L) == 5) // hello
    assert(phoneCodes(5L) == 4) // empty

    // O15 text-sink parity
    val out = new java.io.File(dir, "out")
    CsvSource.writeVerdictText(verdicts, out.getAbsolutePath)
    val lines = spark.read.text(out.getAbsolutePath).collect().map(_.getString(0))
    assert(lines.exists(_.startsWith("(Phone,(1,1,")), lines.take(3).mkString("; "))
  }

  test("golden NYC CSV through ProfileMain: full detection set + CENSUS_TRACT→zip pin") {
    // the checked-in q287 fixture through the USER entry point (CLI
    // core): every semantic type detected on its column, the three
    // documented false positives present, Descriptor and id silent.
    val out = java.nio.file.Files.createTempDirectory("goldenpm")
      .resolve("out").toString
    ProfileMain.run(spark, ProfileMain.parse(
      Array(graft.queries.Tables.fixture("data/csv_golden_nyc.csv"), out)))
    val summary = spark.read.parquet(s"$out/summary")
    val pairs = summary.select("column", "semType").distinct().collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    val expected = Set(
      ("Phone", "phone"), ("State", "state"), ("Borough", "boro"),
      ("Incident Zip", "zip"), ("Latitude", "lat"), ("Longitude", "long"),
      ("Location", "coords"), ("Email", "email"), ("Website", "url"),
      ("Created Date", "isodate"), ("Server IP", "ipv4"),
      ("Amount", "money"),
      // honest false positives, each explained in Pipeline36.goldenOracle
      ("CENSUS_TRACT", "zip"), ("Location", "phone"), ("Email", "url"))
    assert(pairs == expected,
      s"missing=${expected -- pairs} extra=${pairs -- expected}")
    assert(!pairs.exists(_._1 == "Descriptor") && !pairs.exists(_._1 == "id"))
    // the reference's Block/CENSUS_TRACT→zip pattern at verdict grain:
    // every tract code classifies as a 9-digit dictionary zip (code 2)
    val tract = summary.collect()
      .filter(r => r.getString(0) == "CENSUS_TRACT")
      .map(r => r.getInt(2) -> r.getLong(3)).toMap
    assert(tract == Map(2 -> 96L), s"tract codes: $tract")
  }

  test("registered-type golden journey: devices CSV + uuid via TypeRegistry") {
    // VERDICT r11 item 4: the full "add a type by config" user story —
    // register uuid through the PUBLIC API, run the checked-in devices
    // fixture through ProfileMain, and the registry type profiles side
    // by side with the built-ins (q297 hash-compares the histograms;
    // this spec pins the detection set and the uuid census).
    import graft.profile.TypeRegistry
    TypeRegistry.synchronized {
      if (!TypeRegistry.registered.exists(_.semType == "uuid"))
        TypeRegistry.register(TypeRegistry.uuid)
    }
    try {
      val out = java.nio.file.Files.createTempDirectory("goldendev")
        .resolve("out").toString
      ProfileMain.run(spark, ProfileMain.parse(
        Array(new java.io.File(graft.tools.GenGoldenCsv.DevicesPath)
          .getAbsolutePath, out)))
      val summary = spark.read.parquet(s"$out/summary")
      val pairs = summary.select("column", "semType").distinct().collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(pairs == Set(("Device ID", "uuid"), ("Callback Phone", "phone")),
        s"got $pairs")
      // id%6 residues appear 16× each over 96 rows: codes
      // {0,1}→1, 2→2 (bare hex, fixable), 3→4 (null-like), {4,5}→5
      val census = summary.collect()
        .filter(r => r.getString(0) == "Device ID")
        .map(r => r.getInt(2) -> r.getLong(3)).toMap
      assert(census == Map(1 -> 32L, 2 -> 16L, 4 -> 16L, 5 -> 32L),
        s"uuid census: $census")
    } finally TypeRegistry.clear()
  }
}
