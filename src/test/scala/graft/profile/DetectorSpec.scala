package graft.profile

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DetectorSpec extends SparkSpec {

  test("detects semantic columns over a mixed table in one job") {
    import spark.implicits._
    val df = (0 until 100).map { i =>
      (i.toLong,
        if (i % 2 == 0) "New York" else "NY",         // state col
        if (i % 3 == 0) "Brooklyn" else "nope",       // boro col
        f"${10001 + i % 30}%05d",                     // zip col (registered)
        s"40.${700000 + i}",                          // lat col
        s"just text $i")                              // noise
    }.toDF("id", "st", "borough", "zipcode", "latitude", "note")

    val got = Detector.detect(df, Detector.defaultSpecs, sampleN = 100,
      candidateCols = Some(Seq("st", "borough", "zipcode", "latitude", "note")))
    val pairs = got.map(d => (d.column, d.semType)).toSet
    assert(pairs.contains(("st", "state")))
    assert(pairs.contains(("borough", "boro")))
    assert(pairs.contains(("zipcode", "zip")))
    assert(pairs.contains(("latitude", "lat")))
    assert(!pairs.exists(_._1 == "note"), s"noise column detected: $pairs")
    // name hint: zip values are 5-digit numbers but the lat validator
    // must not see non-lat-named columns at all
    assert(!pairs.contains(("zipcode", "lat")))
  }

  test("thresholds gate detection (zip needs >= 5 sample hits)") {
    import spark.implicits._
    val df = (0 until 100).map { i =>
      (i.toLong, if (i < 4) "10012" else "garbage")
    }.toDF("id", "zipish")
    val got = Detector.detect(df, Detector.defaultSpecs, sampleN = 100,
      candidateCols = Some(Seq("zipish")))
    assert(!got.exists(d => d.column == "zipish" && d.semType == "zip"))
  }

  test("profiler classifies every cell of detected columns in one pass") {
    import spark.implicits._
    val df = (0 until 60).map { i =>
      (i.toLong, if (i % 2 == 0) "Queens" else "Bx")
    }.toDF("id", "b")
    val out = Profiler.profile(df,
      Detector.defaultSpecs.filter(_.semType == "boro"),
      sampleN = 50, keyCol = Some("id"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
    assert(out.toSet == Set(("b", "boro", 1, 30L), ("b", "boro", 2, 30L)))
  }
}
