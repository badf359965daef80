package graft

import org.apache.spark.sql.functions._

/** End-to-end through the user CLI entry point: CSV in, partitioned
  * verdicts + summary out — the workflow that replaces the reference's
  * eight separate spark-submit scripts. */
class ProfileMainSpec extends SparkSpec {

  test("ProfileMain profiles a CSV into partitioned verdicts + summary") {
    val dir = java.nio.file.Files.createTempDirectory("pm")
    val csv = dir.resolve("in.csv")
    val rows = "id,b,z\n" + (0 until 40).map { i =>
      val b = if (i % 2 == 0) "Queens" else "Bx"
      val z = if (i % 2 == 0) "10012" else "99999"
      s"$i,$b,$z"
    }.mkString("\n")
    java.nio.file.Files.write(csv, rows.getBytes)

    val out = dir.resolve("out").toString
    val a = ProfileMain.parse(Array(csv.toString, out, "--types", "boro,zip", "--text"))
    assert(a.types == Seq("boro", "zip") && a.text)
    ProfileMain.run(spark, a)

    val verdicts = spark.read.parquet(s"$out/verdicts")
    assert(verdicts.select("semType").distinct().collect()
      .map(_.getString(0)).toSet == Set("boro", "zip"))
    assert(verdicts.count() == 80) // 40 rows × 2 detected columns

    val summary = spark.read.parquet(s"$out/summary")
    // Queens exact (1), Bx abbreviation (2); 10012 real zip (1), 99999 not (5)
    val codes = summary.collect()
      .map(r => (r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
    assert(codes(("boro", 1)) == 20 && codes(("boro", 2)) == 20, codes.toString)
    assert(codes(("zip", 1)) == 20 && codes(("zip", 5)) == 20, codes.toString)

    val text = spark.read.text(s"$out/text").collect().map(_.getString(0))
    assert(text.length == 80 && text.forall(_.startsWith("(")))
  }

  test("ProfileMain reads parquet input and survives zero detections") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("pm2")
    val pq = dir.resolve("in.parquet").toString
    // no column here is a semantic type: nothing must detect
    Seq((1L, "widget"), (2L, "gadget")).toDF("id", "name")
      .write.parquet(pq)
    val out = dir.resolve("out").toString
    ProfileMain.run(spark, ProfileMain.parse(Array(pq, out)))
    assert(spark.read.parquet(s"$out/summary").count() == 0)
  }
}
