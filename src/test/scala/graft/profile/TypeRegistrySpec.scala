package graft.profile

import graft.SparkSpec

/** The pluggable-type seam (VERDICT r10 item 6): a semantic type
  * registered as declarative config — no Detector/Profiler/Validators
  * edits — flows through detection, classification, and the ProfileMain
  * CLI exactly like a built-in. */
class TypeRegistrySpec extends SparkSpec {

  test("registered RegexType flows through detect, verdicts, and ProfileMain") {
    TypeRegistry.clear()
    TypeRegistry.register(TypeRegistry.uuid)
    try {
      // duplicate and built-in-shadowing registrations are rejected
      intercept[IllegalArgumentException] {
        TypeRegistry.register(TypeRegistry.uuid)
      }
      intercept[IllegalArgumentException] {
        TypeRegistry.register(TypeRegistry.RegexType("phone", "^x$"))
      }
      assert(TypeRegistry.all.map(_.semType).count(_ == "uuid") == 1)

      // end to end through the CLI: CSV in, uuid verdicts out
      val dir = java.nio.file.Files.createTempDirectory("reg")
      val csv = dir.resolve("in.csv")
      val rows = "id,token\n" + (0 until 10).map { i =>
        val v = if (i % 2 == 0)
          f"ABCDEF01-2345-6789-ABCD-EF0123456$i%03d" // valid, mixed case
        else "hello"
        s"$i,$v"
      }.mkString("\n")
      java.nio.file.Files.write(csv, rows.getBytes)
      val out = dir.resolve("out").toString
      val a = graft.ProfileMain.parse(
        Array(csv.toString, out, "--types", "uuid"))
      graft.ProfileMain.run(spark, a)
      val summary = spark.read.parquet(s"$out/summary").collect()
        .map(r => (r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap
      assert(summary(("uuid", 1)) == 5 && summary(("uuid", 5)) == 5,
        summary.toString)
      // norm lowercases the canonical form
      val verdicts = spark.read.parquet(s"$out/verdicts")
      import org.apache.spark.sql.functions._
      val norms = verdicts.filter(col("code") === 1).select("norm")
        .collect().map(_.getString(0))
      assert(norms.nonEmpty && norms.forall(n => n == n.toLowerCase))
    } finally TypeRegistry.clear()
  }

  test("unregistered state: CLI rejects unknown types (seam is opt-in)") {
    TypeRegistry.clear()
    intercept[IllegalArgumentException] {
      graft.ProfileMain.parse(Array("in.csv", "out", "--types", "uuid"))
    }
  }
}
