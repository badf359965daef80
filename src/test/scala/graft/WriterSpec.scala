package graft

import org.apache.spark.sql.functions._

import graft.profile.{Detector, Profiler}
import graft.queries.Tables

/** Partitioned structured sink: verdicts partitioned by (semType) —
  * partition pruning on read is the 100 TB access path for per-type
  * consumers. */
class WriterSpec extends SparkSpec {

  test("verdicts round-trip through a partitioned parquet sink") {
    import spark.implicits._
    val df = (0 until 40).map { i =>
      (i.toLong,
        if (i % 2 == 0) "Queens" else "Bx",
        if (i % 2 == 0) "10012" else "99999")
    }.toDF("id", "b", "z")
    val detected = Detector.detect(df, Detector.defaultSpecs, 40,
      candidateCols = Some(Seq("b", "z")))
    val v = Profiler.verdicts(df, detected, keyCol = Some("id"))
    val out = java.nio.file.Files.createTempDirectory("verdicts").toString
    v.write.mode("overwrite").partitionBy("semType").parquet(out)

    val dirs = new java.io.File(out).listFiles.map(_.getName).filter(_.startsWith("semType="))
    assert(dirs.toSet == Set("semType=boro", "semType=zip"), dirs.mkString(","))

    // partition pruning: reading one type only touches its directory
    val back = spark.read.parquet(out).filter(col("semType") === "boro")
    assert(back.count() == 40)
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(semType"), scan.take(500))
  }
}
