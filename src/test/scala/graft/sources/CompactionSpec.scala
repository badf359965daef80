package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Compaction: file count shrinks to the computed target, rows and
  * values are untouched. */
class CompactionSpec extends SparkSpec {

  test("many small files compact to ~target-size files; rows identical") {
    val src = java.nio.file.Files.createTempDirectory("compact_src").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out").toString
    val docs = graft.queries.Tables.documents(spark, sf)
    // simulate a drip-fed sink: 64 tiny files
    docs.repartition(64).write.mode("overwrite").parquet(src)
    val (bytes, before) = Compaction.layoutStats(spark, src)
    assert(before >= 60, s"expected ~64 small files, got $before")

    val (b2, after) = Compaction.compact(spark, src, out, targetBytes = bytes / 4)
    assert(b2 == before)
    assert(after <= 6 && after >= 4,
      s"expected ~ceil(bytes/target)=4-ish files (parquet overhead tolerated), got $after")

    // fidelity: same rows, same values
    val a = docs.orderBy("doc_id").collect().toSeq
    val b = Compaction.readBack(spark, out).orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("tiny table compacts to one file") {
    val src = java.nio.file.Files.createTempDirectory("compact_src1").toString
    val out = java.nio.file.Files.createTempDirectory("compact_out1").toString
    graft.queries.Tables.region(spark, sf)
      .repartition(8).write.mode("overwrite").parquet(src)
    val (_, after) = Compaction.compact(spark, src, out, targetBytes = 1L << 30)
    assert(after == 1)
  }
}
