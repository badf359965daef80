package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, fourteenth batch: ingest-robustness roundtrips. */
class Pipeline93Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q444: the frame roundtrip conserves every record and every body byte") {
    val rows = q("q444_record_ingest").collect()
    val expected = Tables.documents(spark, sf)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(length(col("text"))).as("chars"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    assert(rows.length == expected.size)
    rows.foreach { r =>
      val (n, chars) = expected(r.getString(0))
      assert(r.getLong(1) == n && r.getLong(2) == n,
        s"${r.getString(0)}: framing lost or failed to parse records")
      assert(r.getLong(3) == chars,
        s"${r.getString(0)}: body bytes diverged through the frame")
    }
  }

  test("q445: all four torture kinds round-trip lossless through the CSV sink") {
    val rows = q("q445_csv_quoting_roundtrip").collect()
    assert(rows.map(_.getString(0)).sorted.toSeq ==
      Seq("comma", "newline", "quote", "spaces"))
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2) &&
        r.getString(3) == "lossless",
        s"kind ${r.getString(0)}: ${r.getLong(2)}/${r.getLong(1)} intact")
      assert(r.getLong(1) > 0L)
    }
  }
}
