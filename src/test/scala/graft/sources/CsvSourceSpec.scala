package graft.sources

import java.nio.file.Files

import graft.SparkSpec

/** PERMISSIVE CSV ingestion must absorb the ragged rows the reference
  * guarded by hand (`line[col] if len(line) > col else ""`, SURVEY O10):
  * short rows pad with nulls, long rows drop the overflow, neither
  * kills the read. */
class CsvSourceSpec extends SparkSpec {

  test("ragged rows read as nulls under PERMISSIVE, never fail the scan") {
    val dir = Files.createTempDirectory("graft-csv")
    val f = dir.resolve("ragged.csv")
    Files.write(f, java.util.Arrays.asList(
      "id,phone,state",
      "1,2125550100,NY",
      "2,2125550101",          // short row: state missing
      "3",                     // shorter still
      "4,2125550103,NY,EXTRA", // long row: overflow column
      "5,,"),                  // empty fields
      java.nio.charset.StandardCharsets.UTF_8)
    val df = CsvSource.read(spark, f.toString)
    assert(df.count() == 5)
    assert(df.columns.toSeq == Seq("id", "phone", "state"))
    val byId = df.collect().map(r => r.getInt(0) -> r).toMap
    assert(byId(2).isNullAt(2), "missing trailing field must be null")
    assert(byId(3).isNullAt(1) && byId(3).isNullAt(2))
    assert(byId(4).getString(2) == "NY", "overflow column dropped, row kept")
    assert(byId(5).isNullAt(1) && byId(5).isNullAt(2))
  }
}
