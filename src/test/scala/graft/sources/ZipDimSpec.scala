package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.profile.Dicts

/** The zips.json side-input must stay consistent with the literal dicts
  * that back the fused kernels and the DuckDB oracles — if the file and
  * the literals drift, q17/q24/q29 results silently diverge between the
  * when-tree (file-fed) and fused (literal-fed) paths. */
class ZipDimSpec extends SparkSpec {

  test("zips.json loads with the declared schema and matches Dicts.NycZips") {
    val dim = ZipDim.load(spark)
    assert(dim.schema == ZipDim.schema)
    val zips = dim.select(col("zip_code")).collect().map(_.getString(0)).toSet
    assert(zips == Dicts.NycZips.toSet)
  }

  test("area-code union from the file equals Dicts.NycAreaCodes") {
    val fromFile = ZipDim.areaCodesFromFile(spark)
    assert(fromFile == Dicts.NycAreaCodes.sorted,
      s"file/literal drift: ${fromFile.diff(Dicts.NycAreaCodes).take(5)}")
  }

  test("every zip row carries NYC-plausible coordinates") {
    val bad = ZipDim.load(spark)
      .filter(!col("lat").between(40.0, 41.0) || !col("long").between(-74.5, -73.0))
      .count()
    assert(bad == 0)
  }
}
