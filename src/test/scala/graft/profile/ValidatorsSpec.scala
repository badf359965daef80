package graft.profile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Table-driven validator tests. Inputs lifted from the reference's golden
  * samples and FIXTURES.md §A4 (e.g. `999-999-9999`→4 per
  * `phone-numbers/output_samples/311_v1_random.txt`, `BRONX`→2 per
  * `state_boroughs/sample_output/311_boro.txt`, `01310`→5 per
  * `zip-lat-long-coords/example-outputs/zip/311-zip0-subset.txt`). */
class ValidatorsSpec extends SparkSpec {

  private def run(v: Column => Column, inputs: Seq[String]): Seq[(Int, String)] = {
    val rows = inputs.map(org.apache.spark.sql.Row(_))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1), schema)
    df.select(v(col("raw")).as("v"))
      .select(col("v.code"), col("v.norm")).collect()
      .map(r => (r.getInt(0), r.getString(1))).toSeq
  }

  private def codes(v: Column => Column, cases: (String, Int)*): Unit = {
    val got = run(v, cases.map(_._1))
    cases.zip(got).foreach { case ((in, want), (code, _)) =>
      assert(code == want, s"input '$in': expected code $want, got $code")
    }
  }

  test("phone v0 codes (FIXTURES A4 + golden samples)") {
    codes(Validators.phoneVerdict,
      "+12013347135" -> 1,
      "2013347135" -> 1,      // valid after +1 retry
      "(201) 334-7135" -> 2,  // valid value, punctuated format
      "201-334-7135" -> 2,
      "999-999-9999" -> 4,    // repeated-digit sentinel
      "" -> 4,
      "n/a" -> 4,
      "hello" -> 5,           // leading alpha
      "012-000-0000" -> 5,    // NANP area code can't start 0
      "+1018840042" -> 3,     // explicit + claim that fails
      "0123456789012345" -> 5, // 16 digits
      "123" -> 5,             // too short
      null.asInstanceOf[String] -> 4)
  }

  test("phone v0 normalizes to E.164") {
    val got = run(Validators.phoneVerdict _,
      Seq("2013347135", "(201) 334-7135", "+12013347135"))
    assert(got.map(_._2) == Seq("+12013347135", "+12013347135", "+12013347135"))
  }

  test("phone v1 flags unknown area codes as plausible-not-real") {
    codes(Validators.phoneVerdictV1,
      "+12129926200" -> 1,    // 212 in dim
      "2129926200" -> 1,
      "+19995551234" -> 5,    // NANP shape, area 999 not registered
      "9995551234" -> 5)
  }

  test("state codes") {
    codes(Validators.stateVerdict,
      "New York" -> 1,
      "NY" -> 2,
      "new york" -> 2,
      " New York " -> 2,
      "N.Y." -> 2,
      "Wash." -> 2,
      "TEXAS" -> 2,
      "Narnia" -> 3,
      "A2" -> 3,              // dob_state.txt junk code
      "n/a" -> 4,
      "" -> 4)
  }

  test("boro codes") {
    codes(Validators.boroVerdict,
      "Brooklyn" -> 1,
      "BRONX" -> 2,
      "Bx" -> 2,
      "staten island" -> 2,
      "Amherst St" -> 3,      // parking_boro.txt street name
      "CAMBRIA HEIGHTS" -> 3, // 311_boro.txt non-borough city
      "" -> 4)
  }

  test("zip quick codes (format only)") {
    codes(Validators.zipQuickVerdict,
      "10012" -> 1,
      "10012-1234" -> 1,
      "100121234" -> 2,
      "01310" -> 1,           // quick tier has no dictionary
      "123" -> 3,
      "n/a" -> 4,
      "" -> 4)
  }

  test("zip quick normalizes 9 digits to hyphenated") {
    val got = run(Validators.zipQuickVerdict _, Seq("100121234"))
    assert(got.head == (2, "10012-1234"))
  }

  test("zip dict codes (registered-zip membership)") {
    codes(c => Validators.zipDictVerdict(c),
      "10012" -> 1,
      "11201-0001" -> 1,
      "01310" -> 5,           // format-valid, not registered (golden sample)
      "99999" -> 5,
      "123" -> 3,
      "n/a" -> 4)
  }

  test("lat/long codes") {
    codes(Validators.latVerdict,
      "40.8150748" -> 1,      // 311-lat0-subset golden
      "91.2" -> 5,            // out of range -> 5 standalone
      "-90.0" -> 1,
      "40.81N" -> 2,
      "abc" -> 3,
      "None" -> 4)
    codes(Validators.longVerdict,
      "-73.9426" -> 1,        // 311-long1-subset golden
      "181.0" -> 5,
      "120.5" -> 1)
  }

  test("coords codes") {
    val v: Column => Column = c => {
      val cv = Validators.coordsVerdict(c)
      struct(cv.getField("code").as("code"), cv.getField("norm").as("norm"))
    }
    codes(v,
      "(40.575, -74.107)" -> 1,
      "40.575 -74.107" -> 1,
      "[40.575;-74.107]" -> 1,
      "92.09, 19.23" -> 3,    // lat half out of range -> 3 inside a pair
      "None" -> 4,
      "foo" -> 3)
  }

  test("coords exposes per-half verdicts") {
    val rows = spark.range(1).select(
      Validators.coordsVerdict(lit("(40.575, -74.107)")).as("v"))
      .select(col("v.lat.code"), col("v.long.code")).collect()
    assert(rows.head.getInt(0) == 1 && rows.head.getInt(1) == 1)
  }
}
