package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec
import graft.profile.Validators

/** Differential: the fused SemVerdict kernels must agree cell-for-cell
  * (code AND norm) with the Catalyst when-tree reference implementation
  * on curated inputs and random junk. */
class FusedVerdictSpec extends SparkSpec {

  private val curated = Seq(
    "+12013347135", "2013347135", "(201) 334-7135", "201-334-7135",
    "999-999-9999", "", " ", "n/a", "hello", "012-000-0000", "+1018840042",
    "0123456789012345", "123", "+442071838750", "1-212-555-0142",
    "New York", "NY", "new york", " New York ", "N.Y.", "Wash.", "TEXAS",
    "Narnia", "A2", "Brooklyn", "BRONX", "Bx", "staten island",
    "Amherst St", "CAMBRIA HEIGHTS",
    "10012", "10012-1234", "100121234", "01310", "99999", "10451",
    "40.8150748", "91.2", "-90.0", "40.81N", "abc", "None", "-73.9426",
    "181.0", "120.5", "0", "90", "90.000001", "-180",
    "(40.575, -74.107)", "40.575 -74.107", "[40.575;-74.107]",
    "92.09, 19.23", "foo", "40.5754", "12.34.56.78", "1,2,3",
    "user5@example.com", " User5@Example.COM ", "user@@example.com",
    "user5.example.com", "user5@example.zzz", "ops@data.org", "a@b.co",
    "@example.com", "user@.com", "user@exam ple.com",
    "https://example.com/item/5", "example.com/item/5",
    "HTTPS://Example.COM/Item/5", "htp://example.com/5",
    "https://example.zzz/5", "https://shop.example.co/cart?id=5",
    "https://", "http://x.y", "example", "www.example.com:8080/a/b",
    "2020-01-06", "2021-13-40", "2021-02-29", "2020-02-29",
    "04/15/2021", "13/01/2021", "20210412", "99999999", "00000101",
    "1999-12-31", "yesterday", "2021-1-1", "2021-04-31", "12/31/1999",
    "10.0.0.1", " 10.0.0.1 ", "010.001.002.003", "999.1.1.1", "10.0.0",
    "256.256.256.256", "1.2.3.4.5", "0.0.0.0", "192.168.001.1",
    "$12.25", " $12.25 ", "$1,234.50", "1234.56", "$12.3", "$0.99",
    "free", "12,34", "$01.00", "0.99", "1,234.56", "$1,23.45",
    null.asInstanceOf[String])

  private val junkGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(24)),
    Gen.numStr.map(_.take(18)),
    Gen.chooseNum(-200.0, 200.0).map(d => f"$d%.4f"),
    Gen.chooseNum(0L, 999999999999L).map(_.toString),
    for {
      a <- Gen.chooseNum(100, 999); b <- Gen.chooseNum(100, 999)
      c <- Gen.chooseNum(1000, 9999)
    } yield s"$a-$b-$c")

  test("fused kernels agree with the when-tree validators") {
    val junk = Gen.listOfN(800, junkGen).sample.getOrElse(Nil)
    val inputs = curated ++ junk
    val rows = inputs.map(org.apache.spark.sql.Row(_))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)

    // Collect (tc,tn,fc,fn) and compare driver-side. A DataFrame filter on
    // these columns would be pushed below the projection and re-inline the
    // whole when-tree into the predicate (alias substitution), which blows
    // the 64 KB codegen method limit — a plan shape no production query has.
    val treeOf: Map[String, Column => Column] = Validators.all
    for ((semType, _) <- SemVerdict.kernels) {
      // coords: compare top-level (code, norm) — the tree's struct carries
      // extra per-half fields the fused kernel doesn't reproduce, but code
      // and norm must agree cell-for-cell.
      val tree =
        if (semType == "coords") Validators.coordsVerdict(col("raw"))
        else treeOf(semType)(col("raw"))
      val fused = SemVerdict.verdict(col("raw"), semType)
      val rows = df.select(col("raw"),
          tree.getField("code").as("tc"), tree.getField("norm").as("tn"),
          fused.getField("code").as("fc"), fused.getField("norm").as("fn"))
        .collect()
      val bad = rows.filter(r => r.get(1) != r.get(3) || r.get(2) != r.get(4))
      assert(bad.isEmpty, s"$semType diverges: " +
        bad.take(5).map(r => s"'${r.get(0)}' tree=(${r.get(1)},${r.get(2)}) fused=(${r.get(3)},${r.get(4)})").mkString("; "))
    }
  }
}
