package graft.profile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Property tests (SURVEY.md §5 item 2): generators per semantic type;
  * invariants: every code ∈ 1..5; code-2 values normalize into the code-1
  * domain (normalization closure); detection hit-predicates agree with
  * the full verdicts' `code IN (1,2)` on arbitrary junk. */
class ValidatorPropertiesSpec extends SparkSpec {

  private def classify(v: Column => Column, inputs: Seq[String]): Seq[(String, Int, String)] = {
    val rows = inputs.map(org.apache.spark.sql.Row(_))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    df.select(col("raw"), v(col("raw")).as("v"))
      .select(col("raw"), col("v.code"), col("v.norm")).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2))).toSeq
  }

  private val junkGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(20)),
    Gen.numStr.map(_.take(18)),
    Gen.oneOf("", " ", "n/a", "None", "NULL", "999-999-9999"),
    Gen.chooseNum(-200.0, 200.0).map(d => f"$d%.4f"),
    Gen.chooseNum(0L, 99999999999L).map(_.toString))

  private def batch(n: Int): Seq[String] =
    Gen.listOfN(n, junkGen).sample.getOrElse(Seq.fill(n)("x"))

  test("all validators emit codes in 1..5 on arbitrary junk") {
    val inputs = batch(300)
    for ((name, v) <- Validators.all) {
      val out = classify(v, inputs)
      out.foreach { case (in, code, _) =>
        assert(code >= 1 && code <= 5, s"$name('$in') -> $code")
      }
    }
  }

  test("code-2 phone normalizations re-validate as code 1") {
    val inputs = batch(300) ++ Seq("(212) 555-0142", "201-334-7135", "+1 917 992 6200")
    val twos = classify(Validators.phoneVerdict, inputs)
      .filter(_._2 == Codes.ValidBadFormat).map(_._3)
    if (twos.nonEmpty) {
      val re = classify(Validators.phoneVerdict, twos)
      re.foreach { case (in, code, _) =>
        assert(code == Codes.Valid, s"normalized '$in' must be code 1, got $code")
      }
    }
  }

  test("code-2 zip normalizations re-validate as code 1 (quick tier)") {
    val inputs = batch(200) ++ Seq("100121234", "104510001")
    val twos = classify(Validators.zipQuickVerdict _, inputs)
      .filter(_._2 == Codes.ValidBadFormat).map(_._3)
    if (twos.nonEmpty) {
      classify(Validators.zipQuickVerdict _, twos).foreach { case (in, code, _) =>
        assert(code == Codes.Valid, s"normalized '$in' must be code 1, got $code")
      }
    }
  }

  test("state code-2 normalizations are canonical names or acronyms") {
    val variants = Seq("new york", " New York ", "N.Y.", "TEXAS", "wash.", "CALIF.")
    classify(Validators.stateVerdict, variants).foreach { case (in, code, norm) =>
      assert(code == Codes.ValidBadFormat, s"'$in' -> $code")
      assert(Dicts.StateNames.contains(norm) || Dicts.StateAcronyms.contains(norm)
        || Dicts.StateAbbrevs.contains(norm), s"'$in' normalized to '$norm'")
    }
  }

  test("code-2 email/url/isodate normalizations re-validate as code 1") {
    // normalization closure for the engine-extension trio: a fixable
    // format's norm must land in the canonical (code-1) domain
    val fixable = Seq(
      (Validators.emailVerdict _): Column => Column,
      (Validators.urlVerdict _): Column => Column,
      (Validators.isoDateVerdict _): Column => Column)
    val seeds = Seq(
      " User7@Example.COM ", "ops@Data.ORG",
      "example.com/item/9", "HTTPS://Example.COM/Item/9", "www.example.co",
      "04/15/2021", "20210412", "12/31/1999")
    for (v <- fixable) {
      val twos = classify(v, batch(200) ++ seeds)
        .filter(_._2 == Codes.ValidBadFormat).map(_._3)
      if (twos.nonEmpty) {
        classify(v, twos).foreach { case (in, code, _) =>
          assert(code == Codes.Valid, s"normalized '$in' must be code 1, got $code")
        }
      }
    }
  }

  test("hit predicates agree with verdict code IN (1,2) on junk") {
    val inputs = batch(400) ++ Seq(
      "user5@example.com", " User5@Example.COM ", "user5@example.zzz",
      "example.com/item/5", "https://example.zzz/5", "htp://example.com/5",
      "2020-01-06", "04/15/2021", "20210412", "2021-02-29")
    val rows = inputs.map(org.apache.spark.sql.Row(_))
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("raw",
        org.apache.spark.sql.types.StringType, nullable = true)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val pairs: Seq[(String, Column => Column, Column => Column)] = Seq(
      ("phone", Validators.phoneVerdict _, Validators.phoneHit _),
      ("state", Validators.stateVerdict _, Validators.stateHit _),
      ("boro", Validators.boroVerdict _, Validators.boroHit _),
      ("zip", c => Validators.zipDictVerdict(c), c => Validators.zipDictHit(c)),
      ("lat", Validators.latVerdict _, c => Validators.latLongHit(c, 90.0)),
      ("coords", c => {
        val v = Validators.coordsVerdict(c)
        struct(v.getField("code").as("code"), v.getField("norm").as("norm"))
      }, Validators.coordsHit _),
      ("email", Validators.emailVerdict _, Validators.emailHit _),
      ("url", Validators.urlVerdict _, Validators.urlHit _),
      ("isodate", Validators.isoDateVerdict _, Validators.isoDateHit _))
    for ((name, verdict, hit) <- pairs) {
      val out = df.select(col("raw"),
          Validators.isHit(verdict(col("raw"))).as("a"),
          coalesce(hit(col("raw")), lit(false)).as("b")).collect()
      out.foreach { r =>
        assert(r.getBoolean(1) == r.getBoolean(2),
          s"$name mismatch on '${r.getString(0)}': verdict-hit=${r.getBoolean(1)} predicate=${r.getBoolean(2)}")
      }
    }
  }
}
