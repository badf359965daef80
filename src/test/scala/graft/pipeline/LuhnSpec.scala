package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Luhn-verified card redaction: checksum precision (valid scrubbed,
  * off-by-one twin kept), length gating, rebuild fidelity. */
class LuhnSpec extends SparkSpec {

  import spark.implicits._

  test("luhnValid matches the reference implementation on known numbers") {
    val cases = Seq(
      "4532015112830366" -> true,  // Visa 16
      "4532015112830367" -> false, // off-by-one twin
      "379354508162306" -> true,   // Amex 15
      "6011000990139424" -> true,  // Discover 16
      "1234567890123456" -> false,
      "0000000000000" -> true)     // degenerate but mod-10 == 0
    val got = cases.map(_._1).toDF("t")
      .select(Curation.luhnValid(col("t"))).as[Boolean].collect().toSeq
    assert(got == cases.map(_._2))
  }

  test("only Luhn-valid digit runs are redacted; shape and counts exact") {
    val docs = Seq(
      (1L, "pay with 4532015112830366 now"),
      (2L, "order 4532015112830367 shipped"),   // candidate, invalid
      (3L, "short 123456789012 number"),        // 12 digits: not a candidate
      (4L, "two 4532015112830366 and 379354508162306 cards")
    ).toDF("doc_id", "text")
    val out = Curation.redactCreditCards(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(out(0) == ((1L, 1L, 1L, "pay with <CC> now")))
    assert(out(1) == ((2L, 1L, 0L, "order 4532015112830367 shipped")),
      "checksum-invalid candidate must survive")
    assert(out(2) == ((3L, 0L, 0L, "short 123456789012 number")))
    assert(out(3) == ((4L, 2L, 2L, "two <CC> and <CC> cards")))
  }
}
