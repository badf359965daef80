package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** NFC normalization kernel: differential vs java.text.Normalizer over
  * curated + random codepoint soup, fast-path identity, null, and the
  * SQL registration. Every non-ASCII input is spelled as a source-level
  * \u escape so no tool in the chain can silently re-normalize the
  * test data. */
class TextNormSpec extends SparkSpec {

  import spark.implicits._

  private def viaSpark(in: Seq[String]): Seq[String] =
    in.toDF("s")
      .select(functions.nfc_normalize(col("s")).as("n"))
      .as[String].collect().toSeq

  test("differential vs java.text.Normalizer on curated inputs") {
    val curated = Seq(
      "",                      // empty
      "plain ascii text",      // ASCII fast path
      "e\u0301",             // decomposed e + combining acute
      "\u00e9",              // already-composed e-acute: identity
      "A\u030a",             // decomposed A-ring
      "\u1e69",              // s-dot-below-dot-above in NFC
      "s\u0323\u0307",       // its decomposed spelling
      "\ufb01 ligature stays", // NFC does NOT touch compatibility chars
      "\uac00 \u1100\u1161",    // Hangul: composed + conjoining jamo
      "mixed e\u0301 and ascii")
    val got = viaSpark(curated)
    val want = curated.map(Normalizer.normalize(_, Normalizer.Form.NFC))
    assert(got == want)
    // sanity: the decomposed cases actually changed (the test bites)
    assert(curated(2) != want(2) && curated(8) != want(8))
  }

  test("differential vs java.text.Normalizer on random codepoint soup") {
    val rnd = new scala.util.Random(42)
    val pool = ("abc e" + "\u0301\u0323\u0307\u030a" +
      "\u00e9\uac00\u1100\u1161").toCharArray
    val random = Seq.fill(300)(
      String.valueOf(Array.fill(rnd.nextInt(20))(pool(rnd.nextInt(pool.length)))))
    assert(viaSpark(random) ==
      random.map(Normalizer.normalize(_, Normalizer.Form.NFC)))
  }

  test("null propagates; SQL surface registered") {
    GraftExtensions.registerAll(spark)
    val out = spark.sql(
      "SELECT nfc_normalize(CAST(NULL AS STRING)), nfc_normalize('e\u0301')")
      .collect()(0)
    assert(out.isNullAt(0))
    assert(out.getString(1) == "\u00e9")
  }
}
