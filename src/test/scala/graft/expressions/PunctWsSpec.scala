package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PunctWs kernel (the q408 ladder normalizer): differential vs the
  * regex formulation it replaces — trim(collapse(replace(lower(s),
  * non-alnum → space))) (+ digit mask) — over curated edges, fixture
  * text, and random ASCII soup; the documented non-ASCII byte-wise
  * semantics are pinned separately.
  */
class PunctWsSpec extends SparkSpec {

  import spark.implicits._

  private def regexRef(s: String, mask: Boolean): String = {
    val n2 = s.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    if (mask) n2.replaceAll("[0-9]", "#") else n2
  }

  private def viaSpark(in: Seq[String], mask: Boolean): Seq[String] =
    in.toDF("s")
      .select(functions.punct_ws_normalize(col("s"), mask).as("n"))
      .as[String].collect().toSeq

  private val curated = Seq(
    "",
    "   ",
    "!!!",
    "plain ascii text",
    "  leading and trailing  ",
    "UPPER Case MiXeD",
    "punct,marks;everywhere!then--more",
    "digits 123 kept 4ever",
    "a1b2c3",
    "tabs\tand\nnewlines\rcollapse",
    "many     internal      spaces",
    "trailing punct!!!",
    "!leading punct",
    "5tart5 with digit",
    "#already hash 42#")

  test("differential vs the regex formulation on curated ASCII") {
    for (mask <- Seq(false, true))
      assert(viaSpark(curated, mask) == curated.map(regexRef(_, mask)),
        s"mask=$mask")
  }

  test("differential vs the regex formulation on random ASCII soup") {
    val rnd = new scala.util.Random(408)
    val pool =
      "abcXYZ 019 ,.!?-_@#$%^&*()~`'\"\t\n".toCharArray
    val random = Seq.fill(500)(
      String.valueOf(Array.fill(rnd.nextInt(40))(pool(rnd.nextInt(pool.length)))))
    for (mask <- Seq(false, true))
      assert(viaSpark(random, mask) == random.map(regexRef(_, mask)),
        s"mask=$mask")
  }

  test("differential on real fixture texts (both rungs)") {
    val texts = graft.queries.Tables.documents(spark, sf)
      .select(col("text")).as[String].collect().toSeq
    for (mask <- Seq(false, true))
      assert(viaSpark(texts, mask) == texts.map(regexRef(_, mask)),
        s"mask=$mask")
  }

  test("non-ASCII bytes map to spaces (documented byte-wise scope)") {
    // each multibyte codepoint's bytes all become spaces, which the
    // run-collapse merges — equal to the regex result here, and the
    // out-of-scope exotic case (case-folds INTO ascii) is pinned so a
    // future change is a conscious one
    val got = viaSpark(Seq("café menu", "aKb"), mask = false)
    assert(got == Seq("caf menu", "a b"))
  }

  test("null passes through") {
    val got = Seq(null.asInstanceOf[String], "x").toDF("s")
      .select(functions.punct_ws_normalize(col("s"), maskDigits = false))
      .collect()
    assert(got(0).isNullAt(0) && got(1).getString(0) == "x")
  }
}
