package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 kernel gate: the fused md5-twin signature expressions
  * (Md5Sig.scala) must be BIT-IDENTICAL to the interpreted HOF
  * formulations they replaced — per doc, over the real fixture corpus
  * (plus edge rows: empty text, repeated tokens, multi-byte chars).
  * The HOF twins below are verbatim copies of the pre-round-17 code in
  * Pipeline.minhashBucketsMd5Over / portableSimhash32 / FuzzyJoin. */
class Md5SigSpec extends SparkSpec {

  private val P = 4294967311L
  private def perms = graft.queries.PipelineTestBridge.minHashPerms

  private def corpus = {
    import spark.implicits._
    graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .union(Seq(
        (9000001L, ""),
        (9000002L, "a a a a"),
        (9000003L, "köln über straße köln"),
        (9000004L, "x"),
        (9000005L, "one two three four five six"))
        .toDF("doc_id", "text"))
  }

  test("md5_minhash_sigs == hash-HOF + perm-min-HOF, per doc") {
    val toks = corpus
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        graft.expressions.functions.ngram_shingles(col("toks"), 3,
          distinct = true).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val hofHs = transform(col("shingles"),
      sh => conv(substring(md5(sh), 1, 8), 16, 10).cast("long"))
    val hof = toks.select(col("doc_id"), hofHs.as("hs"))
      .select(col("doc_id"), array(perms.map { case (a, b) =>
        array_min(transform(col("hs"), h => (h * a + b) % P))
      }: _*).as("sig"))
    val fused = toks.select(col("doc_id"),
      graft.expressions.functions.md5_minhash_sigs(col("shingles"), perms, P)
        .as("sig"))
    val diff = hof.join(fused, "doc_id")
      .filter(!(hof("sig") <=> fused("sig"))).count()
    assert(diff == 0)
    assert(fused.count() > 100)
  }

  test("md5_hash32_array + minhash_over_hashes == HOF twins (q164 shape)") {
    val sh = corpus
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"), graft.expressions.functions
        .ngram_shingles(col("toks"), 3, distinct = true).as("shingles"))
      .filter(size(col("shingles")) > 0)
    val hof = sh.select(col("doc_id"),
      array_distinct(transform(col("shingles"),
        s0 => conv(substring(md5(s0), 1, 8), 16, 10).cast("long"))).as("hs"))
      .select(col("doc_id"), col("hs"), array(perms.map { case (a, b) =>
        array_min(transform(col("hs"), h => (h * a + b) % P))
      }: _*).as("sig"))
    val fused = sh.select(col("doc_id"),
      array_distinct(graft.expressions.functions
        .md5_hash32_array(col("shingles"))).as("hs"))
      .select(col("doc_id"), col("hs"),
        graft.expressions.functions.minhash_over_hashes(col("hs"), perms, P)
          .as("sig"))
    val j = hof.select(col("doc_id"), col("hs").as("h1"), col("sig").as("s1"))
      .join(fused.select(col("doc_id"), col("hs").as("h2"), col("sig").as("s2")),
        "doc_id")
    assert(j.filter(!(col("h1") <=> col("h2")) || !(col("s1") <=> col("s2")))
      .count() == 0)
  }

  test("md5_simhash32 == explode + 33-agg HOF twin (multiset, ties -> 0)") {
    val h = conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long")
    val ones = (0 until 32).map(j =>
      sum(shiftrightunsigned(col("h"), j).bitwiseAND(lit(1L))).as(s"o$j"))
    val sigExpr = (0 until 32).map(j =>
        when(col(s"o$j") * 2 > col("n"), lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
    val hof = corpus
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("tok"))
      .select(col("doc_id"), h.as("h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), ones: _*)
      .select(col("doc_id"), sigExpr.as("simhash"))
    val fused = corpus.select(col("doc_id"),
      graft.expressions.functions.md5_simhash32(
        split(lower(col("text")), "\\s+")).as("simhash"))
    val j = hof.withColumnRenamed("simhash", "s1")
      .join(fused.withColumnRenamed("simhash", "s2"), "doc_id")
    assert(j.count() == corpus.count())
    assert(j.filter(!(col("s1") <=> col("s2"))).count() == 0)
  }

  test("del_signatures == array_distinct(transform(sequence...)) twin") {
    import spark.implicits._
    val names = graft.queries.Tables.customer(spark, sf)
      .select(col("c_name").as("s"))
      .union(Seq("", "a", "aa", "aba", "ünïcodé", "x y").toDF("s"))
    val hof = array_distinct(transform(sequence(lit(0), length(col("s"))),
      i => concat(col("s").substr(lit(1), i),
        col("s").substr(i + 2, length(col("s"))))))
    val d = names.select(col("s"), hof.as("h"),
      graft.expressions.functions.del_signatures(col("s")).as("f"))
    assert(d.filter(!(col("h") <=> col("f"))).count() == 0)
  }
}
