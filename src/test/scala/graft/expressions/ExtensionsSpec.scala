package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExtensionsSpec extends SparkSpec {

  test("custom expressions callable from SQL after registration") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT simhash64(split('the quick brown fox', ' ')) AS sh,
                dot_long(quantize_vec(array(0.5f, -0.5f), 10000.0), array(2L, 2L)) AS d,
                minhash_signature(split('a b c d e', ' '), 2, 4) AS sig""")
      .collect().head
    assert(r.getLong(1) == 0L) // 5000*2 + (-5000)*2
    assert(r.getAs[scala.collection.Seq[Long]]("sig").length == 4)
    // SQL result equals the Column-API result
    val viaColumn = spark.range(1)
      .select(functions.simhash64(split(lit("the quick brown fox"), " ")))
      .collect().head.getLong(0)
    assert(r.getLong(0) == viaColumn)
  }

  test("round-3 expressions callable from SQL: lsh_bucket, min_md5_window, sem_verdict") {
    GraftExtensions.registerAll(spark)
    val r = spark.sql(
      """SELECT lsh_bucket(array(0.5f, -0.25f, 1.0f), 4) AS bk,
                min_md5_window('abcdefghijklmno', 8) AS fp,
                sem_verdict('(201) 334-7135', 'phone').code AS code,
                sem_verdict('(201) 334-7135', 'phone').norm AS norm""")
      .collect().head
    val bkCol = spark.range(1)
      .select(functions.lsh_bucket(array(lit(0.5f), lit(-0.25f), lit(1.0f)), 4))
      .collect().head.getInt(0)
    assert(r.getInt(0) == bkCol)
    val fpCol = spark.range(1)
      .select(functions.min_md5_window(lit("abcdefghijklmno"), 8))
      .collect().head.getString(0)
    assert(r.getString(1) == fpCol)
    assert(r.getInt(2) == 2) // valid-but-formatted
    assert(r.getString(3) == "+12013347135")
  }

  test("lsh_bucket_long callable from SQL, matches the Column builder") {
    GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT lsh_bucket_long(array(5000L, -2500L, 10000L), 4) AS bk")
      .collect().head.getInt(0)
    val viaColumn = spark.range(1)
      .select(functions.lsh_bucket_long(
        array(lit(5000L), lit(-2500L), lit(10000L)), 4))
      .collect().head.getInt(0)
    assert(viaSql == viaColumn)
  }

  test("jaro_winkler callable from SQL, matches the Column builder") {
    GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT jaro_winkler('MARTHA', 'MARHTA') AS jw").collect().head.getDouble(0)
    val viaColumn = spark.range(1)
      .select(JaroWinkler(lit("MARTHA"), lit("MARHTA")))
      .collect().head.getDouble(0)
    assert(viaSql == viaColumn)
    assert(math.abs(viaSql - 0.9611111111111111) < 1e-12) // the textbook pair
    // null propagation through the SQL surface
    assert(spark.sql("SELECT jaro_winkler(NULL, 'x') AS jw")
      .collect().head.isNullAt(0))
  }

  test("round-4+ expressions callable from SQL: ngram_shingle_hashes, count_in_sorted, pq_adc_score, winnow_mins") {
    GraftExtensions.registerAll(spark)

    val nshSql = spark.sql(
      "SELECT ngram_shingle_hashes(split('a b c d e', ' '), 3, true) AS h")
      .collect().head.getAs[scala.collection.Seq[Long]]("h")
    val nshCol = spark.range(1)
      .select(functions.ngram_shingle_hashes(
        split(lit("a b c d e"), " "), 3, distinct = true).as("h"))
      .collect().head.getAs[scala.collection.Seq[Long]]("h")
    assert(nshSql == nshCol && nshSql.length == 3)

    val cisSql = spark.sql(
      "SELECT count_in_sorted(array(3L, 7L, 11L), array(1L, 3L, 5L, 7L, 9L)) AS c")
      .collect().head.getLong(0)
    val cisCol = spark.range(1)
      .select(functions.count_in_sorted(
        array(lit(3L), lit(7L), lit(11L)),
        array(lit(1L), lit(3L), lit(5L), lit(7L), lit(9L))))
      .collect().head.getLong(0)
    assert(cisSql == cisCol && cisSql == 2L)

    val adcSql = spark.sql(
      "SELECT pq_adc_score(array(1, 0), array(10L, 20L, 30L, 40L), 2) AS s")
      .collect().head.getLong(0)
    val adcCol = spark.range(1)
      .select(functions.pq_adc_score(
        array(lit(1), lit(0)), array(lit(10L), lit(20L), lit(30L), lit(40L)), 2))
      .collect().head.getLong(0)
    assert(adcSql == adcCol)

    val winSql = spark.sql(
      "SELECT winnow_mins('abcdefghijklmnopqrst', 5, 4) AS w")
      .collect().head.getAs[scala.collection.Seq[String]]("w")
    val winCol = spark.range(1)
      .select(functions.winnow_mins(lit("abcdefghijklmnopqrst"), 5, 4).as("w"))
      .collect().head.getAs[scala.collection.Seq[String]]("w")
    assert(winSql == winCol && winSql.nonEmpty)
  }

  test("punct_ws_normalize callable from SQL, matches the Column builder") {
    GraftExtensions.registerAll(spark)
    val viaSql = spark.sql(
      "SELECT punct_ws_normalize('  Hello, World 42!  ', false) AS a, " +
        "punct_ws_normalize('  Hello, World 42!  ', true) AS b")
      .collect().head
    assert(viaSql.getString(0) == "hello world 42")
    assert(viaSql.getString(1) == "hello world ##")
    val viaColumn = spark.range(1)
      .select(functions.punct_ws_normalize(lit("  Hello, World 42!  "),
        maskDigits = false))
      .collect().head.getString(0)
    assert(viaSql.getString(0) == viaColumn)
  }

  test("winnow_spans callable from SQL, matches the Column builder") {
    GraftExtensions.registerAll(spark)
    def tup(r: org.apache.spark.sql.Row) =
      (r.getString(0), r.getInt(1), r.getInt(2))
    val viaSql = spark.sql(
      "SELECT winnow_spans('abcdefghijklmnopqrst', 5, 4) AS s")
      .collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("s")
      .map(tup)
    val viaColumn = spark.range(1)
      .select(functions.winnow_spans(lit("abcdefghijklmnopqrst"), 5, 4).as("s"))
      .collect().head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("s")
      .map(tup)
    assert(viaSql == viaColumn && viaSql.nonEmpty)
    assert(viaSql.forall { case (_, lo, hi) => lo >= 1 && hi >= lo })
  }
}
