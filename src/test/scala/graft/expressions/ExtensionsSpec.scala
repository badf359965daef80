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
}
