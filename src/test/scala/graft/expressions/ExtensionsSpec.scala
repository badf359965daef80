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
}
