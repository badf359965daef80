package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q221–q222 pack, plus the KMV sketch
  * mergeability property the set-algebra queries (q181/q197/q200)
  * rely on. */
class Pipeline19Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q221 k-center: 4 distinct picks per label, maximin non-increasing") {
    val out = q("q221_kcenter_coreset")
    val perL = out.groupBy("label")
      .agg(count(lit(1)).as("n"), countDistinct("vec_id").as("d"),
        min(when(col("pick") === 1, col("mind2"))).as("m1"))
    assert(perL.filter(col("n") =!= 4 || col("d") =!= 4 ||
      col("m1") =!= 0).count() === 0)
    // greedy farthest-point: each later pick's maximin distance can't
    // exceed the previous pick's (the selected set only grows)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy("pick")
    val increasing = out.filter(col("pick") >= 2)
      .withColumn("prev", lag(col("mind2"), 1).over(w))
      .filter(col("prev").isNotNull && col("mind2") > col("prev"))
      .count()
    assert(increasing === 0)
  }

  test("q222 NDCG: bounded by 10000 and 10000 iff already ideal order") {
    val out = q("q222_ndcg_eval")
    assert(out.count() > 0)
    assert(out.filter(col("ndcg_bp") > 10000 || col("ndcg_bp") < 0 ||
      col("dcg_micro") > col("idcg_micro")).count() === 0)
  }

  test("KMV sketches merge: sketch(A ∪ B) == top-k(sketch(A) ∪ sketch(B))") {
    // the property q197/q200 build on: the k smallest of a union are a
    // subset of the union of each side's k smallest — verified on the
    // fixture's md5-prefix hash universe split by source parity
    val k = 64
    val sh = graft.queries.Tables.documents(spark, sf)
      .select(col("source"), explode(
        graft.expressions.functions.ngram_shingles(
          split(lower(col("text")), "\\s+"), 3, distinct = true)).as("g"))
      .distinct()
      .select((substring(col("source"), 4, 10).cast("long") % 2)
        .as("side"),
        expr("CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)")
          .as("h"))
      .distinct()
    def topk(df: org.apache.spark.sql.DataFrame) = df
      .select(col("h")).distinct().orderBy(col("h")).limit(k)
    val direct = topk(sh).collect().map(_.getLong(0)).toSet
    val merged = topk(
      topk(sh.filter(col("side") === 0))
        .union(topk(sh.filter(col("side") === 1))))
      .collect().map(_.getLong(0)).toSet
    assert(direct === merged)
  }
}
