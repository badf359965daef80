package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Two-pass global running sum == the window formulation, with the
  * data-bearing windows pid-partitioned (never a single-partition
  * global sort). */
class GlobalCumSumSpec extends SparkSpec {

  import spark.implicits._

  test("differential vs the global window cumsum, multi-partition, desc keys") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 5000).map(i => (i.toLong, rnd.nextInt(100).toLong))
      .toDF("id", "w").repartition(13)
    val got = GlobalCumSum.runningSum(df, col("w"), "cum",
        col("w").desc, col("id"))
      .select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toMap
    val want = df.withColumn("cum", sum(col("w")).over(
        Window.orderBy(col("w").desc, col("id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum"))
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("weights of zero and ties in the secondary key stay exact") {
    val df = Seq((1L, 0L), (2L, 5L), (3L, 0L), (4L, 5L))
      .toDF("id", "w").repartition(3)
    val got = GlobalCumSum.runningSum(df, col("w"), "cum", col("id"))
      .orderBy("id").select("cum").as[Long].collect().toSeq
    assert(got == Seq(0L, 5L, 5L, 10L))
  }

  test("plan: data-bearing window is pid-partitioned; only the offsets window is global") {
    val df = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").cast("long").as("w"))
    val plan = GlobalCumSum.runningSum(df, col("w"), "cum", col("doc_id"))
      .queryExecution.executedPlan.toString
    val windowSpecs = "windowspecdefinition\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(windowSpecs.nonEmpty, s"no window in plan:\n$plan")
    // the data-bearing window orders by __mid and must carry the __pid
    // partition clause; unpartitioned windows may only run over the
    // per-partition totals (ordered by __pid, O(numPartitions) rows)
    val unpartitioned = windowSpecs
      .filter(s => s.contains("__mid")).filterNot(s => s.contains("__pid"))
    assert(unpartitioned.isEmpty,
      s"global window over data rows (single-partition sort):\n$plan")
    assert(plan.contains("rangepartitioning") || plan.contains("REPARTITION_BY_RANGE"),
      s"no range partitioning for the two-pass sum:\n$plan")
  }
}
