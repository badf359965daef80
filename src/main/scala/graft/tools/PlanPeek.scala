package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dev tool: print the formatted physical plan of ANY SparkEntry query
  * (DumpPlans regenerates PLANS.md for the fixed headline list; this one
  * is for ad-hoc inspection while building an operator).
  *
  * Usage: `sbt "runMain graft.tools.PlanPeek <sfDir> <query> [query ...]"`
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- args.tail)
      println(s"== $n ==\n" + graft.SparkEntry.queries(n)(spark, args.head)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
