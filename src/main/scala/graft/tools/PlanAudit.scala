package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, CartesianProductExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Round-17 whole-tree plan audit (guide §7.2 at tree scale): builds
  * every SparkEntry query's DataFrame and tallies plan-shape signals —
  * shuffle exchanges, join strategies, cartesian products, windows with
  * an empty partition spec (single-partition sorts over data are the
  * classic 100 TB scale-killer) — into one TSV, so optimization targets
  * are chosen from evidence rather than anecdote.
  *
  * Initial (pre-AQE) plans only: the audit never executes the query.
  * Queries whose CONSTRUCTION runs jobs (incremental loops, streaming
  * gates) still run those; plan counts describe the returned frame.
  *
  * Usage: sbt "runMain graft.tools.PlanAudit <sfDir> <out.tsv> [only...]"
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "/tmp/plan_audit.tsv"
    val only = args.drop(2).toSet
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def tally(p: SparkPlan): Map[String, Int] = {
      val m = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      def walk(n: SparkPlan): Unit = {
        n match {
          case _: ShuffleExchangeExec => m("exchange") += 1
          case _: BroadcastHashJoinExec => m("bhj") += 1
          case _: SortMergeJoinExec => m("smj") += 1
          case _: ShuffledHashJoinExec => m("shj") += 1
          case _: CartesianProductExec => m("cartesian") += 1
          case _: BroadcastNestedLoopJoinExec => m("bnlj") += 1
          case w: WindowExec =>
            m("window") += 1
            if (w.partitionSpec.isEmpty) m("window_nopart") += 1
          case a: AdaptiveSparkPlanExec => walk(a.initialPlan)
          case _ => ()
        }
        n.children.foreach(walk)
        n.subqueries.foreach(walk)
      }
      walk(p)
      m.toMap
    }

    val sb = new StringBuilder
    sb ++= "query\texchange\tbhj\tsmj\tshj\tcartesian\tbnlj\twindow\twindow_nopart\terror\n"
    val names = graft.SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    for (n <- names) {
      val row =
        try {
          val df = graft.SparkEntry.queries(n)(spark, sfDir)
          val t = tally(df.queryExecution.executedPlan)
          Seq("exchange", "bhj", "smj", "shj", "cartesian", "bnlj",
            "window", "window_nopart").map(k => t.getOrElse(k, 0))
            .mkString("\t") + "\t"
        } catch {
          case e: Throwable =>
            "\t\t\t\t\t\t\t\t" + e.getMessage.takeWhile(_ != '\n').take(80)
        }
      sb ++= s"$n\t$row\n"
      try spark.catalog.clearCache() catch { case _: Throwable => () }
      try spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      catch { case _: Throwable => () }
    }
    Files.write(Paths.get(out), sb.toString.getBytes(StandardCharsets.UTF_8))
    println(s"[planaudit] wrote $out (${names.size} queries)")
    spark.stop()
  }
}
