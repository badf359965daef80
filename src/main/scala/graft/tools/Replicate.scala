package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf-replica builder (VERDICT r9 item 4, dev tooling): writes an
  * N×-replicated copy of an sf dir so the bench can take one data point
  * past sf0.1 without driver fixtures (sf0.1 × 10 ≈ sf1).
  *
  * Replication offsets every ENTITY key (custkey/orderkey/suppkey/
  * partkey/event_id/doc_id/vec_id, and the FKs that reference them) by
  * r·1e8 per replica r, so per-entity cardinalities and join fan-outs
  * scale linearly instead of colliding; the tiny dims (region, nation)
  * stay unreplicated and FK columns onto them keep their original range
  * — the broadcast-dim join shape is preserved, each replica's facts
  * join the same 25 nations. Document texts get a per-replica suffix so
  * exact-dedup groups don't grow 10× denser than the base corpus
  * (embeddings stay byte-identical per replica — duplicate vectors are
  * realistic crawl noise). Usage:
  *   runMain graft.tools.Replicate <srcSfDir> <outDir> <replicas>
  */
object Replicate {

  private val Off = 100000000L // 1e8 — beyond every fixture key space

  // per-table entity-key columns to offset (FKs onto region/nation kept)
  private val keyCols: Map[String, Seq[String]] = Map(
    "region" -> Seq.empty,
    "nation" -> Seq.empty,
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Replicate <srcSfDir> <outDir> <replicas>")
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((table, keys) <- keyCols) {
      val base = graft.queries.Tables.load(spark, src, table)
      val replicated: DataFrame =
        if (keys.isEmpty) base
        else {
          val reps = (0 until n).map { r =>
            val shifted = keys.foldLeft(base) { (df, k) =>
              df.withColumn(k, col(k) + lit(r * Off))
            }
            if (table == "documents")
              shifted.withColumn("text",
                concat(col("text"), lit(s" r$r")))
            else shifted
          }
          reps.reduce(_ union _)
        }
      replicated.write.mode("overwrite")
        .parquet(s"$out/$table.parquet")
      println(s"[replicate] $table x${if (keys.isEmpty) 1 else n} written")
    }
    spark.stop()
  }
}
