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
    require(args.length >= 3,
      "usage: Replicate <srcSfDir> <outDir> <replicas> [table,table,...]")
    val (src, out, n) = (args(0), args(1), args(2).toInt)
    // optional 4th arg: only these tables (the ×1000 corpus decade needs
    // documents alone — replicating 600M lineitem rows alongside would
    // be wasted disk)
    val only: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").toSet) else None
    // optional 5th arg "salt": per-replica salt on EVERY document token
    // instead of the one-suffix text tag. The suffix keeps exact-dedup
    // density honest but leaves shingle sets ~identical across replicas
    // — at ×1000 every base doc becomes a 1000-member NEAR-dup cluster,
    // band buckets sit exactly at the 1000 cap and candidate pairs go
    // quadratic (measured: the q37 verify shuffle filled a 77 GB disk).
    // Token salting keeps each replica's INTERNAL dup structure (the
    // realistic crawl shape: density constant as the corpus grows)
    // while making replicas textually unrelated.
    val salt = args.length > 4 && args(4) == "salt"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    for ((table, keys) <- keyCols if only.forall(_.contains(table))) {
      val base = graft.queries.Tables.load(spark, src, table)
      val replicated: DataFrame =
        if (keys.isEmpty) base
        else {
          // replica dimension as a crossJoin with range(n), not an
          // n-way union — at ×1000 the union plan chokes Catalyst
          // (1000 children to analyze/codegen) while this stays one
          // narrow operator at any n
          val reps = base.crossJoin(
            base.sparkSession.range(n).select(col("id").as("__r")))
          val shifted = keys.foldLeft(reps) { (df, k) =>
            df.withColumn(k, col(k) + col("__r") * Off)
          }
          (if (table == "documents" && salt)
            shifted.withColumn("text",
              array_join(transform(split(col("text"), " "),
                t => concat(t, lit("~"), col("__r"))), " "))
          else if (table == "documents")
            shifted.withColumn("text",
              concat(col("text"), lit(" r"), col("__r")))
          else shifted).drop("__r")
        }
      replicated.write.mode("overwrite")
        .parquet(s"$out/$table.parquet")
      println(s"[replicate] $table x${if (keys.isEmpty) 1 else n} written")
    }
    spark.stop()
  }
}
