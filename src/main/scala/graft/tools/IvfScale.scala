package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** IVF-routed MaxSim nList scaling microbench (VERDICT r14 item 1):
  * measure the q383 production arm at nList ∈ {64, 256, 1024} on the
  * sf replicas, putting numbers behind the "production sizes nList
  * ~ √N and the candidate fraction vanishes" claim the gate fixture
  * (pinned at 64 lists) cannot show. Per (corpus, nList) point:
  *
  *  - build wall: slice assignment of the corpus to its top-1 list —
  *    O(slices × nList) broadcast products, the INDEX cost a
  *    production deployment amortizes across queries;
  *  - query wall: probe routing (top-2 lists/slice) + any-overlap
  *    candidates + q370's integer-micro MaxSim rerank on candidates
  *    + top-5 — the per-query cost that must shrink with nList;
  *  - candidate fraction (bp): mean candidates per probe / corpus;
  *  - recall@5 (bp) vs the brute-force panel (scored ONCE per corpus,
  *    shared by every nList point — q383's 5000 bp spec floor).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.IvfScale <sfDir>
  *   [nList ...]" (default 64 256 1024).
  */
object IvfScale {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: IvfScale <sfDir> [nList ...]")
    val sfDir = args.head
    val nLists =
      if (args.length > 1) args.tail.map(_.toInt).toSeq
      else Seq(64, 256, 1024)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.queries.Pipeline75._

    val emb = quantEmb(spark, sfDir).localCheckpoint()
    val normed = probeNormed(emb)
    val docs = normed.filter(!col("is_probe")).localCheckpoint()
    val probes = normed.filter(col("is_probe")).localCheckpoint()
    val (nDocs, nProbes) = (docs.count(), probes.count())
    println(s"[ivfscale] $sfDir docs=$nDocs probes=$nProbes")

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val wRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("maxsim_micro").desc, col("vec_id").asc)

    // brute-force ground truth, once — every nList point shares it
    val (exactTop, evalWall) = timed {
      maxsimOn(
          docs.select(col("vec_id"))
            .crossJoin(broadcast(probes.select(col("vec_id").as("q_id")))),
          normed)
        .withColumn("rank", row_number().over(wRank))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id"))
        .localCheckpoint()
    }
    println(f"[ivfscale] brute-force panel wall=$evalWall%.1fs " +
      s"(once per corpus, shared)")

    for (nList <- nLists) {
      val cent = coarseCent(emb, nList)
      val (docLists, buildWall) = timed {
        assignSlices(docs, cent, 1)
          .select(col("vec_id"), col("cid").as("cluster")).distinct()
          .localCheckpoint()
      }
      val ((nCandTotal, annTop), queryWall) = timed {
        val routes = assignSlices(probes, cent, 2)
          .select(col("vec_id").as("q_id"), col("cid").as("cluster"))
          .distinct()
        val cands = routes.join(docLists, "cluster")
          .select(col("q_id"), col("vec_id")).distinct()
          .localCheckpoint()
        val top = maxsimOn(cands, normed)
          .withColumn("rank", row_number().over(wRank))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id"))
          .localCheckpoint()
        (cands.count(), top)
      }
      val hits = annTop.join(exactTop, Seq("q_id", "vec_id")).count()
      val fracBp = nCandTotal * 10000 / math.max(1L, nProbes * nDocs)
      val recallBp = hits * 10000 / math.max(1L, nProbes * 5)
      println(f"[ivfscale] nList=$nList%-5d build=$buildWall%7.1fs " +
        f"query=$queryWall%7.1fs candFrac=$fracBp%5d bp " +
        f"recall@5=$recallBp%5d bp")
    }
    spark.stop()
  }
}
