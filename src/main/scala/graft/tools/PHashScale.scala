package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** dHash near-dup scale microbench (VERDICT r12 item 1): put a measured
  * number behind the collapse-by-default claim for the perceptual-hash
  * band join, on a duplication-dense corpus the driver fixtures can't
  * reach (dev tooling, not a gate query — correctness is asserted
  * structurally via the expansion identity).
  *
  * Corpus shape (the 100 TB web-crawl norm, adversarial on purpose):
  * `nDistinct` distinct payloads, of which one is repeated `nHot` times
  * (the n-way duplicate-image group — a shared fingerprint collides in
  * ALL 4 Hamming bands, so the raw band join emits ~4·nHot²/2 rows
  * before distinct) and a fraction carry 4 copies each (routine
  * duplication mass). Texts are synthesized with spark.range column
  * arithmetic — no files.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PHashScale
  *   [nDistinct] [nHot]"; prints wall + output accounting for
  * collapsed vs raw, and the expansion identity
  *   raw_pairs == Σ C(n_dups, 2) + Σ near implied_pairs.
  */
object PHashScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDistinct = args.headOption.map(_.toInt).getOrElse(100000)
    val nHot = args.lift(1).map(_.toInt).getOrElse(2000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // distinct payload j: 1 copy; j % 20 == 1: 4 copies; j == 0: nHot
    // copies. ids = j * 100000 + c (c < nHot fits for the hot group).
    val media = spark.range(nDistinct.toLong)
      .select(col("id").as("j"),
        when(col("id") === 0L, lit(nHot))
          .when(col("id") % 20 === 1, lit(4)).otherwise(lit(1)).as("nc"))
      .select(col("j"), explode(sequence(lit(0), col("nc") - 1)).as("c"))
      .select((col("j") * 100000L + col("c")).as("id"),
        concat(lit("synthetic media payload "), col("j"),
          lit(" body")).as("text"),
        lit(0L).as("sh"))
      .localCheckpoint() // both formulations read it; exclude gen cost

    def phase(name: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[phashscale] $name%-34s wall=${(System.nanoTime() - t0) / 1e9}%8.1fs rows=$out")
      out
    }

    println(s"[phashscale] nDistinct=$nDistinct nHot=$nHot " +
      s"rows=${media.count()}")
    var collapsed: org.apache.spark.sql.DataFrame = null
    phase("collapsed (dhashNearDup)") {
      // construction is part of the cost: dhashNearDup eagerly
      // checkpoints the fingerprint projection and the fp groups
      collapsed = graft.pipeline.PHash.dhashNearDup(media)
        .localCheckpoint()
      collapsed.count()
    }
    val acct = collapsed
      .agg(sum(when(col("kind") === "near", col("implied_pairs"))
        .otherwise(lit(0L))).as("near_implied"),
        sum(when(col("kind") === "dup", lit(1L)).otherwise(lit(0L)))
          .as("dup_edges")).head()
    // within-group implied pairs from the known group sizes
    val hotPairs = nHot.toLong * (nHot - 1) / 2
    val fourPairs = ((nDistinct - 2) / 20 + 1).toLong * 6 // C(4,2) per 4-copy group
    val rawPairs = phase("raw (uncollapsed band join)") {
      graft.pipeline.PHash.dhashNearDupRaw(media).count()
    }
    val expected = hotPairs + fourPairs + acct.getLong(0)
    println(s"[phashscale] expansion identity: raw=$rawPairs expected=" +
      s"$expected (hot=$hotPairs four=$fourPairs nearImplied=" +
      s"${acct.getLong(0)} dupEdges=${acct.getLong(1)}) " +
      (if (rawPairs == expected) "OK" else "MISMATCH"))
    spark.stop()
  }
}
