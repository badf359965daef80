package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Detector-disagreement scale microbench (VERDICT r14 item 2): put a
  * measured number behind shipping the collapse-first cell census
  * (q394, `Pipeline80.auditCells`) as the production arm over the
  * pair-grain doc audit (q387, `Pipeline77.auditPairsDocGrain`), on a
  * corpus whose duplicate mass is EXACT — the regime the collapse is
  * for. (The sfrep replicas CANNOT show this: `tools.Replicate`
  * suffixes each copy's text precisely so exact-dup density stays
  * flat, which turns replica families into NEAR-dup mass that no
  * exact collapse may merge — both arms must emit those pairs, and
  * the cell arm's win there is bounded: no re-verify, no pair-grain
  * sort. This harness is the dup-dense complement, the PHashScale
  * pattern.)
  *
  * Corpus shape: `nDistinct` distinct ~32-token md5-synthesized docs
  * (token sets effectively random, so distinct docs never near-collide
  * in either detector); every `famEvery`-th doc becomes a byte-
  * identical family of `famSize` copies — routine crawl duplication.
  * Doc grain must emit C(famSize, 2) verified `both` pairs per family
  * (identical docs collide in every band of both detectors);
  * collapse-first reduces each family to one rep and emits NOTHING
  * for it (within-group pairs are trivially `both` — zero calibration
  * information, exactly the mass the cell census refuses to pay for).
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.DisagreeScale
  *   [nDistinct] [famEvery] [famSize]"; prints both walls + output
  * accounting and asserts the doc-grain pair census equals
  * Σ C(famSize, 2) — every emitted pair is within-family, so the cell
  * arm's empty census loses nothing but the trivial mass.
  */
object DisagreeScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nDistinct = args.headOption.map(_.toInt).getOrElse(50000)
    val famEvery = args.lift(1).map(_.toInt).getOrElse(10)
    val famSize = args.lift(2).map(_.toInt).getOrElse(50)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // doc j: famSize copies when j % famEvery == 0, else 1; 32 random-
    // looking 6-hex tokens per doc keyed on (j, position)
    val corpus = spark.range(nDistinct.toLong)
      .select(col("id").as("j"),
        when(col("id") % famEvery === 0, lit(famSize)).otherwise(lit(1))
          .as("nc"))
      .select(col("j"), explode(sequence(lit(0), col("nc") - 1)).as("c"))
      .select((col("j") * 100000L + col("c")).as("doc_id"),
        array_join(transform(sequence(lit(0), lit(31)),
          i => substring(md5(concat(col("j"), lit(":"), i)), 1, 6)), " ")
          .as("text"))
      .localCheckpoint() // both arms read it; exclude gen cost

    val nFam = (nDistinct + famEvery - 1) / famEvery
    println(s"[disagreescale] nDistinct=$nDistinct families=$nFam" +
      s" x$famSize rows=${corpus.count()}")

    def phase(name: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val out = body
      println(f"[disagreescale] $name%-28s wall=${(System.nanoTime() - t0) / 1e9}%8.1fs rows=$out")
      out
    }

    var cellImplied = 0L
    val cellRows = phase("cells (q394 shape)") {
      val cells = graft.queries.Pipeline80.auditCells(corpus)
        .agg(count(lit(1)), sum(col("implied_pairs"))).head()
      cellImplied = if (cells.isNullAt(1)) 0L else cells.getLong(1)
      cells.getLong(0)
    }
    val docPairs = phase("doc grain (q387 shape)") {
      graft.queries.Pipeline77.auditPairsDocGrain(corpus).count()
    }
    // accounting: every within-family pair is guaranteed 'both' mass
    // at doc grain (identical docs collide in every band of both
    // detectors; family buckets of famSize sit far under the cap), so
    // doc-grain output is AT LEAST families x C(famSize, 2); the
    // residual is cross-content signature noise — the calibration
    // signal — which the cell arm carries expanded in implied_pairs
    // (not exactly equal: at doc grain the 8-bit SimHash buckets run
    // famSize x denser and can hit the 1000 cap the rep grain stays
    // under).
    val withinFam = nFam.toLong * famSize * (famSize - 1) / 2
    println(s"[disagreescale] doc-grain pairs=$docPairs withinFam=" +
      s"$withinFam cross=${docPairs - withinFam} | cells=$cellRows " +
      s"implied=$cellImplied")
    assert(docPairs >= withinFam,
      s"doc-grain audit emitted $docPairs pairs, expected >= $withinFam")
    spark.stop()
  }
}
