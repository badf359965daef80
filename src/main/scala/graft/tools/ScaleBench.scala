package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Components / PPJoin scale microbench (VERDICT r9 item 6): put numbers
  * behind the O(log diameter) label-propagation claim and the PPJoin
  * posting-guard claim at a scale the driver fixtures can't reach —
  * 1M-node / 10M-edge graphs and a 1M-doc near-dup join, synthesized
  * with `spark.range` column arithmetic (dev tooling, not a gate query:
  * no fixture files, no oracle; correctness is asserted structurally).
  *
  * Graph shape (adversarial on purpose):
  *  - one 100k-node CHAIN (diameter 10^5 — the worst case for naive
  *    propagation: pointer doubling must close it in ~log2(1e5) ≈ 17
  *    rounds, a plain flood would need 10^5);
  *  - 9000 STAR clusters of 100 nodes (the common near-dup shape);
  *  - random extra edges inside a bounded block to reach the edge
  *    budget (parallel edges included — realistic near-dup output).
  *
  * Corpus shape for the PPJoin: twin docs (2j, 2j+1) share 19 of 20
  * tokens from a per-pair vocabulary block → 3-gram Jaccard 17/19 ≈
  * 0.89 ≥ 4/5, so EXACTLY nDocs/2 pairs must come back — a structural
  * correctness check at a scale where the brute-force oracle is
  * impossible.
  *
  * Metrics: wall, rounds, and per-phase shuffle read/write bytes + task
  * peak execution memory, captured via a SparkListener (local[32] —
  * the same task metrics a cluster reports).
  */
object ScaleBench {

  /** Accumulates task metrics between marks. */
  private final class Meter extends SparkListener {
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val peakMem = new java.util.concurrent.atomic.AtomicLong
    val spill = new java.util.concurrent.atomic.AtomicLong
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
        peakMem.updateAndGet(p => math.max(p, m.peakExecutionMemory))
      }
    }
    def snap(): (Long, Long, Long, Long) =
      (shuffleRead.get, shuffleWrite.get, peakMem.get, spill.get)
  }

  private def gb(b: Long): String = f"${b / 1e9}%.2f GB"

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val nNodes = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nEdgeBudget = args.lift(1).map(_.toLong).getOrElse(10000000L)
    val nDocs = args.lift(2).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val meter = new Meter
    spark.sparkContext.addSparkListener(meter)
    import spark.implicits._

    def phase[T](name: String)(body: => T): T = {
      val (r0, w0, _, s0) = meter.snap()
      val t0 = System.nanoTime()
      val out = body
      val wall = (System.nanoTime() - t0) / 1e9
      val (r1, w1, p1, s1) = meter.snap()
      println(f"[scalebench] $name%-28s wall=$wall%8.1fs " +
        s"shuffleRead=${gb(r1 - r0)} shuffleWrite=${gb(w1 - w0)} " +
        s"peakTaskMem=${gb(p1)} spill=${gb(s1 - s0)}")
      out
    }

    // ---- components: 1M nodes, ~10M edges, 100k-diameter chain ----
    val chainN = math.min(100000L, nNodes / 10)
    val starN = (nNodes - chainN) / 100 // clusters of 100
    val chain = spark.range(chainN - 1)
      .select(col("id").as("a_id"), (col("id") + 1).as("b_id"))
    // NB `/` on longs is double division in Spark SQL — `div` keeps the
    // keys integral (a double join key would never match the long nodes)
    val stars = spark.range(starN * 99).select(
      (lit(chainN) + expr("id div 99") * 100).as("a_id"),
      (lit(chainN) + expr("id div 99") * 100 + col("id") % 99 + 1).as("b_id"))
    val used = (chainN - 1) + starN * 99
    // random-ish extra edges INSIDE each star cluster (xxhash64-derived,
    // deterministic): parallel edges + triangles, no new components.
    val extra = spark.range(math.max(0L, nEdgeBudget - used)).select(
      (lit(chainN) + (col("id") % starN) * 100 +
        pmod(xxhash64(col("id")), lit(100))).as("a_id"),
      (lit(chainN) + (col("id") % starN) * 100 +
        pmod(xxhash64(col("id") + 7), lit(100))).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
    val pairs = chain.union(stars).union(extra)
    val nodes = spark.range(nNodes).select(col("id"))

    val (comp, rounds) = phase("components 10M-edge graph") {
      val (c, r) = graft.pipeline.Dedup.componentsWithStats(
        pairs, nodes, maxIter = 30)
      (c.localCheckpoint(), r)
    }
    val nComp = phase("components count") {
      comp.select(col("component")).distinct().count()
    }
    // expected: 1 chain component + starN stars + isolated remainder
    val isolated = nNodes - chainN - starN * 100
    val expected = 1 + starN + isolated
    println(s"[scalebench] rounds=$rounds (chain diameter=$chainN, " +
      s"log2=${(math.log(chainN.toDouble) / math.log(2)).round}) " +
      s"components=$nComp expected=$expected " +
      (if (nComp == expected) "OK" else "MISMATCH"))

    // ---- PPJoin: 1M twin docs, 500k expected pairs ----
    val blk = expr("id div 2") * 20
    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 19).map(t => concat(lit("w"), (blk + t).cast("string"))) :+
        concat(lit("w"), (blk + 19).cast("string"),
          lit("x"), (col("id") % 2).cast("string")): _*).as("text"))
    // collapseExact = false: the twin docs are near- but not byte-
    // identical, so this pins the PPJoin CORE's O(E) claim in isolation;
    // the default's collapse stage is one md5 hash-agg on top
    // (CollapseDefaultSpec covers its equivalence).
    val nPairs = phase("ppjoin 1M twin docs") {
      graft.pipeline.Dedup.ngramJaccardPairs(
        docs, "doc_id", "text", n = 3, tNum = 4, tDen = 5,
        collapseExact = false)
        .count()
    }
    println(s"[scalebench] ppjoin pairs=$nPairs expected=${nDocs / 2} " +
      (if (nPairs == nDocs / 2) "OK" else "MISMATCH"))

    // ---- k-core / HITS on the same 10M-edge graph (GraphOps) ----
    val sym = pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst")))
      .distinct()
    val coreSurvivors = phase("kcore k=3 x4 rounds 10M edges") {
      graft.operators.GraphOps.kcorePeel(sym, kk = 3, rounds = 4).count()
    }
    // chain interior has degree 2 → a 3-core must shed the whole chain;
    // star clusters keep their xxhash64-densified members
    println(s"[scalebench] kcore survivors=$coreSurvivors " +
      s"(nodes=$nNodes chain=$chainN)")
    val hitsRows = phase("hits 2 iters 10M edges") {
      graft.operators.GraphOps.hits(
        pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
          .filter(col("src") < col("dst")).distinct()).count()
    }
    println(s"[scalebench] hits scored vertices=$hitsRows")

    spark.stop()
  }
}
