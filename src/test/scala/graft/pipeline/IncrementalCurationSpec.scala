package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental curation loop (VERDICT r9 item 3): streamIngest +
  * exact incremental near-dup composed into a foreachBatch pipeline.
  * Equality with the BATCH curationPipeline quality-survivor stage is
  * gate-pinned (q147's oracle is the q136 chain truncated at `qs`);
  * these specs cover what the oracle can't: the real streaming path,
  * read-time retraction, restart-safety, and the posting-cap guard.
  */
class IncrementalCurationSpec extends SparkSpec {

  import spark.implicits._

  // 12 tokens each, quality-passing (length 10..90, the stopword "the"
  // kept AWAY from the mutable edges, distinct tokens, 2..6-char words);
  // every text UNIQUE so exact dedup keeps all and batch order can't
  // matter. Changing ONE edge token flips exactly one of the ten
  // 3-grams (J = 9/11 ≈ 0.818 ≥ 4/5 → near-dup); changing BOTH edges
  // flips two (J = 8/12 ≈ 0.667 < 4/5 → not a pair).
  private val base =
    "alpha the berry canyon delta ember forest garnet harbor indigo jasper koala"
  private def mut(first: String = "alpha", last: String = "koala") =
    s"$first the berry canyon delta ember forest garnet harbor indigo jasper $last"

  private def emptyOld: DataFrame =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")

  private def inc(old: DataFrame = emptyOld, stateDir: Option[String] = None) =
    new Curation.IncrementalCuration(old, "doc_id", "text", "source",
      jacN = 3, jacTNum = 4, jacTDen = 5,
      dup2MaxBp = 10000, top2MaxBp = 10000, dup3MaxBp = 10000,
      stateDir = stateDir)

  private def survivorIds(c: Curation.IncrementalCuration): Set[Long] =
    c.survivors().select("id").collect().map(_.getLong(0)).toSet

  test("a later doc glues two clusters — earlier root retracted at read time") {
    // doc1 and doc5 differ from doc9 in ONE end token each (3-gram
    // J ≈ 0.818 ≥ 4/5) but differ from EACH OTHER in both (J ≈ 0.667):
    // only doc9 connects them. After batch 0, {1, 5} both survive; doc9's
    // arrival merges the clusters under root 1 — doc5 must be RETRACTED,
    // which is exactly why survivors() derives at read time instead of
    // emitting per batch.
    val c = inc()
    c.processBatch(Seq(
      (1L, mut(first = "puma"), "web"),
      (5L, mut(last = "panda"), "web")).toDF("doc_id", "text", "source"), 0L)
    assert(survivorIds(c) == Set(1L, 5L))
    c.processBatch(Seq((9L, mut(), "web")).toDF("doc_id", "text", "source"), 1L)
    assert(survivorIds(c) == Set(1L), "doc5 not retracted after the glue doc")
  }

  test("ingest pre-filter drops unchanged docs; changed/added pass") {
    val changed =
      "river the stone meadow cliff autumn winter summer spring valley breeze ocean"
    val added =
      "quartz a copper nickel silver golden bronze iron plasma carbon helium neon"
    val old = Seq((1L, base, "web"), (2L, "old text of doc two entirely", "web"))
      .toDF("doc_id", "text", "source")
    val c = inc(old = old)
    c.processBatch(Seq(
      (1L, base, "web"),     // unchanged → dropped
      (2L, changed, "web"),  // changed → kept
      (3L, added, "web")     // added → kept
    ).toDF("doc_id", "text", "source"), 0L)
    assert(survivorIds(c) == Set(2L, 3L))
  }

  test("streamed AvailableNow loop equals direct processBatch on the same docs") {
    // vary BOTH edge tokens per doc: pairwise J ≈ 0.667 < 4/5, so no doc
    // pairs with any other and all must survive, in any batch order
    val docs = (0 until 30).map(i =>
      (i.toLong, mut(first = s"w$i", last = s"z$i"),
        if (i % 2 == 0) "web" else "book"))
    val dir = java.nio.file.Files.createTempDirectory("inc_cur_in")
    docs.toDF("doc_id", "text", "source").repartition(3)
      .write.mode("overwrite").parquet(dir.toString)

    val streamed = inc()
    val q = streamed.start(
      spark.readStream.schema(
          spark.read.parquet(dir.toString).schema)
        .option("maxFilesPerTrigger", 1) // force multiple micro-batches
        .parquet(dir.toString))
    q.processAllAvailable()
    q.stop()

    val direct = inc()
    direct.processBatch(docs.toDF("doc_id", "text", "source"), 0L)
    assert(survivorIds(streamed) == survivorIds(direct),
      "streamed micro-batches diverged from the single direct batch")
    // the w$i head tokens keep every pair below threshold except none —
    // sanity: all 30 unique docs survive both paths
    assert(survivorIds(direct).size == 30)
  }

  test("table-backed state survives a restart and replay is idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("inc_cur_state").toString
    val a = inc(stateDir = Some(dir))
    a.processBatch(Seq((1L, mut(first = "one"), "web"))
      .toDF("doc_id", "text", "source"), 0L)

    // "restart": a fresh instance on the same dir must see batch-0 state
    // — the (1,9)-style pair is only findable through persisted postings.
    val b = inc(stateDir = Some(dir))
    b.processBatch(Seq((9L, mut(), "web"))
      .toDF("doc_id", "text", "source"), 1L)
    assert(survivorIds(b) == Set(1L), s"state lost across restart")

    // at-least-once replay of batch 1: partitions overwritten in place —
    // same survivors, same state row counts, no self-anti-join wipeout.
    val pairsBefore = spark.read.parquet(s"$dir/pairs").count()
    val docsBefore = spark.read.parquet(s"$dir/docs").count()
    b.processBatch(Seq((9L, mut(), "web"))
      .toDF("doc_id", "text", "source"), 1L)
    assert(spark.read.parquet(s"$dir/pairs").count() == pairsBefore,
      "replay duplicated or wiped pair state")
    assert(spark.read.parquet(s"$dir/docs").count() == docsBefore,
      "replay duplicated or wiped doc state")
    assert(survivorIds(b) == Set(1L))
  }

  test("posting cap fails fast on a degenerate vocabulary") {
    val sameText = "the aa bb cc the aa bb cc the aa bb cc"
    val c = new Curation.IncrementalCuration(emptyOld,
      "doc_id", "text", "source", maxPosting = 3)
    val batch = (0 until 10).map(i => (i.toLong, sameText + s" t$i", "web"))
      .toDF("doc_id", "text", "source")
    val e = intercept[IllegalArgumentException] { c.processBatch(batch, 0L) }
    assert(e.getMessage.contains("posting"), e.getMessage)
  }
}
