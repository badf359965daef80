package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The streaming release gate (VERDICT r14 item 4): q393's wave gate as
  * a real Structured Streaming `foreachBatch` loop over running release
  * state — the shape a 100 TB pipeline actually runs BETWEEN release
  * cuts. A shipped release is state (digest set + per-source token
  * masses + the [[Manifest.IncrementalManifest]] bucket folds);
  * arriving micro-batches gate against it (dup-vs-state → quality floor
  * → benchmark decontamination), kept arrivals are absorbed, and each
  * batch re-solves the epoch waterfill over the union masses and reads
  * the post-batch manifest roots — manifest rows are emitted AS OF
  * their batch (the q331 emission convention).
  *
  * Scale shape: per batch, one scored projection of the arrivals, one
  * digest join against state (digest dim, not corpus), a source-grain
  * mass merge, the ≤ bounded-source-dim waterfill, and the
  * IncrementalManifest's ≤ 256-rows-per-source fold collect. State
  * grows by the batch's distinct digests + the bounded dims only —
  * nothing replays the shipped corpus.
  */
object ReleaseGate {

  /** q392's stopword-density quality scorer (the q384 facet). */
  private[graft] def scored(df: DataFrame): DataFrame = df
    .withColumn("toks",
      TextAnalysis.tokenCount(col("text")).cast("long"))
    .withColumn("score_bp",
      expr("CAST(" +
        "size(filter(split(lower(text), '\\\\s+'), w -> w IN (" +
        "'the','a','of','and','to','in','is','on','for','with'" +
        "))) AS BIGINT) * 10000 div greatest(1L, toks)"))

  /** q384/q392/q393's exact integer epoch waterfill, factored: input
    * (source, t) masses; caps = 1..4 epochs (milli) from md5(source);
    * budget = 2000·Σt milli-token-units; the water level λ located by
    * prefix sums over the cap-sorted bounded source dim (one valid
    * breakpoint segment; all-capped fallback). Returns
    * (source, alloc_milli). */
  private[graft] def waterfillAlloc(masses: DataFrame,
      label: String): DataFrame = {
    val tok = masses
      .withColumn("cap_milli",
        lit(1000L) + lit(1000L) *
          (conv(substring(md5(col("source")), 1, 2), 16, 10)
            .cast("long") % 4))
    val cap = Stats.boundedDim(tok, label, 100000L)
    val tot = cap.agg(sum(col("t")).as("total_t"),
      (sum(col("t")) * 2000L).as("budget"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("cap_milli"), col("source"))
    val wcum = w.rowsBetween(org.apache.spark.sql.expressions
      .Window.unboundedPreceding, 0)
    val cand = cap
      .withColumn("k", row_number().over(w))
      .withColumn("cumct", sum(col("cap_milli") * col("t")).over(wcum))
      .withColumn("cumt", sum(col("t")).over(wcum))
      .withColumn("prevcap",
        coalesce(lag(col("cap_milli"), 1).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("lam",
        expr("(budget - (cumct - cap_milli * t)) div " +
          "(total_t - (cumt - t))"))
    val validLam = cand
      .filter(col("prevcap") <= col("lam") &&
        col("lam") <= col("cap_milli"))
      .orderBy(col("k")).limit(1)
      .select(col("lam"), lit(0L).as("pri"))
    val fallback = cap.agg(max(col("cap_milli")).as("lam"))
      .select(col("lam"), lit(1L).as("pri"))
    val lamf = validLam.union(fallback)
      .orderBy(col("pri")).limit(1).select(col("lam"))
    cap.crossJoin(broadcast(lamf))
      .select(col("source"),
        least(col("cap_milli"), col("lam")).as("alloc_milli"))
  }

  /** Release state + the per-batch gate. Seed once (the shipped
    * release), then [[processBatch]] per arriving micro-batch — or
    * [[start]] to drive it from a real stream via foreachBatch
    * (Trigger.AvailableNow for the bounded-replay gate convention).
    *
    *  - `seedSurvivors` (doc_id, source, text): the shipped release's
    *    kept docs — masses + manifest state;
    *  - `seedDigests` (h): EVERYTHING the shipped release saw (kept or
    *    dropped) — the dup-vs-state set, the q331 absorb semantics;
    *  - `benchDigests` (h): the decontamination dim (static).
    *
    * Emission per arrival: (doc_id, source, verdict, stage, score_bp,
    * alloc_milli, bucket, root, batch_id) with alloc/root AS OF the
    * emitting batch. Duplicate semantics: digest seen by the release,
    * by any earlier batch, or by a smaller-id same-batch arrival.
    * State absorbs ALL arrival digests (seen is seen, kept or not). */
  final class StreamingReleaseGate(
      seedSurvivors: DataFrame,
      seedDigests: DataFrame,
      benchDigests: DataFrame,
      qualityFloorBp: Long = 500L,
      onManifest: DataFrame => Unit) {

    private val inc = new Manifest.IncrementalManifest
    @volatile private var digests: DataFrame = _
    @volatile private var masses: DataFrame = _
    private val bench = benchDigests.localCheckpoint()

    locally {
      inc.processBatch(
        seedSurvivors.select(col("source"), col("doc_id"), col("text")),
        0L)
      digests = seedDigests.select(col("h")).distinct().localCheckpoint()
      masses = scored(seedSurvivors)
        .groupBy(col("source")).agg(sum(col("toks")).as("t"))
        .localCheckpoint()
    }

    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val sc = scored(batch)
        .withColumn("h", md5(col("text")))
        .localCheckpoint() // gates + digest absorb + kept arm
      // within-batch first occurrence: the smallest id owns a digest,
      // later same-digest arrivals in the SAME batch are duplicates
      val firstIds = sc.groupBy(col("h"))
        .agg(min(col("doc_id")).as("__first"))
      val flagged = sc
        .join(digests.select(col("h"), lit(1L).as("__seen")),
          Seq("h"), "left")
        .join(broadcast(bench.select(col("h"), lit(1L).as("__bm"))),
          Seq("h"), "left")
        .join(firstIds, "h")
        .withColumn("stage",
          when(col("__seen").isNotNull ||
            col("doc_id") =!= col("__first"), "duplicate")
            .when(col("score_bp") < qualityFloorBp, "low_quality")
            .when(col("__bm").isNotNull, "contaminated")
            .otherwise(lit("kept")))
        .localCheckpoint() // manifest spine + kept arm + digest absorb
      val kept = flagged.filter(col("stage") === "kept")
      // absorb: masses, manifest folds, then the post-batch readouts
      masses = masses
        .union(kept.groupBy(col("source")).agg(sum(col("toks")).as("t")))
        .groupBy(col("source")).agg(sum(col("t")).as("t"))
        .localCheckpoint()
      inc.processBatch(
        kept.select(col("source"), col("doc_id"), col("text")),
        batchId + 1L)
      val alloc = waterfillAlloc(masses,
        s"release-gate source dim (batch $batchId)")
      val roots = {
        val spark = batch.sparkSession
        import spark.implicits._
        inc.currentRoots().map { case (src, _, root) => (src, root) }
          .toDF("__rsrc", "root")
      }
      val keptCols = kept
        .select(col("doc_id"),
          pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
            lit(":"), col("text"))), 1, 15), 16, 10).cast("long"),
            lit(256L)).as("bucket"),
          col("source").as("__ksrc"))
        .join(broadcast(alloc), col("__ksrc") === alloc("source"))
        .drop("source")
        .join(broadcast(roots), col("__ksrc") === col("__rsrc"))
        .select(col("doc_id"), col("bucket"), col("alloc_milli"),
          col("root"))
      val emit = flagged
        .select(col("doc_id"), col("source"), col("stage"),
          col("score_bp"))
        .join(keptCols, Seq("doc_id"), "left")
        .withColumn("verdict",
          when(col("stage") === "kept", "keep").otherwise(lit("drop")))
        .select(col("doc_id"), col("source"), col("verdict"),
          col("stage"), col("score_bp"), col("alloc_milli"),
          col("bucket"), col("root"),
          lit(batchId).as("batch_id"))
      onManifest(emit.localCheckpoint())
      digests = digests.union(sc.select(col("h"))).distinct()
        .localCheckpoint()
    }

    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }
}
