package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators (training-data pipeline
  * extensions; BASELINE.json north star).
  *
  * Scale design: every variant is shuffle-minimal —
  *  - exact: one hash-aggregate on a digest (map-side partial agg).
  *  - MinHash+LSH: signatures are a pure per-row projection (array
  *    higher-order functions — no explode, no shuffle); candidate
  *    generation is a self-join on (band, band signature); only candidate
  *    pairs (a tiny fraction of n²) get exact verification. No cross join
  *    ever materializes.
  *  - SimHash: signature per doc via per-row array fold, banded blocking.
  * All hashing is Spark-native (`xxhash64` — codegen'd) — no UDFs.
  */
object Dedup {

  // 31-bit modulus keeps h*a < 2^62 — no int64 overflow under ANSI mode.
  private val Prime = 2147483647L // 2^31 - 1

  /** Two-pass degenerate-bucket cap. A one-pass
    * `groupBy(bucket).agg(collect_list(...)).filter(size <= maxBucket)`
    * bounds the m² pair FAN-OUT but not the aggregation BUFFER: one
    * degenerate bucket (mass near-identical docs, all-zero embeddings)
    * still collects its entire membership into a single buffer before
    * the size filter drops it — an executor OOM at 100× scale. This
    * helper removes oversized buckets BEFORE any list exists: a count
    * aggregate (constant-size partial buffers, map-side combined) finds
    * them, a left-anti join on the bucket key drops their rows. Same
    * pattern as [[IncrementalNearDup.processBatch]]'s running-corpus cap,
    * which got this right first. Callers whose bucket lineage is
    * expensive (MinHash/SimHash signatures) checkpoint `buckets` so the
    * two passes don't run it twice; scan-shaped lineages (quantize)
    * recompute instead of materializing a corpus copy. */
  private[graft] def dropOversizedBuckets(
      buckets: DataFrame, keys: Seq[String], maxBucket: Int): DataFrame = {
    val oversized = buckets.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("bn"))
      .filter(col("bn") > maxBucket)
      .select(keys.map(col): _*)
    buckets.join(oversized, keys, "left_anti")
  }

  /** Exact duplicate groups by content digest. O(n) + one shuffle. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** Exact md5 collapse to min-id representatives — the mandatory first
    * stage of every near-dup JOIN here (VERDICT r10 item 1, default-on):
    * on duplication-dense corpora (the 100 TB web-crawl norm) candidate
    * pairs grow QUADRATICALLY in duplicate density because byte-identical
    * docs collide in every band/bucket/posting — measured 155× wall at
    * 100× data on the sf≈10 replica (SCALE.md "Third scaling decade"),
    * and >100× back when collapsed (q275). Returns
    *
    *   - reps: (doc_id, text, n_dups) — one row per distinct text,
    *     doc_id = the group's min id;
    *   - dupEdges: (rep_id, member_id) — one row per NON-rep member.
    *
    * Scale shape: one md5 hash-agg (map-side combined; the shuffle
    * carries 16-byte digests + ids, never text) and one keyed join back.
    * The group table is localCheckpoint'd — it feeds both outputs and is
    * (digest, id, count)-narrow; on a real cluster persist()/
    * checkpoint(). */
  private[graft] def collapseExactDocs(
      docs: DataFrame, idCol: String, textCol: String)
      : (DataFrame, DataFrame) = {
    val keyed = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"),
      md5(col(textCol)).as("__k"))
    val groups = keyed.groupBy(col("__k"))
      .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("n_dups"))
      .localCheckpoint()
    val joined = keyed.join(groups, "__k")
    val reps = joined.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("text"), col("n_dups"))
    val dupEdges = joined.filter(col("doc_id") =!= col("rep_id"))
      .select(col("rep_id"), col("doc_id").as("member_id"))
    (reps, dupEdges)
  }

  /** Distinct lower-cased whitespace tokens per doc. */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(lower(col(textCol)), "\\s+"))).as("tok"))

  /** (doc_id, band, sig) LSH band buckets per doc — the shared
    * candidate-generation core of [[minhashNearDupPairs]] (batch
    * all-pairs) and [[streamingNearDupCandidates]] (incremental). The
    * signature is one fused codegen'd expression
    * (graft.expressions.MinHashSignature) — ~1000x less per-row
    * overhead than the equivalent 32 x array_min(transform(...)) lambda
    * tree — and works unchanged in a streaming projection. */
  def minhashBuckets(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 4,
      shingleK: Int = 3): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = docs
      .select(col(idCol).as("doc_id"),
        graft.expressions.functions.minhash_signature(
          split(lower(col(textCol)), "\\s+"), shingleK, numHashes).as("sig"))
      .filter(col("sig").isNotNull) // empty docs can't band-collide
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash(slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)).as("sig"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
  }

  /** Incremental near-dup candidacy: band buckets of an ARRIVING doc
    * stream joined against a precomputed static corpus bucket table
    * (stream-static inner joins need no watermark state — the static
    * side is a lookup). Emits (new_id, corpus_id, band) collisions;
    * exact verification and cross-batch dedup belong to the sink's
    * foreachBatch (they need per-batch scope), which is how a corpus
    * absorbs new documents without re-minhashing itself. Works
    * identically on batch inputs (differential-spec'd). */
  def streamingNearDupCandidates(
      stream: DataFrame,
      corpusBuckets: DataFrame, // from [[minhashBuckets]]
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 4,
      shingleK: Int = 3): DataFrame =
    minhashBuckets(stream, idCol, textCol, numHashes, bands, shingleK)
      .withColumnRenamed("doc_id", "new_id")
      .join(corpusBuckets.withColumnRenamed("doc_id", "corpus_id"),
        Seq("band", "sig"))
      .filter(col("new_id") =!= col("corpus_id"))
      .select(col("new_id"), col("corpus_id"), col("band"))

  /** The incremental-corpus near-dup loop, end to end: a foreachBatch
    * sink that, per micro-batch of arriving docs,
    *
    *  1. (default) COLLAPSES the batch against the running digest state
    *     first — an arrival whose md5 matches a digest already seen is
    *     absorbed as a MEMBER of that group (one `kind='dup'`
    *     (rep, member) row, NO bucket join, NO state growth), and
    *     in-batch byte-dups collapse to one min-id rep; only genuinely
    *     fresh texts enter the bucket/token state,
    *  2. absorbs the fresh reps into the running bucket/token state
    *     (so same-batch near-dups are found too),
    *  3. generates candidates = fresh-rep buckets x all rep buckets so
    *     far,
    *  4. verifies them exactly (token Jaccard >= tNum/tDen, normalized
    *     (least, greatest) pairs, deduped within the batch), and
    *  5. hands `onPairs` the batch-twin contract
    *     (kind, a_id, b_id, inter, uni, implied_pairs): `near` rep
    *     pairs (implied_pairs = n_dups(a)·n_dups(b) AS OF this batch —
    *     a later dup arrival is reported as its own dup edge and
    *     inherits its rep's earlier near relations on expansion) and
    *     `dup` membership edges (inter = uni = the rep's distinct-token
    *     count, emitted only for reps that can shingle — the groups the
    *     raw operator could pair at all).
    *
    * This is VERDICT r11 item 2: the same collapse-by-default contract
    * as [[minhashNearDupPairs]], incrementally — a dup-dense arrival
    * stream (the crawl norm) costs O(batch) digest lookups instead of
    * growing every band bucket toward the maxBucket cap and then
    * silently dropping pairs. `collapseExact = false` keeps the raw
    * contract (verified (a_id, b_id, inter, uni) pairs, all-member
    * granularity, running-corpus bucket cap) for corpora already
    * exact-deduped upstream. The two modes write INCOMPATIBLE state
    * dirs (collapse mode adds digests/dcounts tables and keeps only
    * reps in buckets/toks) — rehydration fails fast on a mismatch.
    *
    * Corpus-INTERNAL structure (dup edges / near pairs wholly inside
    * the seed corpus) is never emitted — that is the batch operator's
    * job, run once; this loop reports what each arrival adds.
    *
    * State lives as localCheckpoint'd frames swapped per batch, or —
    * with `stateDir` set — as parquet tables partitioned by batch_id:
    * each batch overwrite-writes ITS OWN partition (idempotent under
    * foreachBatch's at-least-once replay), the corpus seed lives at
    * batch_id=-1, and a fresh instance pointed at the same dir
    * rehydrates instead of re-seeding — restart-safe across JVMs,
    * executor-loss-safe on a cluster (parquet, not driver blocks). The
    * DATAFLOW (never re-minhash the corpus; each batch costs
    * O(batch x collisions)) is identical either way. Verified-pair
    * emission is per-batch exactly-once under AvailableNow; across
    * restarts the sink inherits foreachBatch's at-least-once contract. */
  final class IncrementalNearDup(
      corpusDocs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 4,
      shingleK: Int = 3,
      tNum: Int = 4,
      tDen: Int = 5,
      maxBucket: Int = 1000,
      collapseExact: Boolean = true,
      stateDir: Option[String] = None,
      onPairs: DataFrame => Unit) {

    private val sp = corpusDocs.sparkSession

    private def stateTable(sub: String): DataFrame =
      sp.read.parquet(s"${stateDir.get}/$sub").drop("batch_id")

    /** (text_md5, rep_id, sz, eligible) digest dim for a rep frame —
      * sz = distinct-token count (the dup edge's inter = uni), eligible
      * = the rep can shingle (>= shingleK raw tokens; shorter docs get
      * a null signature, so the raw operator could never pair them). */
    private def digestDim(reps: DataFrame): DataFrame = reps
      .select(md5(col("text")).as("text_md5"), col("doc_id").as("rep_id"),
        split(lower(col("text")), "\\s+").as("__t"))
      .select(col("text_md5"), col("rep_id"),
        size(array_distinct(col("__t"))).cast("long").as("sz"),
        (size(col("__t")) >= shingleK).as("eligible"))

    @volatile private var buckets: DataFrame = _
    @volatile private var toks: DataFrame = _
    // collapse-mode state: digest->rep dim and per-batch digest counts
    // (n_dups(digest) = sum of cnt over batches). In stateDir mode both
    // live as batch_id-partitioned parquet like buckets/toks.
    @volatile private var digS: DataFrame = _
    @volatile private var cntS: DataFrame = _

    stateDir match {
      case Some(dir) =>
        val root = new org.apache.hadoop.fs.Path(s"$dir/buckets")
        val fs = root.getFileSystem(sp.sparkContext.hadoopConfiguration)
        val digRoot = new org.apache.hadoop.fs.Path(s"$dir/digests")
        if (!fs.exists(root)) { // first start: seed from the corpus
          if (collapseExact) {
            val reps = collapseExactDocs(corpusDocs, idCol, textCol)
              ._1.localCheckpoint()
            minhashBuckets(reps, "doc_id", "text", numHashes, bands, shingleK)
              .write.mode("overwrite").parquet(s"$dir/buckets/batch_id=-1")
            tokenArrays(reps, "doc_id", "text")
              .write.mode("overwrite").parquet(s"$dir/toks/batch_id=-1")
            digestDim(reps)
              .write.mode("overwrite").parquet(s"$dir/digests/batch_id=-1")
            corpusDocs.groupBy(md5(col(textCol)).as("text_md5"))
              .agg(count(lit(1)).as("cnt"))
              .write.mode("overwrite").parquet(s"$dir/dcounts/batch_id=-1")
          } else {
            minhashBuckets(corpusDocs, idCol, textCol, numHashes, bands, shingleK)
              .write.mode("overwrite").parquet(s"$dir/buckets/batch_id=-1")
            tokenArrays(corpusDocs, idCol, textCol)
              .write.mode("overwrite").parquet(s"$dir/toks/batch_id=-1")
          }
        }
        require(fs.exists(digRoot) == collapseExact,
          s"state dir $dir was written under collapseExact=${!collapseExact}" +
            " — the two contracts keep incompatible state; use a fresh dir")
        buckets = stateTable("buckets")
        toks = stateTable("toks")
      case None =>
        if (collapseExact) {
          val reps = collapseExactDocs(corpusDocs, idCol, textCol)
            ._1.localCheckpoint()
          buckets = minhashBuckets(reps, "doc_id", "text", numHashes, bands, shingleK)
            .localCheckpoint()
          toks = tokenArrays(reps, "doc_id", "text").localCheckpoint()
          digS = digestDim(reps).localCheckpoint()
          cntS = corpusDocs.groupBy(md5(col(textCol)).as("text_md5"))
            .agg(count(lit(1)).as("cnt")).localCheckpoint()
        } else {
          buckets = minhashBuckets(corpusDocs, idCol, textCol, numHashes, bands, shingleK)
            .localCheckpoint()
          toks = tokenArrays(corpusDocs, idCol, textCol).localCheckpoint()
        }
    }

    /** foreachBatch body — also callable directly on batch frames. */
    def processBatch(batch: DataFrame, batchId: Long): Unit =
      if (collapseExact) processBatchCollapsed(batch, batchId)
      else processBatchRaw(batch, batchId)

    private def processBatchCollapsed(batch: DataFrame, batchId: Long): Unit = {
      val bd = batch.select(col(idCol).as("doc_id"), col(textCol).as("text"),
        md5(col(textCol)).as("text_md5")).localCheckpoint()
      // digest state from batches OTHER than this one — a replayed batch
      // must not see its own earlier partitions, or every doc in it would
      // classify as already-known (the IncrementalCuration.prior
      // discipline); in-memory mode has no restart, the var already
      // holds exactly the prior batches.
      val priorDig = stateDir match {
        case Some(dir) => sp.read.parquet(s"$dir/digests")
          .filter(col("batch_id") =!= batchId).drop("batch_id")
        case None => digS
      }
      val joined = bd
        .join(priorDig, Seq("text_md5"), "left")
        .localCheckpoint() // feeds absorbed, fresh, and the in-batch collapse
      // known digest -> absorbed as a member: a dup edge, no bucket join
      val absorbed = joined.filter(col("rep_id").isNotNull)
        .select(col("rep_id"), col("doc_id").as("member_id"),
          col("sz"), col("eligible"))
      val fresh = joined.filter(col("rep_id").isNull)
        .select(col("doc_id"), col("text"), col("text_md5"))
      // in-batch collapse: struct min (doc_id leads) == min-id rep
      val freshReps = fresh.groupBy(col("text_md5"))
        .agg(min(struct(col("doc_id"), col("text"))).as("__m"))
        .select(col("text_md5"), col("__m.doc_id").as("doc_id"),
          col("__m.text").as("text"))
        .localCheckpoint() // feeds buckets, toks, digest dim
      val freshDim = digestDim(freshReps.select(col("doc_id"), col("text")))
      val inBatchDup = fresh
        .join(freshDim, "text_md5")
        .filter(col("doc_id") =!= col("rep_id"))
        .select(col("rep_id"), col("doc_id").as("member_id"),
          col("sz"), col("eligible"))
      val bCounts = bd.groupBy(col("text_md5")).agg(count(lit(1)).as("cnt"))
      // state update: buckets/toks grow by FRESH REPS ONLY — this is the
      // collapse; a dup-dense stream adds digest rows and counts, never
      // bucket rows
      // freshReps is checkpointed, so the bucket frame derived from it is
      // deterministic — no need to read back a (possibly empty) partition
      val newBuckets = minhashBuckets(freshReps, "doc_id", "text",
        numHashes, bands, shingleK).localCheckpoint()
      stateDir match {
        case Some(dir) =>
          newBuckets
            .write.mode("overwrite").parquet(s"$dir/buckets/batch_id=$batchId")
          tokenArrays(freshReps, "doc_id", "text").write.mode("overwrite")
            .parquet(s"$dir/toks/batch_id=$batchId")
          freshDim.write.mode("overwrite")
            .parquet(s"$dir/digests/batch_id=$batchId")
          bCounts.write.mode("overwrite")
            .parquet(s"$dir/dcounts/batch_id=$batchId")
          buckets = stateTable("buckets")
          toks = stateTable("toks")
        case None =>
          buckets = buckets.union(newBuckets).localCheckpoint()
          toks = toks.union(tokenArrays(freshReps, "doc_id", "text"))
            .localCheckpoint()
          digS = digS.union(freshDim).localCheckpoint()
          cntS = cntS.union(bCounts).localCheckpoint()
      }
      // candidate generation + degenerate-bucket cap, identical to the
      // raw path but over REP buckets — with byte-dups absorbed upstream
      // the cap now only fires on genuinely diverse colliding buckets
      val oversized = buckets.groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBucket)
        .select(col("band"), col("sig"))
      val cand = newBuckets.withColumnRenamed("doc_id", "new_id")
        .join(oversized, Seq("band", "sig"), "left_anti")
        .join(buckets.withColumnRenamed("doc_id", "other_id"), Seq("band", "sig"))
        .filter(col("new_id") =!= col("other_id"))
        .select(least(col("new_id"), col("other_id")).as("a_id"),
          greatest(col("new_id"), col("other_id")).as("b_id"))
        .distinct()
      val nearRaw = verifyJaccard(cand, toks, 0.0)
        .filter(col("inter") * tDen >= col("uni") * tNum)
      // implied_pairs = n_dups(a)·n_dups(b) AS OF this batch (counts
      // include the batch just absorbed); a later member arrival emits
      // its own dup edge and inherits these near relations on expansion
      val nDups = (stateDir match {
        case Some(dir) => sp.read.parquet(s"$dir/dcounts").drop("batch_id")
        case None => cntS
      }).groupBy(col("text_md5")).agg(sum(col("cnt")).as("n_dups"))
      val repDups = (stateDir match {
        case Some(dir) => sp.read.parquet(s"$dir/digests").drop("batch_id")
        case None => digS
      }).select(col("text_md5"), col("rep_id"))
        .join(nDups, "text_md5")
        .select(col("rep_id"), col("n_dups"))
      val near = nearRaw
        .join(repDups.select(col("rep_id").as("a_id"), col("n_dups").as("__na")), "a_id")
        .join(repDups.select(col("rep_id").as("b_id"), col("n_dups").as("__nb")), "b_id")
        .select(lit("near").as("kind"), col("a_id"), col("b_id"),
          col("inter"), col("uni"), (col("__na") * col("__nb")).as("implied_pairs"))
      val dup = absorbed.unionByName(inBatchDup)
        .filter(col("eligible"))
        .select(lit("dup").as("kind"), col("rep_id").as("a_id"),
          col("member_id").as("b_id"), col("sz").as("inter"),
          col("sz").as("uni"), lit(1L).as("implied_pairs"))
      onPairs(near.unionByName(dup))
    }

    private def processBatchRaw(batch: DataFrame, batchId: Long): Unit = {
      val newBuckets0 =
        minhashBuckets(batch, idCol, textCol, numHashes, bands, shingleK)
      val newBuckets = stateDir match {
        case Some(dir) =>
          // overwrite THIS batch's partitions only — replaying a batch
          // after a restart rewrites the same files, never duplicates
          newBuckets0.write.mode("overwrite")
            .parquet(s"$dir/buckets/batch_id=$batchId")
          tokenArrays(batch, idCol, textCol).write.mode("overwrite")
            .parquet(s"$dir/toks/batch_id=$batchId")
          buckets = stateTable("buckets")
          toks = stateTable("toks")
          sp.read.parquet(s"$dir/buckets/batch_id=$batchId")
        case None =>
          val nb = newBuckets0.localCheckpoint()
          buckets = buckets.union(nb).localCheckpoint()
          toks = toks.union(tokenArrays(batch, idCol, textCol)).localCheckpoint()
          nb
      }
      // Same degenerate-bucket cap as the batch twin minhashNearDupPairs:
      // a mass-exact-dup bucket would make this join m² per batch. The
      // cap is measured over the RUNNING corpus state (batch included),
      // so a bucket that crosses maxBucket stops emitting pairs from
      // that point on — exact dups are [[exactGroups]]' job anyway.
      val oversized = buckets.groupBy(col("band"), col("sig"))
        .agg(count(lit(1)).as("bn"))
        .filter(col("bn") > maxBucket)
        .select(col("band"), col("sig"))
      val cand = newBuckets.withColumnRenamed("doc_id", "new_id")
        .join(oversized, Seq("band", "sig"), "left_anti")
        .join(buckets.withColumnRenamed("doc_id", "other_id"), Seq("band", "sig"))
        .filter(col("new_id") =!= col("other_id"))
        .select(least(col("new_id"), col("other_id")).as("a_id"),
          greatest(col("new_id"), col("other_id")).as("b_id"))
        .distinct()
      onPairs(verifyJaccard(cand, toks, 0.0)
        .filter(col("inter") * tDen >= col("uni") * tNum))
    }

    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }

  /** Output assembly shared by the collapsed text near-dup joins
    * ([[minhashNearDupPairs]], [[ngramJaccardPairs]]): rep pairs become
    * `kind='near'` rows carrying `implied_pairs` = n_dups(a)·n_dups(b)
    * (the full member×member cross-pair count WITHOUT materializing it —
    * re-inflating would undo the collapse), and each non-rep member gets
    * one `kind='dup'` (rep, member) row with inter = uni = the rep's set
    * size (identical text ⇒ Jaccard 1) and implied_pairs = 1. Dup rows
    * are restricted to `dupSize`'s reps — the groups the UNCOLLAPSED
    * operator could pair at all (e.g. docs long enough to shingle), so
    * expanding this output reproduces the uncollapsed pair set exactly
    * — PROVIDED no maxBucket/maxPosting cap binds (CollapseDefaultSpec
    * pins the equality on cap-free fixtures). When a cap DOES bind on a
    * dup-dense corpus, the raw run drops oversized buckets (losing
    * pairs) that the collapsed run keeps after reps shrink them, and
    * dup membership edges are emitted unconditionally — so the
    * collapsed output is a recall SUPERSET of the raw one, which is the
    * better answer (CollapseDefaultSpec pins the superset case too). */
  private[graft] def assembleCollapsed(
      nearPairs: DataFrame, // (a_id, b_id, inter, uni) over reps
      nDups: DataFrame, // (doc_id, n_dups)
      dupEdges: DataFrame, // (rep_id, member_id)
      dupSize: DataFrame): DataFrame = { // (doc_id, sz) per eligible rep
    val near = nearPairs
      .join(nDups.select(col("doc_id").as("a_id"), col("n_dups").as("__na")), "a_id")
      .join(nDups.select(col("doc_id").as("b_id"), col("n_dups").as("__nb")), "b_id")
      .select(lit("near").as("kind"), col("a_id"), col("b_id"),
        col("inter"), col("uni"), (col("__na") * col("__nb")).as("implied_pairs"))
    val dup = dupEdges
      .join(dupSize.select(col("doc_id").as("rep_id"), col("sz")), "rep_id")
      .select(lit("dup").as("kind"), col("rep_id").as("a_id"),
        col("member_id").as("b_id"), col("sz").as("inter"),
        col("sz").as("uni"), lit(1L).as("implied_pairs"))
    near.union(dup)
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; pairs are then verified with exact token Jaccard.
    *
    * COLLAPSES exact duplicates first BY DEFAULT ([[collapseExactDocs]] —
    * byte-identical docs collide in every band, so in-bucket pair
    * generation is quadratic in duplicate density; at web-crawl
    * duplication the uncollapsed default was the measured scale-killer).
    * Returns (kind, a_id, b_id, inter, uni, implied_pairs): `near` rep
    * pairs with inter/uni >= threshold, `dup` (rep, member) membership
    * edges. `collapseExact = false` keeps the raw all-pairs core —
    * (a_id, b_id, inter, uni), no kind column — for corpora already
    * exact-deduped upstream (e.g. [[Curation.curationPipeline]] stage 3,
    * which runs its own md5 keep-best at stage 2).
    *
    * Tuning: collision probability for similarity J is
    * 1-(1-J^(numHashes/bands))^bands — pick bands so that candidates
    * below the verify threshold are rare (default 32 hashes / 4 bands of
    * 8 targets J >= ~0.8). */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 4,
      shingleK: Int = 3,
      threshold: Double = 0.8,
      collapseExact: Boolean = true): DataFrame = {
    if (collapseExact) {
      val (reps, dupEdges) = collapseExactDocs(docs, idCol, textCol)
      val near = minhashCore(reps, "doc_id", "text", numHashes, bands,
        shingleK, threshold)
      // dup-edge eligibility = the rep can shingle (>= shingleK RAW
      // tokens — shorter docs produce a null signature and the
      // uncollapsed operator can never pair them, so neither do we);
      // the self-pair's inter/uni is the DISTINCT token count (what
      // verifyJaccard measures).
      val dupSize = reps
        .filter(size(split(lower(col("text")), "\\s+")) >= shingleK)
        .select(col("doc_id"),
          size(array_distinct(split(lower(col("text")), "\\s+")))
            .cast("long").as("sz"))
      return assembleCollapsed(near,
        reps.select(col("doc_id"), col("n_dups")), dupEdges, dupSize)
    }
    minhashCore(docs, idCol, textCol, numHashes, bands, shingleK, threshold)
  }

  private def minhashCore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int,
      bands: Int,
      shingleK: Int,
      threshold: Double): DataFrame = {
    // Checkpointed because the cap's count pass and the collect pass
    // both consume it — the MinHash signature lineage is the expensive
    // part and the bucket rows are tiny (doc_id, band, int sig); on a
    // real cluster this is persist()/checkpoint().
    val buckets = minhashBuckets(docs, idCol, textCol, numHashes, bands, shingleK)
      .localCheckpoint()
    // candidate pairs: drop degenerate buckets FIRST
    // ([[dropOversizedBuckets]] — count + anti-join, so no aggregation
    // buffer ever holds an oversized membership; mass exact-dups are
    // [[exactGroups]]' job anyway), then ONE grouping pass emits
    // in-group combinations (a < b). A self-join here would recompute
    // the whole signature lineage twice — the group-by scans it once.
    val maxBucket = 1000
    val grouped = dropOversizedBuckets(buckets, Seq("band", "sig"), maxBucket)
      .groupBy(col("band"), col("sig"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.as("a_id"), b.as("b_id")))))
    val cand = grouped.select(explode(combos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .distinct()
    verifyJaccard(cand, tokenArrays(docs, idCol, textCol), threshold)
  }

  /** Bucket-occupancy census + run recommendation for a banded LSH
    * index — the planner the ×1000 suffix-replica probe showed the
    * pipeline needs (VERDICT r16 item 3, SCALE.md §Round-16): band
    * buckets saturating the membership cap mean in-bucket candidate
    * emission has gone quadratic in family size, and the right response
    * differs by WHY. Per band, from one occupancy aggregate:
    *
    *  - `n_buckets` / `n_members` / `max_occ`: the occupancy profile;
    *  - `buckets_at_cap` / `mass_at_cap`: how many buckets sit at or
    *    over the cap and how much member mass lives there — the
    *    measured saturation signal;
    *  - `uncapped_pairs` vs `capped_pairs`: projected in-bucket
    *    candidate pairs without and with the cap — the quadratic blowup
    *    the cap is buying down (the 77 GB disk-fill, priced BEFORE the
    *    run instead of discovered during it);
    *  - `recommendation`, integer-exact so both engines agree:
    *     - `run_as_is`    — no bucket reaches the cap;
    *     - `cap_tail`     — saturated mass < 2000 bp of members: the
    *       cap absorbs a thin tail, run with the cap;
    *     - `ladder_first` — saturated buckets average ≥ 2× the cap:
    *       giant near-identical families (re-publication storms) that a
    *       collapse ladder (exact + high-τ near-dup collapse) removes
    *       BEFORE banding — capping alone would silently drop their
    *       true-duplicate pairs;
    *     - `escalate_resplit` — saturation is broad but families are
    *       cap-sized: the banding itself is under-discriminating;
    *       re-split bands (more rows per band) or raise shingle k.
    *
    * Scale shape: occupancy is one (band, bkey) aggregate over the
    * bucket frame; the census is a ≤ #bands-row rollup. Nothing here
    * touches candidate emission — the census runs BEFORE the expensive
    * stage, which is the point.
    *
    * @param buckets (doc_id, band, bkey) — e.g. the q37 production
    *                index's bucket frame
    * @param cap     the in-bucket membership cap the run would use
    */
  def bucketCensus(buckets: DataFrame, cap: Long): DataFrame = {
    require(cap >= 2, s"cap must be >= 2, got $cap")
    val occ = buckets.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("occ"))
    occ.groupBy(col("band"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("occ")).as("n_members"),
        max(col("occ")).as("max_occ"),
        sum(when(col("occ") >= cap, 1L).otherwise(0L))
          .as("buckets_at_cap"),
        sum(when(col("occ") >= cap, col("occ")).otherwise(0L))
          .as("mass_at_cap"),
        sum(expr("occ * (occ - 1) div 2")).as("uncapped_pairs"),
        sum(expr(s"least(occ, ${cap}L) * (least(occ, ${cap}L) - 1) div 2"))
          .as("capped_pairs"))
      .withColumn("sat_bp",
        expr("mass_at_cap * 10000 div greatest(1L, n_members)"))
      .withColumn("recommendation",
        when(col("buckets_at_cap") === 0L, "run_as_is")
          .when(col("sat_bp") < 2000L, "cap_tail")
          .when(expr(s"mass_at_cap div greatest(1L, buckets_at_cap) >= ${2 * cap}L"),
            "ladder_first")
          .otherwise(lit("escalate_resplit")))
      .orderBy(col("band"))
  }

  /** Distinct-token arrays per doc (for set-based verification). */
  def tokenArrays(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      array_distinct(split(lower(col(textCol)), "\\s+")).as("toks"))

  /** Exact token-Jaccard verification for an explicit candidate-pair set:
    * two joins + `array_intersect` per pair (pairs are few post-LSH, so
    * per-pair set math beats a token-explode join — smaller plan, no
    * aggregation). Pure integer output (inter, uni) — oracle-safe. */
  def verifyJaccard(pairs: DataFrame, toksArr: DataFrame, threshold: Double): DataFrame = {
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("long")
    val uni = (size(col("ta")) + size(col("tb"))).cast("long") - inter
    pairs
      .join(toksArr.select(col("doc_id"), col("toks").as("ta")), col("a_id") === col("doc_id"))
      .drop("doc_id")
      .join(toksArr.select(col("doc_id"), col("toks").as("tb")), col("b_id") === col("doc_id"))
      .select(col("a_id"), col("b_id"), inter.as("inter"), uni.as("uni"))
      .filter(col("inter").cast("double") >= col("uni") * threshold)
  }

  /** 64-bit SimHash per doc via the fused custom expression
    * (graft.expressions.SimHash64): token hashes + bit votes in one
    * codegen'd loop. Zero shuffle; one pass. */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.expressions.functions.simhash64(
        split(lower(col(textCol)), "\\s+")).as("simhash"))

  /** Connected components over a near-dup pair graph — the step that
    * turns pairwise matches into dedup GROUPS (pick one doc per
    * component, drop the rest). Min-label propagation:
    * every node starts labeled with its own id; each round, labels flow
    * across edges and every node keeps the minimum seen; stable labels =
    * component ids (the minimum doc_id reachable).
    *
    * Scale shape: per round, one shuffle join of labels×edges (O(E)) and
    * one min-aggregate (O(V+E)); rounds = component diameter, which for
    * near-dup clusters is small. A checkpoint after each round cuts the
    * exponentially-growing iterative lineage. Convergence test:
    * labels only ever decrease, so an unchanged label-sum means a fixed
    * point (one scalar action per round on the checkpointed frame).
    *
    * @param pairs (a_id, b_id) undirected near-dup edges
    * @param nodes (id) every doc, including isolated ones
    * @param checkpointDir when set, per-round frames use RELIABLE
    *   `checkpoint()` into this directory (HDFS/object store on a real
    *   cluster) instead of `localCheckpoint()` — executor loss then
    *   costs a re-read, not the whole iteration history (localCheckpoint
    *   blocks live in executor storage and die with it)
    * @return (id, component) — component = min reachable id
    */
  def components(pairs: DataFrame, nodes: DataFrame, maxIter: Int = 20,
      checkpointDir: Option[String] = None): DataFrame =
    componentsWithStats(pairs, nodes, maxIter, checkpointDir)._1

  /** [[components]] plus the number of propagation rounds actually run —
    * the observable behind the O(log diameter) claim (ScaleBench measures
    * it on a 10M-edge synthetic graph; SCALE.md records the numbers). */
  private[graft] def componentsWithStats(pairs: DataFrame, nodes: DataFrame,
      maxIter: Int = 20,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    val ckpt: DataFrame => DataFrame = Ckpt.fn(pairs, checkpointDir)
    // Two regimes, same fixpoint (the cosineTopKBucketed convention):
    //  - small graph: labels broadcast into every round's join — no
    //    edge exchange happens anyway, so the checkpointed frame is all
    //    we need (cache constants would only slow the fixture down);
    //  - big graph (labels can't broadcast): pre-partition edges ON src
    //    ONCE and persist — InMemoryRelation KEEPS its hashpartitioning
    //    (localCheckpoint under AQE does not: AdaptiveSparkPlanExec
    //    reports Unknown before execution), so each round's sort-merge
    //    join reuses the edge layout and only the propagated label
    //    frame exchanges. O(E) shuffle × rounds saved; plan-gated by
    //    the prop-join spec. Checkpoint FIRST so the regime probe and
    //    the repartition never re-run the (possibly LSH-shaped) pair
    //    lineage.
    val e0 = ckpt(pairs.select(col("a_id").as("src"), col("b_id").as("dst"))
      .union(pairs.select(col("b_id").as("src"), col("a_id").as("dst"))))
    val nEdges = e0.count()
    // Edgeless graph (a clean corpus — every doc its own component):
    // the label loop's sum-fixpoint probe would read sum(empty) = NULL,
    // and there is nothing to iterate anyway.
    if (nEdges == 0)
      return (nodes.select(col("id"), col("id").as("component")), 0)
    val bigGraph = nEdges > 1000000L // past any broadcastable label frame
    val edges = if (bigGraph) e0.repartition(col("src")).persist() else e0
    // Only edge-touched nodes can ever change label — iterate over that
    // subgraph (O(E) per round) and re-attach the isolated majority at
    // the end. For dedup graphs V >> E, so this is the difference
    // between per-round work scaling with the corpus and with the
    // (much smaller) near-dup population.
    var labels = ckpt(edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl")))
    var prevSum = labels.agg(sum(col("lbl"))).head.getLong(0)
    var it = 0
    var done = false
    while (!done && it < maxIter) {
      val prop = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id"), col("lbl"))
      // Pointer doubling: also adopt the label OF the current label
      // (shortcutting), so the min reaches distance 2^round instead of
      // `round` hops — rounds drop from O(diameter) to O(log diameter)
      // (measured: the sf0.1 fixture's longest chain is 9, 10 rounds ->
      // 5). Labels only ever decrease and stay within the component, so
      // the fixpoint is unchanged.
      // Covers every node (labels always point at edge-touched nodes)
      // and l(l(x)) <= l(x), so the plain `labels` frame is redundant in
      // the union.
      val shortcut = labels.toDF("id0", "l0")
        .join(labels.withColumnRenamed("id", "lbl0"),
          col("l0") === col("lbl0"))
        .select(col("id0").as("id"), col("lbl"))
      val next = ckpt(prop.union(shortcut)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl")))
      val s = next.agg(sum(col("lbl"))).head.getLong(0)
      done = s == prevSum
      prevSum = s
      labels = next
      it += 1
    }
    // labels are checkpointed (materialized) — the result no longer
    // reads edges, so the cached blocks can go now.
    if (bigGraph) edges.unpersist(blocking = false)
    (nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("lbl"), col("id")).as("component")),
      it)
  }

  /** EXACT n-gram Jaccard similarity join via prefix filtering (the
    * AllPairs/PPJoin candidate scheme) — the lossless counterpart to the
    * probabilistic MinHash ([[minhashNearDupPairs]]) and SimHash
    * ([[simhashPairs]]) joins: returns EVERY pair of docs whose distinct
    * word-n-gram sets have Jaccard >= tNum/tDen, no recall loss.
    *
    * Prefix filter: sort each doc's n-grams by global frequency (rarest
    * first, ties by value — one total order everywhere); a pair with
    * J >= t must share overlap >= ceil(t*|x|) n-grams, so it must share
    * at least one n-gram inside each side's first
    * |x| - ceil(t*|x|) + 1 ("prefix") — docs only meet through their
    * RAREST n-grams, which is what keeps candidate groups small.
    *
    * Scale shape: one aggregation for the n-gram frequency dim, one
    * shuffle grouping prefix postings, in-group combinations (not a
    * self-join), distinct on the (few) candidate pairs, exact
    * `array_intersect` verify. Everything is integer math — the operator
    * is cross-engine reproducible and its oracle can be the BRUTE-FORCE
    * formulation (prefix filtering is lossless, so the driver gate
    * itself proves the filter drops nothing).
    *
    * Threshold is a rational tNum/tDen so the verify comparison stays in
    * int64 (inter*tDen >= uni*tNum) — no float boundary drift.
    *
    * Tuning: pick `n` so that vocabulary^n far exceeds the corpus's
    * n-gram count, or prefixes cannot be selective and EVERY exact
    * algorithm degenerates toward brute force (measured on the driver
    * fixture's 31-word vocabulary: n=2 gives 6M candidate pairs at 5000
    * docs — half of all pairs — n=3 gives 122k). At 100 TB, `grams` is
    * consumed by three stages (frequency dim, prefix ranking, verify) —
    * persist it instead of recomputing the tokenize+shingle lineage.
    *
    * EAGER: unlike most builders here, calling this method RUNS Spark
    * jobs before returning — the gram frame is localCheckpoint'd (it
    * feeds three stages) and, when `maxPosting > 0`, the max posting
    * size is measured and the call FAILS FAST with the observed fan-out
    * if the vocabulary is too degenerate for prefix filtering. Callers
    * that only want to inspect or compose the plan (never execute it)
    * should pass `maxPosting = 0` knowing the checkpoint still runs, or
    * defer construction until execution time.
    *
    * COLLAPSES exact duplicates first BY DEFAULT ([[collapseExactDocs]];
    * the operator is exact, so oversized buckets can't be dropped — but
    * byte-identical docs square the candidate count through every shared
    * posting, the measured 155× sf≈10 pathology). Returns
    * (kind, a_id, b_id, inter, uni, implied_pairs): `near` rep pairs at
    * Jaccard >= tNum/tDen, `dup` (rep, member) edges with
    * inter = uni = the rep's gram-set size. `collapseExact = false`
    * keeps the raw core — (a_id, b_id, inter, uni), no kind column —
    * for corpora already exact-deduped upstream. */
  def ngramJaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2,
      tNum: Int = 4,
      tDen: Int = 5,
      maxPosting: Int = 100000,
      collapseExact: Boolean = true): DataFrame = {
    if (collapseExact) {
      val (reps, dupEdges) = collapseExactDocs(docs, idCol, textCol)
      val (near, grams) = ngramCore(reps, "doc_id", "text", n, tNum, tDen, maxPosting)
      // dup-edge eligibility = the rep shingles at all (>= n tokens);
      // its self-pair verifies to inter = uni = |gram set|.
      val dupSize = grams
        .select(col("doc_id"), size(col("gs")).cast("long").as("sz"))
      return assembleCollapsed(near,
        reps.select(col("doc_id"), col("n_dups")), dupEdges, dupSize)
    }
    ngramCore(docs, idCol, textCol, n, tNum, tDen, maxPosting)._1
  }

  /** The prefix-filter join over an already-distinct corpus; returns
    * (verified pairs, the checkpointed gram frame) so the collapsed
    * wrapper can derive dup-row sizes without re-shingling. */
  private def ngramCore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      tNum: Int,
      tDen: Int,
      maxPosting: Int): (DataFrame, DataFrame) = {
    require(n >= 1 && tNum > 0 && tNum <= tDen, s"bad n-gram join params: n=$n, t=$tNum/$tDen")
    // Staged projections (memory: q50/q51) — each HOF lambda reads a
    // materialized attribute, never an inline subtree.
    // Short docs are dropped BEFORE the n-gram expression exists (the
    // expensive-predicate pushdown trap); shingles are the fused
    // codegen'd NgramShingles expression (HOF-twin differential-spec'd).
    // The result is localCheckpoint'd because THREE stages consume it
    // (frequency dim, prefix ranking, verify x2) and a Generate over an
    // inline expensive lineage re-evaluates it per exploded element
    // (measured 8.2s -> 0.2s at sf0.1 on the HOF form); on a real
    // cluster this is persist()/checkpoint() of the shingle table.
    // Hash-compress each n-gram to int64 right after shingling: every
    // downstream stage (frequency dim, prefix postings, bucket keys,
    // verify intersections) then shuffles and compares 8-byte longs
    // instead of ~n×word-length strings. Collisions (~m²/2⁶⁵) are the
    // only semantic delta — the q61 oracle is the brute-force STRING
    // join, so the driver gate proves none fired.
    val grams = docs
      .select(col(idCol).as("doc_id"), split(lower(col(textCol)), "\\s+").as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        graft.expressions.functions.ngram_shingle_hashes(col("toks"), n, distinct = true)
          .as("gs"))
      .localCheckpoint()
    val freq = grams.select(explode(col("gs")).as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("freq"))
    // prefix length p = |gs| - ceil(t*|gs|) + 1, integer ceil
    val p = col("sz") - floor((col("sz") * tNum + tDen - 1) / tDen) + 1
    val prefixes = grams
      .select(col("doc_id"), size(col("gs")).as("sz"), explode(col("gs")).as("g"))
      .join(freq, "g")
      .groupBy(col("doc_id"))
      .agg(first(col("sz")).as("sz"),
        sort_array(collect_list(struct(col("freq"), col("g")))).as("ranked"))
      .select(col("doc_id"), col("sz"),
        posexplode(transform(slice(col("ranked"), lit(1), p.cast("int")),
          s => s.getField("g"))))
      .withColumnRenamed("col", "g") // (doc_id, sz, pos, g); pos 0-based
    // Fail fast on degenerate prefix postings instead of silently
    // sliding toward brute force: the operator is exact by contract, so
    // oversized postings cannot be DROPPED (the MinHash/SimHash cap) —
    // but they can be DETECTED for the cost of one count aggregate over
    // the checkpointed shingle lineage (constant-size partial buffers).
    // Candidate pairs grow ~posting² — measured (tuning note above): a
    // 31-word vocabulary at n=2 puts 6M of 5000²/2 pairs through the
    // postings where n=3 yields 122k; at 100 TB that is the job that
    // never finishes, and "raise n" is the fix, not a bigger cluster.
    if (maxPosting > 0) {
      val worst = prefixes.groupBy(col("g")).agg(count(lit(1)).as("pn"))
        .agg(max(col("pn"))).head()
      val biggest = if (worst.isNullAt(0)) 0L else worst.getLong(0)
      require(biggest <= maxPosting,
        s"ngramJaccardPairs: largest prefix posting holds $biggest docs, over the " +
          s"cap $maxPosting — n=$n is too small for this corpus's vocabulary " +
          "(candidate pairs grow with posting²; measured: a 31-word vocab at n=2 " +
          "yields 6M candidate pairs from 5000 docs, n=3 yields 122k). Raise n, " +
          "or raise maxPosting (0 disables) to accept the fan-out")
    }
    // candidate pairs: in-group combinations per prefix posting (one
    // grouping shuffle; a self-join would recompute the ranked lineage
    // twice). No bucket cap: this operator is exact by contract. Two
    // further LOSSLESS prunes run map-side before the distinct
    // (PPJoin-style):
    //  - length filter: J >= t forces t*|a| <= |b| <= |a|/t;
    //  - positional filter: common n-grams all rank at-or-after this
    //    posting in each doc's frequency order, so the overlap is at
    //    most min(sa-pa, sb-pb), which must reach the equivalent-overlap
    //    bound alpha = ceil(t*(sa+sb)/(1+t)). A qualifying pair always
    //    survives through its FIRST shared prefix n-gram (overlap <=
    //    both suffixes there), so dropping failing postings loses
    //    nothing — the q61 oracle is brute force, proving exactly that.
    val grouped = prefixes.groupBy(col("g"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("sz"), col("pos")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.getField("doc_id").as("a_id"), b.getField("doc_id").as("b_id"),
          a.getField("sz").as("sa"), b.getField("sz").as("sb"),
          a.getField("pos").as("pa"), b.getField("pos").as("pb")))))
    val alpha = ceil((col("pr.sa") + col("pr.sb")) * tNum / (tNum + tDen))
    val cand = grouped.select(explode(combos).as("pr"))
      .filter(col("pr.sb") * tNum <= col("pr.sa") * tDen &&
        col("pr.sa") * tNum <= col("pr.sb") * tDen)
      .filter(least(col("pr.sa") - col("pr.pa"), col("pr.sb") - col("pr.pb")) >= alpha)
      .select(col("pr.a_id").as("a_id"), col("pr.b_id").as("b_id"))
      .distinct()
    (verifyJaccard(cand, grams.select(col("doc_id"), col("gs").as("toks")), 0.0)
      .filter(col("inter") * tDen >= col("uni") * tNum), grams)
  }

  /** SimHash near-dup pairs via banded hamming LSH — the step that turns
    * the q38 signatures into an actual dedup operator.
    *
    * The 64-bit signature splits into `bands` equal slices; by
    * pigeonhole, two signatures within hamming distance
    * `maxHamming < bands` agree exactly on at least one slice, so
    * grouping on (band, slice-value) finds every such pair (full recall),
    * and `bit_count(a^b) <= maxHamming` filters band-collision false
    * positives exactly. Same one-pass bucket shape as
    * [[minhashNearDupPairs]]: group per bucket, emit in-group
    * combinations — no self-join (which would recompute the signature
    * lineage twice), degenerate buckets capped.
    *
    * COLLAPSES exact duplicates first BY DEFAULT (same rationale as
    * [[minhashNearDupPairs]]: identical docs share every band slice, so
    * bucket pair fan-out squares in duplicate density). Returns
    * (kind, a_id, b_id, hamming, implied_pairs): `near` rep pairs within
    * maxHamming, `dup` (rep, member) edges at hamming 0.
    * `collapseExact = false` keeps the raw core — (a_id, b_id, hamming),
    * no kind column — for corpora already exact-deduped upstream.
    */
  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int = 4,
      maxHamming: Int = 3,
      maxBucket: Int = 1000,
      collapseExact: Boolean = true): DataFrame = {
    if (collapseExact) {
      val (reps, dupEdges) = collapseExactDocs(docs, idCol, textCol)
      val nd = reps.select(col("doc_id"), col("n_dups"))
      val near = simhashCore(reps, "doc_id", "text", bands, maxHamming, maxBucket)
        .join(nd.select(col("doc_id").as("a_id"), col("n_dups").as("__na")), "a_id")
        .join(nd.select(col("doc_id").as("b_id"), col("n_dups").as("__nb")), "b_id")
        .select(lit("near").as("kind"), col("a_id"), col("b_id"),
          col("hamming"), (col("__na") * col("__nb")).as("implied_pairs"))
      // every doc has a simhash (even a whitespace-only one tokenizes to
      // [""]), so every dup group is eligible: identical text ⇒ identical
      // signature ⇒ hamming 0.
      val dup = dupEdges
        .select(lit("dup").as("kind"), col("rep_id").as("a_id"),
          col("member_id").as("b_id"), lit(0).as("hamming"),
          lit(1L).as("implied_pairs"))
      return near.union(dup)
    }
    simhashCore(docs, idCol, textCol, bands, maxHamming, maxBucket)
  }

  private def simhashCore(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      bands: Int,
      maxHamming: Int,
      maxBucket: Int): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(maxHamming < bands,
      s"full recall needs maxHamming < bands ($maxHamming >= $bands)")
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask)).as("bval"))
    }
    // Checkpointed for the same reason as minhashNearDupPairs: the
    // signature is the expensive lineage, the bucket rows are tiny, and
    // both cap passes consume them.
    val buckets = simhash64(docs, idCol, textCol)
      .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
      .localCheckpoint()
    val grouped = dropOversizedBuckets(buckets, Seq("band", "bval"), maxBucket)
      .groupBy(col("band"), col("bval"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(
          a.getField("doc_id").as("a_id"), b.getField("doc_id").as("b_id"),
          a.getField("simhash").as("ha"), b.getField("simhash").as("hb")))))
    grouped.select(explode(combos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        expr("bit_count(p.ha ^ p.hb)").cast("int").as("hamming"))
      // verify BEFORE the dedup shuffle: band-collision false positives
      // (the bulk, on skewed corpora) die in the map stage and never
      // reach the distinct's exchange.
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Dedup impact report: the cluster-size histogram a curation run
    * publishes after grouping near-dups. Input: a [[components]] output
    * (id, component) and a per-id weight (bytes, tokens — whatever
    * "saved" should be measured in). Per cluster the kept row is the
    * MIN id (the [[components]] label convention), everything else is
    * deduped away; the histogram rolls clusters up by size:
    * (cluster_size, n_clusters, n_docs, w_saved), where w_saved sums
    * the weights of the non-kept members.
    *
    * Scale shape: one shuffle join on id, one per-component hash agg,
    * then a size-keyed agg over component-count rows — output is
    * max-cluster-size rows. Nothing is collected or broadcast. */
  def dedupReport(comp: DataFrame, weights: DataFrame): DataFrame = {
    val per = comp.join(weights, "id")
      .groupBy(col("component"))
      .agg(count(lit(1)).as("cluster_size"),
        sum(col("w")).as("w_total"),
        min_by(col("w"), col("id")).as("w_kept"))
    per.groupBy(col("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("cluster_size")).as("n_docs"),
        sum(col("w_total") - col("w_kept")).as("w_saved"))
  }

  /** Exact substring deduplication — the n-gram-window form of Lee et
    * al. 2021 ("Deduplicating Training Data Makes Language Models
    * Better"): a token run duplicated ANYWHERE in the corpus is removed
    * from every occurrence EXCEPT the globally first one (smallest
    * (doc_id, pos)), and documents are rebuilt without the covered
    * tokens. Duplicated runs longer than `n` are caught as overlapping
    * duplicated n-windows whose coverages merge — the same
    * span-coverage algebra as [[TextAnalysis.decontaminate]], with the
    * "bad window" set derived from the corpus ITSELF instead of a
    * broadcast benchmark.
    *
    * (The suffix-array construction in the paper finds duplicated runs
    * of EXACTLY >= threshold length; the fixed-window form trades that
    * for pure dataflow — windows shorter than n are invisible, runs >=
    * n are found in full, the standard large-scale approximation.)
    *
    * Scale shape: positional window hashes explode to (doc, pos, h) —
    * the shuffle carries 8-byte xxhash64 longs, never gram text (the
    * q112/q115 compression discipline; the q161 oracle joins RAW gram
    * strings, proving it lossless). One hash-keyed agg finds
    * (count, first-occurrence key) per window; only DUPLICATED windows
    * survive the filter, so the join back is keyed and carries the
    * duplicated slice, not the corpus. Per-doc flagged positions
    * collect bounded-by-doc-length lists; coverage + rebuild are
    * in-row folds (binary search per token via count_in_sorted). No
    * broadcast of anything corpus-sized, no driver collect.
    *
    * Masked-position keys pack as doc_id·2²⁰ + pos (ids to ~8·10¹² with
    * 1M-token docs stay inside int64), so "globally first" is one
    * int64 min. */
  def substringDedup(docs: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    require(n >= 2, s"window below 2 tokens is not a run, got $n")
    val t = docs
      .select(col(idCol).as("doc_id"), TextAnalysis.toks(col(textCol)).as("tk"))
      .localCheckpoint() // feeds the window explode AND the rebuild join
    val ek = t
      .select(col("doc_id"), posexplode(
        graft.expressions.functions.ngram_shingle_hashes(
          col("tk"), n, distinct = false)).as(Seq("pos", "h")))
      .withColumn("k", col("doc_id") * 1048576L + col("pos"))
    val dup = ek.groupBy(col("h"))
      .agg(count(lit(1)).as("cnt"), min(col("k")).as("firstk"))
      .filter(col("cnt") >= 2)
      .select(col("h"), col("firstk"))
    val flagged = ek.join(dup, "h")
      .filter(col("k") =!= col("firstk"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
    t.join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("tk"),
        coalesce(col("ps"), array().cast("array<bigint>")).as("ps"))
      .withColumn("cov",
        transform(sequence(lit(0), size(col("tk")) - 1), i =>
          graft.expressions.functions.count_in_sorted(
            sequence(greatest(i - (n - 1), lit(0)), i).cast("array<bigint>"),
            col("ps")) > 0))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_tok"),
        size(filter(col("cov"), c => c)).cast("long").as("n_removed"),
        array_join(transform(
          filter(sequence(lit(0), size(col("tk")) - 1),
            i => !element_at(col("cov"), i + 1)),
          i => element_at(col("tk"), i + 1)), " ").as("cleaned_text"))
  }

  /** Size-tiered list of distinct-digest frames — the LSM / logarithmic-
    * method absorb extracted from [[StreamingCdcDedup]]'s in-memory arm
    * so [[Curation.StreamingIngestGate]] (q458) shares it. Frames live
    * in ascending-size tiers; after an absorb, adjacent tiers within 2×
    * merge (`union.distinct`, localCheckpoint'd once) and a list past
    * `compactK` force-merges its two smallest tiers, so each digest is
    * rewritten O(log n) times over n absorbs and [[frame]] has O(log n)
    * plan leaves (absolute bound `compactK`, not only amortized). */
  private[graft] final class DigestTiers(compactK: Int) {
    require(compactK >= 2, s"compactK must be >= 2, got $compactK")

    @volatile private var tiers: List[(Long, DataFrame)] = Nil

    /** Plan leaves [[frame]] reads — the CdcBatchProbe/spec metric. */
    def leaves: Int = tiers.size

    /** Bare tier union (None before the first absorb). Cross-tier
      * duplicates are possible and harmless for anti-join consumers; a
      * consumer needing exact membership distinct()s on read. */
    def frame: Option[DataFrame] =
      tiers match { case Nil => None; case ts => Some(ts.map(_._2).reduce(_ union _)) }

    /** Insert one distinct-digest frame and re-establish the tier
      * invariant. Dropped tier refs free their checkpoint blocks via
      * ContextCleaner (DataFrame.unpersist would be a no-op —
      * localCheckpoint frames are not CacheManager entries). */
    def absorb(batchDigests: DataFrame): Unit = {
      val bd = batchDigests.localCheckpoint()
      var ts = ((bd.count(), bd) :: tiers).sortBy(_._1)
      def mergeSmallest(): Unit = ts match {
        case (_, a) :: (_, b) :: rest =>
          val m = a.union(b).distinct().localCheckpoint()
          ts = ((m.count(), m) :: rest).sortBy(_._1)
        case _ => ()
      }
      while (ts.size >= 2 && ts(1)._1 <= 2 * ts.head._1) mergeSmallest()
      while (ts.size > compactK) mergeSmallest()
      tiers = ts
    }
  }

  /** Streaming arm of CDC chunk dedup (q446 → VERDICT r15 item 3): the
    * incremental crawl-refresh shape. State is the distinct CHUNK-DIGEST
    * table of everything ingested so far; per micro-batch of arriving
    * docs,
    *
    *  1. fuse-chunk each arrival (`expressions.CdcChunks` — one O(n)
    *     scan per doc, boundaries where the k-char window md5 meets the
    *     mask),
    *  2. census per source: chunk occurrences and bytes,
    *  3. anti-join the digest state: a chunk digest never seen BEFORE
    *     this batch is NOVEL — counted once per (source, digest) with
    *     its storage bytes (same-batch repeats collapse; novelty is
    *     judged against pre-batch state only, so a SQL replay of the
    *     closed batch prefix is exact — the stream≡batch contract),
    *  4. hand `onBatch` the per-source
    *     (batch_id, source, n_chunks, bytes, novel_chunks, novel_bytes,
    *     novel_bp) frame — novel_bp is the batch's real storage-growth
    *     rate: a crawl refresh that re-publishes edited pages adds only
    *     the edited heads' chunks,
    *  5. absorb the batch's digests into state.
    *
    * State is digest-only (16-byte md5 keys + nothing) with two
    * production arms (VERDICT r16 item 2):
    *
    * '''In-memory (default)''' — per-batch distinct-digest frames with
    * SIZE-TIERED COMPACTION (the LSM / logarithmic-method move): frames
    * live in ascending-size tiers; after appending a batch's frame,
    * adjacent tiers within 2× of each other merge (`union.distinct`,
    * localCheckpoint'd once), and any list longer than `compactK` force-
    * merges its two smallest tiers. Each digest is rewritten O(log n)
    * times over n batches and the state union has O(log n) plan leaves —
    * the r16 append-only list was O(batch) to absorb but grew one leaf
    * per batch (`state.reduce(_ union _)` at batch 1000 = a 1000-leaf
    * union, VERDICT r16 "latent scale nit" (a)). The novelty anti-join
    * still runs against the bare tier union (an anti-join needs no
    * distinct-ed right side; cross-tier duplicates are harmless). The
    * round-15 first cut re-distinct'd the WHOLE state per batch and
    * priced the 5M-doc replica at 890 s — super-linear exactly because
    * each batch re-shuffled every digest ever seen; tiering keeps the
    * amortized absorb at O(batch·log n).
    *
    * '''Parquet (`stateDir` set)''' — the restart-safe cluster arm: each
    * absorbed batch writes its distinct digests to
    * `stateDir/batch_id=<label>` (mode=overwrite on the batch's OWN
    * partition path → idempotent under foreachBatch's at-least-once
    * replay); novelty reads the whole directory — ONE columnar scan
    * leaf no matter how many batches, no driver-side plan growth — and
    * a fresh instance over an existing `stateDir` resumes exactly
    * (constructor skips re-seeding when the seed partition exists).
    * [[compactState]] is the offline maintenance job: fold all
    * partitions into one distinct generation when small files
    * accumulate (production would run it out-of-band on a
    * transactional table; here it is explicit, not automatic, so the
    * streaming path never holds a non-atomic delete window).
    *
    * Micro-batch labeling (ADVICE r16): `batchLabel` (optional Column)
    * derives the emitted `batch_id` from the BATCH'S OWN ROWS (e.g.
    * `min((doc_id div 5) % 3)`) instead of trusting the source's
    * batchId sequence — on filesystems with coarse mtime granularity
    * FileStreamSource file order (hence batchId) is unspecified, and
    * q450's oracle compare assumes the data-derived mapping. */
  final class StreamingCdcDedup(
      seedDocs: DataFrame,
      textCol: String,
      k: Int,
      mod: Int,
      onBatch: DataFrame => Unit,
      batchLabel: Option[Column] = None,
      stateDir: Option[String] = None,
      compactK: Int = 8) {
    require(compactK >= 2, s"compactK must be >= 2, got $compactK")

    private def spark = seedDocs.sparkSession

    private def chunks(docs: DataFrame): DataFrame = docs
      .select(col("source"),
        explode(graft.expressions.functions.cdc_chunks(
          col(textCol), k, mod)).as("chunk"))
      .filter(length(col("chunk")) > 0)
      .select(col("source"), md5(col("chunk")).as("h"),
        length(col("chunk")).cast("long").as("b"))

    private def writePart(label: Long, digests: DataFrame): Unit =
      digests.write.mode("overwrite")
        .parquet(s"${stateDir.get}/batch_id=$label")

    // in-memory arm: [[DigestTiers]] seeded with the seed corpus'
    // digests. Parquet arm: seed partition written once, skipped if a
    // prior instance already materialized it (restart).
    private val mem: Option[DigestTiers] = stateDir match {
      case Some(dir) =>
        val seedPath = java.nio.file.Paths.get(
          dir.stripPrefix("file:"), "batch_id=-1")
        if (!java.nio.file.Files.exists(seedPath))
          writePart(-1L, chunks(seedDocs).select(col("h")).distinct())
        None
      case None =>
        val t = new DigestTiers(compactK)
        t.absorb(chunks(seedDocs).select(col("h")).distinct())
        Some(t)
    }

    /** Plan leaves the novelty anti-join reads — O(log n) by the tier
      * invariant in the in-memory arm, constant 1 in the parquet arm.
      * Exposed for the compaction spec. */
    def stateLeaves: Int = mem.map(_.leaves).getOrElse(1)

    private def stateFrame: DataFrame = stateDir match {
      case Some(dir) => spark.read.parquet(dir).select(col("h"))
      case None      => mem.get.frame.get
    }

    /** Offline maintenance for the parquet arm: fold every state
      * partition into one distinct generation under the given label
      * (defaults to the max existing batch_id). Not called by the
      * streaming path — a non-atomic delete/rewrite belongs in an
      * out-of-band job (or a transactional table format), never inside
      * the at-least-once foreachBatch loop. */
    def compactState(label: Option[Long] = None): Unit = stateDir.foreach { dir =>
      val cur = spark.read.parquet(dir)
      val gen = label.getOrElse( // partition col may infer as int
        cur.agg(max(col("batch_id")).cast("long")).head().getLong(0))
      val all = cur.select(col("h")).distinct().localCheckpoint()
      val root = java.nio.file.Paths.get(dir.stripPrefix("file:"))
      val keep = s"batch_id=$gen"
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.list(root).iterator().asScala
        .filter(p => p.getFileName.toString.startsWith("batch_id="))
        .toList.foreach { p =>
          java.nio.file.Files.walk(p).iterator().asScala.toList.reverse
            .foreach(java.nio.file.Files.delete)
        }
      writePart(gen, all)
      require(java.nio.file.Files.exists(root.resolve(keep)))
    }

    /** foreachBatch body — also callable directly on batch frames
      * (the stream≡batch spec drives both paths). */
    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val label = batchLabel.flatMap { e =>
        val r = batch.agg(min(e).cast("long")).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0)) // empty batch
      }.getOrElse(batchId)
      val ch = chunks(batch).localCheckpoint() // census + novelty + absorb
      val census = ch.groupBy(col("source"))
        .agg(count(lit(1)).as("n_chunks"), sum(col("b")).as("bytes"))
      val novel = ch.join(stateFrame, Seq("h"), "left_anti")
        .groupBy(col("source"), col("h")).agg(min(col("b")).as("b"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("novel_chunks"),
          sum(col("b")).as("novel_bytes"))
      val emit = census.join(novel, Seq("source"), "left")
        .withColumn("novel_chunks", coalesce(col("novel_chunks"), lit(0L)))
        .withColumn("novel_bytes", coalesce(col("novel_bytes"), lit(0L)))
        .withColumn("novel_bp",
          expr("novel_bytes * 10000 div greatest(1L, bytes)"))
        .select(lit(label).as("batch_id"), col("source"),
          col("n_chunks"), col("bytes"), col("novel_chunks"),
          col("novel_bytes"), col("novel_bp"))
      onBatch(emit.localCheckpoint())
      // absorb AFTER novelty (pre-batch state judges novelty); ch's
      // checkpoint blocks free via ContextCleaner once this ref drops
      val bd = ch.select(col("h")).distinct()
      if (stateDir.isDefined) writePart(label, bd) else mem.get.absorb(bd)
    }

    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }
}
