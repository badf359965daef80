package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Corpus-curation operators for a training-data pipeline: deterministic
  * stratified sampling, training-sequence packing, and rule-based quality
  * filtering (Gopher-style heuristics).
  *
  * Scale notes (100 TB):
  *   - `stratifiedSample` is a pure projection + filter — zero shuffle,
  *     fully codegen'd, and reproducible across runs/engines because the
  *     keep decision hashes the row KEY (md5), never `rand()`.
  *   - `packSequences` is one window per stratum (`partitionBy(strata)`),
  *     so parallelism = number of strata; packing giant single strata
  *     should pre-split by a hash salt first (same trick as Skew).
  *   - `qualityFlags` is a projection; all thresholds compare integers
  *     (`n_stop * 100 >= n_tok`) so no float drift across engines.
  */
object Curation {

  /** Uniform [0,100) bucket from the md5 of `key` + `salt` — the same
    * portable construction as q57's split assignment; the salt decouples
    * independent sampling decisions made from the same key. */
  def md5Bucket(key: Column, salt: String): Column =
    conv(substring(md5(concat(key.cast("string"), lit(":" + salt))), 1, 8), 16, 10)
      .cast("long") % 100

  /** Deterministic stratified sampling: keep a row iff its md5 bucket is
    * below the stratum's configured percentage. Unknown strata fall back
    * to `defaultRate`. Keeps are stable under re-runs, retries, and
    * engine changes — a requirement for reproducible training mixes. */
  def stratifiedSample(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      rates: Map[String, Int],
      defaultRate: Int,
      salt: String): DataFrame = {
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (k, r)) =>
      when(col(strataCol) === k, lit(r)).otherwise(acc)
    }
    df.withColumn("bucket", md5Bucket(col(keyCol), salt))
      .withColumn("rate", rate)
      .filter(col("bucket") < col("rate"))
  }

  /** Training-sequence packing: concatenate documents per stratum in key
    * order and cut the stream into `budget`-token bins; each doc is
    * assigned the bin its START offset falls in. One cumulative-sum
    * window per stratum; no data movement beyond the per-stratum shuffle.
    * PRECONDITION: `keyCol` must be unique within each stratum (like the
    * sortedness note on count_in_sorted) — the cumulative window orders
    * by it, so duplicate keys would make cum_tok/bin_id assignment
    * tie-nondeterministic across runs and engines. Every caller passes
    * a document id. */
  def packSequences(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      nTokCol: String,
      budget: Int): DataFrame = {
    val w = Window.partitionBy(col(strataCol)).orderBy(col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tok", sum(col(nTokCol)).over(w))
      .withColumn("bin_id",
        floor((col("cum_tok") - col(nTokCol)) / lit(budget.toDouble)).cast("long"))
  }

  /** Data-mixture rebalancing: compute a per-stratum keep RATE from a
    * per-stratum token budget (rate% = budget·100 / stratum_tokens,
    * capped at 100), then apply it with the same md5-bucket rule as
    * [[stratifiedSample]]. Two keyed aggregations + a broadcast of the
    * per-stratum rates (strata cardinality, not corpus) + a zero-shuffle
    * filter — the standard "equalize language shares" step before
    * training. The keep rate is the floor of the same IEEE quotient
    * both engines compute (budget·100.0 / stratum_tokens — exact for
    * budgets below ~2^46; the DuckDB twin mirrors the float divide),
    * and the bucket rule is pure integers, so the sampled set is
    * engine-exact and stable under re-runs. */
  def rebalanceMixture(
      df: DataFrame,
      keyCol: String,
      strataCol: String,
      nTokCol: String,
      budgetTokens: Long,
      salt: String): DataFrame = {
    val totals = df.groupBy(col(strataCol))
      .agg(sum(col(nTokCol)).as("stratum_tokens"))
      .withColumn("rate",
        least(lit(100L), floor(lit(budgetTokens) * 100.0 / col("stratum_tokens"))
          .cast("long")))
    df.join(broadcast(totals), strataCol)
      .withColumn("bucket", md5Bucket(col(keyCol), salt))
      .filter(col("bucket") < col("rate"))
  }

  /** Deterministic weighted sampling WITHOUT replacement via priority
    * sampling (Duffield, Lund & Thorup, "Priority sampling for
    * estimating arbitrary subset sums", JACM 54(6), 2007): each row
    * draws a uniform u ∈ [1, 2³²] from the md5 of its key (+salt), gets
    * integer priority `(w · 2³²) div u`, and the `k` highest-priority
    * rows are the sample (ties break on the key for a total order).
    * Inclusion probability rises with weight exactly as the estimator
    * prescribes, and every step is integer math on a portable hash — the
    * sample is reproducible across runs, engines, partitionings and
    * retries (q111 replays it in DuckDB; `rand()`-based weighted
    * sampling is none of those things).
    *
    * Scale shape: one zero-shuffle projection, then a distributed top-k
    * (TakeOrderedAndProject: per-partition heaps of k, k rows to the
    * final) — the corpus is scanned once and never shuffled.
    *
    * Weights must be in [0, 2³¹) — larger would overflow w·2³², which
    * ANSI mode turns into a loud error (pre-scale such weights down;
    * sampling only uses their ratios). w = 0 rows get priority 0 and are
    * only picked if fewer than k positive-weight rows exist. */
  def prioritySample(
      df: DataFrame,
      keyCol: String,
      weightCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, s"sample size must be positive, got $k")
    val u = conv(substring(md5(concat(col(keyCol).cast("string"), lit(":" + salt))),
      1, 8), 16, 10).cast("long") + 1
    df.select(col(keyCol).as("key"), col(weightCol).cast("long").as("w"), u.as("u"))
      // integer div, not `/` (double division would lose exactness past
      // 2^53 — priorities reach w·2³²)
      .withColumn("priority", expr("(w * 4294967296L) div u"))
      .drop("u")
      .orderBy(col("priority").desc, col("key"))
      .limit(k)
  }

  /** Train/eval split-leakage audit: for every NON-train document, how
    * many train documents share at least one word n-gram with it, and
    * how many (doc, train-doc, shingle) hits there are in total. Zero
    * for a clean split. The shingle side carries fused xxhash64 longs
    * (never the n-gram strings), the join is keyed on the hash, and
    * every non-train doc is kept via the left join — the same dataflow
    * as the benchmark-contamination audit, pointed at the split.
    *
    * Scale: shuffles are keyed on shingle hash then doc_id; a stopword-
    * like degenerate shingle would fan out — callers with adversarial
    * corpora should pre-cap bucket sizes like the near-dup path does. */
  def splitLeakage(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int,
      splitCol: String,
      trainTag: String): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"), col(splitCol).as("split"),
      explode(graft.expressions.functions.ngram_shingle_hashes(
        TextAnalysis.toks(col(textCol)), n, distinct = true)).as("h"))
    val tr = sh.filter(col("split") === trainTag)
      .select(col("h"), col("doc_id").as("train_id"))
    val te = sh.filter(col("split") =!= trainTag)
      .select(col("doc_id"), col("h"))
    val hits = te.join(tr, "h")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("train_id")).as("n_train_docs"),
        count(lit(1)).as("n_shared_shingles"))
    docs.filter(col(splitCol) =!= trainTag)
      .select(col(idCol).as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_train_docs"), lit(0L)).as("n_train_docs"),
        coalesce(col("n_shared_shingles"), lit(0L)).as("n_shared_shingles"))
  }

  /** Per-group percentile rank of a score, in basis points — the
    * "filter the bottom X% PER LANGUAGE" primitive (per-group
    * thresholds, the CCNet convention: a global cutoff would gut
    * low-resource strata). pct_bp = floor((rank − 1) · 10⁴ / (n − 1))
    * over the total order (score, id) within each group; singleton
    * groups get 0.
    *
    * Scale shape: a `Window.partitionBy(group)` rank would funnel each
    * group through ONE task — a hot spot when groups are corpus-scale
    * (a handful of languages over 100 TB). Instead the global two-pass
    * rank ([[graft.operators.GlobalRank.rowNumber]] on (group, score,
    * id): range partition + broadcast prefix offsets) ranks ACROSS
    * groups with full parallelism, and per-group ranks fall out by
    * subtracting each group's broadcast offset (groups-cardinality
    * frame; its cumulative window is over group names, not rows).
    * Engine-exact: ranks are integers from a total order, the bp ratio
    * is the floor of the same IEEE quotient both engines compute. */
  def groupPercentileRank(
      df: DataFrame,
      groupCol: String,
      scoreCol: String,
      idCol: String): DataFrame = {
    val ranked = graft.operators.GlobalRank.rowNumber(
      df.select(col(groupCol).as("grp"), col(scoreCol).as("score"),
        col(idCol).as("id")),
      "grn", col("grp"), col("score"), col("id"))
    val counts = ranked.groupBy(col("grp")).agg(count(lit(1)).as("n_grp"))
      .withColumn("grp_offset", coalesce(sum(col("n_grp")).over(
        Window.orderBy(col("grp")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    ranked.join(broadcast(counts), "grp")
      .select(col("grp"), col("id"), col("score"),
        (col("grn") - col("grp_offset")).as("rank_in_grp"),
        col("n_grp"),
        when(col("n_grp") > 1,
          floor((col("grn") - col("grp_offset") - 1) * 10000 / (col("n_grp") - 1))
            .cast("long"))
          .otherwise(0L).as("pct_bp"))
  }

  /** CCNet-style LM-score bucketing (Wenzek et al. 2020, "CCNet:
    * Extracting high quality monolingual datasets from web crawl
    * data"): documents are percentile-ranked PER SOURCE by a language-
    * model quality score and split head/middle/tail at the given
    * basis-point cuts — the per-language perplexity-tercile filter,
    * re-expressed over any score where HIGHER is better (e.g. the q117
    * Stupid-Backoff mean log-prob; CCNet's perplexity ranks the other
    * way, so flip the score sign to use it directly).
    *
    * Scale shape: one join to attach the source, then the
    * [[groupPercentileRank]] two-pass (GlobalRank + broadcast group
    * offsets — no one-task-per-source window); the bucket CASE is a
    * projection. Ties rank by (score, doc_id), so buckets are
    * deterministic in any engine. Output: (source, doc_id, score,
    * pct_bp, bucket). */
  def lmQualityBuckets(scores: DataFrame, // (doc_id, score)
      srcOf: DataFrame,                   // (doc_id, source)
      headBp: Int = 6667, midBp: Int = 3333): DataFrame = {
    require(0 <= midBp && midBp <= headBp && headBp <= 10000,
      s"need 0 <= midBp <= headBp <= 10000, got $midBp/$headBp")
    groupPercentileRank(
        scores.join(srcOf, "doc_id"), "source", "score", "doc_id")
      .select(col("grp").as("source"), col("id").as("doc_id"),
        col("score"), col("pct_bp"),
        when(col("pct_bp") >= headBp, "head")
          .when(col("pct_bp") >= midBp, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Gopher-style quality gates over whitespace tokens, all-integer
    * comparisons (threshold * denominator vs numerator * scale):
    *   - ok_len:  10 <= n_tok <= 90
    *   - ok_wl:   3 <= mean word length <= 10  (sum_len vs 3/10 * n_tok)
    *   - ok_stop: stopword ratio >= 1%         (n_stop * 100 >= n_tok)
    *   - ok_rep:  distinct ratio >= 40%        (n_distinct * 10 >= n_tok * 4)
    * Returns struct(n_tok, sum_tok_len, n_stop, n_distinct, ok_len, ok_wl,
    * ok_stop, ok_rep, keep, reason) where reason is the FIRST failing rule. */
  def qualityFlags(text: Column): Column = {
    val toks = TextAnalysis.toks(text)
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nStop = TextAnalysis.stopwordCount(text).cast("long")
    val nDistinct = TextAnalysis.distinctTokenCount(text).cast("long")
    val okLen = nTok >= 10 && nTok <= 90
    val okWl = sumLen >= nTok * 3 && sumLen <= nTok * 10
    val okStop = nStop * 100 >= nTok
    val okRep = nDistinct * 10 >= nTok * 4
    struct(
      nTok.as("n_tok"), sumLen.as("sum_tok_len"),
      nStop.as("n_stop"), nDistinct.as("n_distinct"),
      okLen.as("ok_len"), okWl.as("ok_wl"),
      okStop.as("ok_stop"), okRep.as("ok_rep"),
      (okLen && okWl && okStop && okRep).as("keep"),
      when(!okLen, "len").when(!okWl, "word_len")
        .when(!okStop, "stopword").when(!okRep, "repetition")
        .otherwise("").as("reason"))
  }

  /** The composed quality-filter stack: the [[qualityFlags]] gates plus
    * [[TextAnalysis.repetitionSignals]] thresholds, evaluated in ONE
    * projection chain over one scan — the full Gopher-style keep/drop
    * decision with a first-failing-rule reason, as production filters
    * run it (signals are only useful gated). Everything is integer
    * (facet counts, basis points, threshold compares), so the whole
    * decision replays exactly in any engine. Stage structure follows
    * the q123 rule: tokens, grams and folds materialize as attributes
    * between selects; `qf`/fold references in later stages are cheap
    * attribute reads. Zero shuffle; streams unchanged. */
  def qualityFilterStack(docs: DataFrame, idCol: String, textCol: String,
      dup2MaxBp: Int, top2MaxBp: Int, dup3MaxBp: Int): DataFrame =
    qualityStackStages(docs, idCol, textCol,
        dup2MaxBp, top2MaxBp, dup3MaxBp)
      .select(col("doc_id"),
        col("dup2_bp"), col("top2_bp"), col("dup3_bp"),
        col("keep"), col("reason"))

  /** The [[qualityFilterStack]] projection chain CARRYING the raw text
    * through as `__text` (Catalyst prunes it when the caller doesn't
    * read it, so [[qualityFilterStack]]'s plan is unchanged) — lets
    * [[streamIngest]] stack further text-derived columns on the same
    * single pass. */
  private def qualityStackStages(docs: DataFrame, idCol: String,
      textCol: String, dup2MaxBp: Int, top2MaxBp: Int,
      dup3MaxBp: Int): DataFrame = {
    def bp(x: Column, n: Column): Column =
      when(n > 0, floor(x * 10000 / n).cast("long")).otherwise(lit(0L))
    val okD2 = col("dup2_bp") <= dup2MaxBp
    val okT2 = col("top2_bp") <= top2MaxBp
    val okD3 = col("dup3_bp") <= dup3MaxBp
    docs.select(col(idCol).as("doc_id"), col(textCol).as("__text"),
        TextAnalysis.toks(col(textCol)).as("t"),
        qualityFlags(col(textCol)).as("qf"))
      .select(col("doc_id"), col("__text"), col("qf"),
        TextAnalysis.gramsOf(col("t"), 2).as("g2"),
        TextAnalysis.gramsOf(col("t"), 3).as("g3"))
      .select(col("doc_id"), col("__text"), col("qf"),
        size(col("g2")).cast("long").as("n2"),
        size(col("g3")).cast("long").as("n3"),
        TextAnalysis.runFold(sort_array(col("g2"))).as("st2"),
        TextAnalysis.runFold(sort_array(col("g3"))).as("st3"))
      .select(col("doc_id"), col("__text"), col("qf"), col("n2"), col("n3"),
        col("st2.nd").as("nd2"), col("st2.best").as("top2"),
        col("st3.nd").as("nd3"))
      .select(col("doc_id"), col("__text"), col("qf"),
        bp(col("n2") - col("nd2"), col("n2")).as("dup2_bp"),
        bp(col("top2"), col("n2")).as("top2_bp"),
        bp(col("n3") - col("nd3"), col("n3")).as("dup3_bp"))
      .select(col("doc_id"), col("__text"),
        col("dup2_bp"), col("top2_bp"), col("dup3_bp"),
        (col("qf.keep") && okD2 && okT2 && okD3).as("keep"),
        when(!col("qf.keep"), col("qf.reason"))
          .when(!okD2, "dup_2gram")
          .when(!okT2, "top_2gram")
          .when(!okD3, "dup_3gram")
          .otherwise("").as("reason"))
  }

  private[pipeline] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[pipeline] val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"
  private[pipeline] val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"

  /** The streaming INGEST pre-filter — everything a stream can decide
    * about a document from the row alone, in ONE zero-shuffle
    * projection pass: the composed quality decision (q133's Gopher
    * gates + repetition thresholds, keep + first-failing-rule reason),
    * the language-ID prediction, and the PII scrub with audit counts.
    * This is the stage a 100 TB pipeline runs INSIDE the ingestion
    * stream (readStream → this → writeStream), before anything
    * corpus-wide (dedup, contamination, sampling) sees the data; it
    * works unchanged on batch and streaming children, spec-pinned.
    * Output: (doc_id, pred_lang, dup2_bp, top2_bp, dup3_bp, keep,
    * reason, n_emails, n_ids, n_phones, redacted). */
  def streamIngest(docs: DataFrame, idCol: String, textCol: String,
      dup2MaxBp: Int, top2MaxBp: Int, dup3MaxBp: Int): DataFrame =
    qualityStackStages(docs, idCol, textCol,
        dup2MaxBp, top2MaxBp, dup3MaxBp)
      .select(col("doc_id"),
        TextAnalysis.langScores(col("__text")).getField("pred")
          .as("pred_lang"),
        col("dup2_bp"), col("top2_bp"), col("dup3_bp"),
        col("keep"), col("reason"),
        regexp_count(col("__text"), lit(EmailRe)).cast("long").as("n_emails"),
        regexp_count(col("__text"), lit(SsnRe)).cast("long").as("n_ids"),
        regexp_count(col("__text"), lit(PhoneRe)).cast("long").as("n_phones"),
        regexp_replace(regexp_replace(regexp_replace(col("__text"),
          lit(EmailRe), lit("<EMAIL>")), lit(SsnRe), lit("<ID>")),
          lit(PhoneRe), lit("<PHONE>")).as("redacted"))

  /** Stateless per-doc ingest stages of the corpus release gate (q456/
    * q458): the drop stage — 'non_english' (content-derived q33
    * detector: pred must be 'en' with at least one English marker, the
    * label column is never consulted) or the first failing Gopher gate
    * ('quality_len' | 'quality_word_len' | 'quality_stopword' |
    * 'quality_repetition', q89 thresholds with the max-length and
    * distinct-ratio knobs parameterized; `repTenths` = 4 is q89's
    * n_distinct/n_tok >= 0.4) — or NULL for a passing doc. One
    * projection, all integer compares; works unchanged on batch and
    * streaming children. */
  def ingestDropStage(text: Column, maxLen: Int,
      repTenths: Int = 4): Column = {
    val ls = TextAnalysis.langScores(text)
    val toks = TextAnalysis.toks(text)
    val nTok = size(toks).cast("long")
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nStop = TextAnalysis.stopwordCount(text).cast("long")
    val nDist = TextAnalysis.distinctTokenCount(text).cast("long")
    when(!(ls.getField("pred") === "en" && ls.getField("en") >= 1),
      "non_english")
      .when(!(nTok >= 10 && nTok <= maxLen), "quality_len")
      .when(!(sumLen >= nTok * 3 && sumLen <= nTok * 10),
        "quality_word_len")
      .when(!(nStop * 100 >= nTok), "quality_stopword")
      .when(!(nDist * 10 >= nTok * repTenths), "quality_repetition")
  }

  /** Streaming arm of the corpus ingest gate (q458) — the q456 release
    * gate's admission-control shape: docs arrive in micro-batches and
    * each batch emits one manifest row per arriving doc
    * (batch_id, doc_id, source, verdict keep/drop, stage). Stages:
    *
    *  1. the stateless [[ingestDropStage]] (lang + quality) — pure
    *     projection, no state;
    *  2. `dup_vs_state` — the doc's text digest was already accepted in
    *     an EARLIER batch (novelty judged against pre-batch state only,
    *     the [[Dedup.StreamingCdcDedup]] stream≡batch contract, so a
    *     SQL replay of the closed batch prefix is exact);
    *  3. `dup_in_batch` — a smaller-id passing doc in the SAME batch
    *     has the digest (min-id-keep, the q30 convention);
    *  4. keep — the digest joins the accepted-state.
    *
    * State is digest-only (16-byte md5 + nothing), size-tiered via
    * [[Dedup.DigestTiers]] — O(batch·log n) amortized absorb, O(log n)
    * plan leaves, the VERDICT r16 item-2 discipline. Docs dropped by
    * lang/quality do NOT enter state: a re-arrival of the same junk
    * re-drops for the same stateless reason, so state carries only
    * digests that gate re-publication cost. Micro-batch labeling via
    * `batchLabel` derives batch_id from the batch's own rows (ADVICE
    * r16 — FileStreamSource order on coarse-mtime filesystems is
    * unspecified).
    *
    * `stateDir` switches to the deployment-shaped state arm (the
    * [[Dedup.StreamingCdcDedup]] pattern): accepted digests live in a
    * batch_id-partitioned parquet directory — ONE scan leaf at any
    * depth, restart-safe (a replayed batch overwrites its own partition
    * idempotently), survivable across driver restarts where the
    * in-memory tiers are not. */
  final class StreamingIngestGate(
      maxLen: Int,
      onBatch: DataFrame => Unit,
      batchLabel: Option[Column] = None,
      compactK: Int = 8,
      stateDir: Option[String] = None) {

    private val mem: Option[Dedup.DigestTiers] =
      if (stateDir.isDefined) None else Some(new Dedup.DigestTiers(compactK))

    // parquet arm: None until the first accepted batch materializes a
    // partition (the gate has no seed corpus, unlike the CDC dedup).
    // The batch's OWN partition is excluded from the read — partition
    // pruning makes that free, and it is what makes a crash-replayed
    // batch emit-idempotent, not just state-idempotent: novelty is
    // judged against strictly-earlier batches even when the replayed
    // batch's digests already landed on disk.
    private def parquetState(spark: org.apache.spark.sql.SparkSession,
        label: Long): Option[DataFrame] = stateDir.flatMap { dir =>
      val p = java.nio.file.Paths.get(dir.stripPrefix("file:"))
      if (java.nio.file.Files.exists(p) &&
          java.nio.file.Files.list(p).findFirst().isPresent)
        Some(spark.read.parquet(dir)
          .filter(col("batch_id") =!= label).select(col("h")))
      else None
    }

    /** Plan leaves the state anti-join reads (spec metric): O(log n)
      * tiers in the in-memory arm, constant 1 in the parquet arm. */
    def stateLeaves: Int = mem.map(_.leaves).getOrElse(1)

    /** foreachBatch body — also callable directly on batch frames
      * (the stream≡batch spec drives both paths). */
    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val label = batchLabel.flatMap { e =>
        val r = batch.agg(min(e).cast("long")).head()
        if (r.isNullAt(0)) None else Some(r.getLong(0)) // empty batch
      }.getOrElse(batchId)
      val staged = batch.select(col("doc_id"), col("source"),
          md5(col("text")).as("h"),
          ingestDropStage(col("text"), maxLen).as("stage0"))
        .localCheckpoint() // verdict join + fresh-digest absorb
      val passing = staged.filter(col("stage0").isNull)
      // semi/anti split (never a left join against the bare tier union —
      // cross-tier duplicate digests would fan passing rows out; never a
      // distinct() of the whole state — that re-shuffles every digest
      // ever seen per batch, the r15 super-linear trap)
      val st0 = mem.map(_.frame).getOrElse(
        parquetState(batch.sparkSession, label))
      val (inState, fresh) = st0 match {
        case Some(st) => (passing.join(st, Seq("h"), "left_semi"),
          passing.join(st, Seq("h"), "left_anti"))
        case None => (passing.limit(0), passing)
      }
      val minIds = fresh.groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"))
      val verdicts = inState
        .select(col("doc_id"), lit("dup_vs_state").as("stage1"))
        .union(fresh.join(minIds, "h")
          .select(col("doc_id"),
            when(col("doc_id") =!= col("keep_id"), "dup_in_batch")
              .as("stage1")))
      val emit = staged.join(verdicts, Seq("doc_id"), "left")
        .select(lit(label).as("batch_id"), col("doc_id"), col("source"),
          coalesce(col("stage0"), col("stage1")).as("__s"))
        .select(col("batch_id"), col("doc_id"), col("source"),
          when(col("__s").isNull, "keep").otherwise("drop").as("verdict"),
          coalesce(col("__s"), lit("kept")).as("stage"))
      onBatch(emit.localCheckpoint())
      // absorb AFTER the emit is materialized (pre-batch state judges
      // this batch's novelty; the checkpointed emit pins that reading)
      val bd = fresh.select(col("h")).distinct()
      stateDir match {
        case Some(dir) => bd.write.mode("overwrite")
          .parquet(s"$dir/batch_id=$label")
        case None => mem.get.absorb(bd)
      }
    }

    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }

  /** Equi-depth binning of a score column (feature bucketing / score
    * calibration): nBins buckets of near-equal population, each reported
    * as (bin, n_rows, score_lo, score_hi) — the bucket-boundary artifact
    * a calibration or feature-quantization step consumes. Rows are
    * totally ordered by (score, id), so bins are deterministic under
    * ties; bin = floor((rank-1)·nBins / N) spreads any remainder evenly
    * (sizes differ by at most 1).
    *
    * Scale shape: the [[graft.operators.GlobalRank]] two-pass rank
    * (range partition + per-partition sequence + broadcast offsets) —
    * never `row_number() OVER (ORDER BY …)`'s single-partition funnel —
    * then one map-side-combined hash agg down to nBins rows. N rides
    * along as a broadcast 1-row frame. */
  def equiDepthBins(df: DataFrame, scoreCol: String, idCol: String,
                    nBins: Int): DataFrame = {
    require(nBins >= 1, s"need at least one bin, got $nBins")
    val ranked = graft.operators.GlobalRank.rowNumber(
      df.select(col(scoreCol).as("score"), col(idCol).as("id")),
      "rn", col("score"), col("id"))
    val n = ranked.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      // rn is int32 (GlobalRank's contract); widen BEFORE the ×nBins —
      // ANSI mode would turn the int overflow past ~2³¹/nBins rows into
      // a runtime error
      .withColumn("bin",
        floor((col("rn").cast("long") - 1) * nBins / col("n")).cast("long"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("score")).as("score_lo"),
        max(col("score")).as("score_hi"))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4): the
    * training-sample generator — masked token runs collapse to
    * `<Xk>` sentinels in the input, and the target lists each sentinel
    * followed by the tokens it hides. Mask draws are the portable md5
    * bucket per (doc, position, salt) — never rand() — so the same
    * samples regenerate on any engine, any retry (the q87 sampling
    * contract applied to positions). Adjacent masked positions merge
    * into ONE span (that is what makes it span corruption rather than
    * token masking); no terminal sentinel is appended.
    *
    * Shape: strictly O(n) per doc. The mask array, then the span START
    * and END position arrays, materialize as attributes before reuse
    * (lambda-captured expressions re-evaluate per element — the q123
    * lesson); start/end detection is an O(1) `get` against the
    * neighbouring mask, and input/target assemble by `slice`-ing token
    * RUNS between consecutive boundaries — total sliced length = n, so
    * no step ever copies a growing accumulator (the previous
    * `aggregate`-fold did `concat(acc, array(tok))` per token: O(n²)
    * per doc, invisible at 540 tokens, fatal at 100k). Zero shuffle;
    * streams unchanged. Output: (doc_id, n_tok, n_masked, n_spans,
    * input, target). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  maskPct: Int, salt: String): DataFrame = {
    require(maskPct >= 1 && maskPct <= 99, s"maskPct in [1,99], got $maskPct")
    val mask = transform(sequence(lit(1), size(col("t"))),
      i => md5Bucket(concat(col("doc_id").cast("string"), lit("#"),
        i.cast("string")), salt) < maskPct)
    // 1-based positions where a masked run begins / ends; `get` is the
    // 0-based null-safe indexer, so neighbours off either edge coalesce
    // to unmasked rather than tripping ANSI bounds checks.
    val starts = filter(sequence(lit(1), size(col("t"))),
      i => element_at(col("m"), i) &&
        !coalesce(get(col("m"), i - 2), lit(false)))
    val ends = filter(sequence(lit(1), size(col("t"))),
      i => element_at(col("m"), i) &&
        !coalesce(get(col("m"), i), lit(false)))
    def sentinel(k: Column): Column =
      concat(lit("<X"), k.cast("string"), lit(">"))
    // input: for span k, the unmasked run since the previous span's end
    // (0 for k=0) followed by <Xk>; then the unmasked tail after the
    // last span. slice(length=0) when spans touch is an empty array.
    val inputArr = when(size(col("s")) === 0, col("t")).otherwise(concat(
      flatten(transform(col("s"), (p, k) => {
        val prevEnd = coalesce(get(col("e"), k - 1), lit(0))
        concat(slice(col("t"), prevEnd + 1, p - prevEnd - 1),
          array(sentinel(k)))
      })),
      slice(col("t"), element_at(col("e"), -1) + 1,
        size(col("t")) - element_at(col("e"), -1))))
    // target: <Xk> followed by span k's masked run, spans in order.
    val targetArr = flatten(transform(col("s"), (p, k) =>
      concat(array(sentinel(k)),
        slice(col("t"), p, element_at(col("e"), k + 1) - p + 1))))
    docs.select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("t"))
      .withColumn("m", mask)
      .withColumn("s", starts)
      .withColumn("e", ends)
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tok"),
        size(filter(col("m"), x => x)).cast("long").as("n_masked"),
        size(col("s")).cast("long").as("n_spans"),
        array_join(inputArr, " ").as("input"),
        array_join(targetArr, " ").as("target"))
  }

  /** Corpus snapshot delta: per-doc added / removed / changed /
    * unchanged status between two crawls — the incremental-ingestion
    * audit that decides what re-enters the dedup/curation pipeline
    * (re-processing only `added ∪ changed` is the difference between an
    * incremental run and a full recompute at 100 TB). Contents compare
    * by md5 digest, so the shuffle carries (id, 32-char hex) — never
    * the documents themselves; the id-keyed full-outer join co-locates
    * with bucketed-by-id snapshot layouts. */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame,
                   idCol: String, textCol: String): DataFrame = {
    val a = oldSnap.select(col(idCol).as("id"), md5(col(textCol)).as("h_old"))
    val b = newSnap.select(col(idCol).as("id"), md5(col(textCol)).as("h_new"))
    a.join(b, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") === col("h_new"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** Balanced training-shard assignment: round-robin over the
    * weight-descending global order — shard((rank−1) mod S) — the
    * deterministic writer-side primitive for emitting S output shards
    * with near-equal token mass (max−min shard sum ≤ the single
    * heaviest doc, the classic bound for sorted round-robin; LPT would
    * be marginally tighter but is inherently sequential). The global
    * order comes from the [[graft.operators.GlobalRank]] two-pass —
    * per-partition counts + broadcast offsets, NO single-partition
    * window, so the rank scales to any corpus. Output: one row per doc
    * (id, w, rn, shard); feed `shard` to repartition()/partitionBy for
    * the actual write. */
  def balancedShards(docs: DataFrame, idCol: String, weightCol: String,
                     nShards: Int): DataFrame = {
    require(nShards >= 1, s"need at least one shard, got $nShards")
    graft.operators.GlobalRank.rowNumber(
        docs.select(col(idCol).as("id"), col(weightCol).cast("long").as("w")),
        "rn", -col("w"), col("id"))
      .withColumn("shard", ((col("rn").cast("long") - 1) % nShards).cast("int"))
      .select(col("id"), col("w"), col("rn"), col("shard"))
  }

  /** PII scrub — the pattern-based redaction baseline every
    * training-data pipeline runs before release (email / phone /
    * SSN-shaped ids → typed placeholder tokens, plus per-doc match
    * counts for the audit trail). A pure zero-shuffle projection that
    * works unchanged as a streaming map. Patterns deliberately stay in
    * the dialect intersection of Java regex and RE2 (char classes,
    * bounded quantifiers, \b, \d) so any engine replays them
    * byte-identically; entity-level PII (names, addresses) needs NER
    * upstream — this is the regex tier. Replacement order: email, then
    * SSN-shaped, then phone (the shapes cannot overlap — the middle
    * groups differ). */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = EmailRe
    val ssn = SsnRe
    val phone = PhoneRe
    docs.select(col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(email)).cast("long").as("n_emails"),
      regexp_count(col(textCol), lit(ssn)).cast("long").as("n_ids"),
      regexp_count(col(textCol), lit(phone)).cast("long").as("n_phones"),
      regexp_replace(regexp_replace(regexp_replace(col(textCol),
        lit(email), lit("<EMAIL>")), lit(ssn), lit("<ID>")),
        lit(phone), lit("<PHONE>")).as("redacted"))
  }

  /** Per-source domain-shift metric: KL(P_source ‖ P_corpus) over the
    * unigram distributions, in integer micro-nats per token — the
    * mixture-design signal for "how far does this source sit from the
    * blend" (domain-weighting recipes threshold exactly this).
    *
    * Exactness: each term's log-ratio ln(c_st/n_s) − ln(c_t/N) is an
    * IEEE-deterministic double in both engines (two exact-integer
    * divisions, two lns, one subtract), rounded to integer micro-nats
    * per (source, term) BEFORE the weighted sum — so the rollup is an
    * order-independent integer sum (the q92 convention). `kl_micro` is
    * floor of the shared IEEE quotient sum/n_toks. Contributions are
    * c_st · (≤ ~3·10⁷), so the int64 sum holds past 10¹⁰ tokens per
    * (source, term) pair — wider corpora should scale the rounding.
    *
    * Scale shape: the token stream collapses to (source, term) counts
    * in the first map-side-combined agg; the corpus-term rollup derives
    * from that same checkpointed frame; one term-keyed shuffle join;
    * per-source totals broadcast (nSources rows). */
  def sourceKlDivergence(docs: DataFrame, srcCol: String,
                         textCol: String): DataFrame = {
    val st = docs.select(col(srcCol).as("source"),
      explode(split(lower(col(textCol)), "\\s+")).as("term"))
    val cst = st.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the term rollup, source totals AND the score
    val ct = cst.groupBy(col("term")).agg(sum(col("c")).as("ct"))
    val ns = cst.groupBy(col("source")).agg(sum(col("c")).as("ns"))
    val n = cst.agg(sum(col("c")).as("n"))
    cst.join(ct, "term")
      .join(broadcast(ns), "source")
      .crossJoin(broadcast(n))
      .select(col("source"), col("ns"),
        (col("c") * round((log(col("c").cast("double") / col("ns")) -
          log(col("ct").cast("double") / col("n"))) * 1e6, 0).cast("long"))
          .as("cm"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_toks"), sum(col("cm")).as("kl_sum_micro"))
      .select(col("source"), col("n_toks"), col("kl_sum_micro"),
        floor(col("kl_sum_micro") / col("n_toks")).cast("long").as("kl_micro"))
  }

  /** Temperature-scaled mixture weights over the corpus' source domains
    * (the GPT-3/LLaMA data-recipe primitive): with p_i the token share
    * of source i, the sampling weight is w_i = p_i^alpha / Σ_j p_j^alpha
    * — alpha < 1 flattens the mixture toward rare domains, alpha = 1 is
    * natural sampling. Output per source: exact integer (n_docs,
    * n_tokens), then p, w and the up/down-sampling factor w/p in
    * round-half-up parts-per-million.
    *
    * Determinism: token counts and the total are exact integers; the
    * only doubles are p, p^alpha and the two divisions. Σ_j p_j^alpha is
    * folded in SOURCE-SORTED order via a HOF aggregate over a collected
    * per-source array — NOT a parallel double sum — so the normalizer is
    * the same IEEE value in any engine/partitioning (DuckDB replays it
    * as list_sum(list(q ORDER BY source))).
    *
    * Scale shape: one map-side-combined hash agg over the corpus to
    * dimension-sized per-source rows; everything after (the sorted fold,
    * the broadcast of Z) is dimension-sized. The per-source frame is
    * localCheckpoint'd — two consumers, and its lineage is the full
    * corpus agg. */
  def mixtureWeights(docs: DataFrame, srcCol: String, tokCol: String,
                     alpha: Double): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val per = docs.groupBy(col(srcCol).as("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokCol)).as("n_tokens"))
      .localCheckpoint()
    val tot = per.agg(sum(col("n_tokens")).as("total"))
    val scored = per.crossJoin(broadcast(tot))
      .withColumn("p", col("n_tokens").cast("double") / col("total"))
      .withColumn("q", pow(col("p"), lit(alpha)))
    val z = scored.agg(aggregate(
      transform(sort_array(collect_list(struct(col("source"), col("q")))),
        x => x.getField("q")),
      lit(0.0), (acc, x) => acc + x).as("z"))
    scored.crossJoin(broadcast(z))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("p") * 1e6, 0).cast("long").as("p_ppm"),
        round(col("q") / col("z") * 1e6, 0).cast("long").as("w_ppm"),
        round(col("q") / col("z") / col("p") * 1e6, 0).cast("long").as("up_ppm"))
  }

  /** The composed end-to-end curation pipeline — what a real 100 TB
    * ingestion round runs as ONE dataflow, with no driver-side glue
    * between stages:
    *
    *   1. [[snapshotDiff]]: keep only docs `added` or `changed` vs the
    *      previous crawl (the incremental batch);
    *   2. exact dedup keep-best: min id per md5(text) digest;
    *   3. near dedup keep-best: [[Dedup.ngramJaccardPairs]] (exact
    *      PPJoin n-gram Jaccard) → [[Dedup.components]] → keep each
    *      cluster's min id (= its component label);
    *   4. [[qualityFilterStack]]: Gopher gates + repetition thresholds,
    *      keep=true survivors only;
    *   5. [[TextAnalysis.decontaminate]]: remove benchmark n-gram
    *      spans; the post-edit token count becomes the doc's weight;
    *   6. [[prioritySample]]: deterministic weighted top-k;
    *   7. [[packSequences]]: per-source token-budget bins;
    *   8. [[balancedShards]]: round-robin shard over the weight-DESC
    *      global rank.
    *
    * Output: one row per sampled doc — (id, source, w, cum_tok,
    * bin_id, rn, shard) — the writer-side artifact (bin for packing,
    * shard for the physical write split).
    *
    * Scale shape: every stage is the already-audited operator — the
    * corpus-sized shuffles are the digest agg (2), the gram joins (3)
    * and the quality/decontaminate projections' input scans; stages 6–8
    * run on sample-sized frames. The batch and exact-survivor frames
    * localCheckpoint once each (each feeds 2–3 consumers — without the
    * checkpoint every consumer would re-run the snapshot join). EAGER
    * like its constituents (3's posting guard + components iterate).
    *
    * Determinism: each stage is individually engine-exact (integer
    * thresholds, md5 draws, total orders); the q136 oracle replays the
    * whole chain.
    *
    * @param checkpointDir when set, every inter-stage barrier uses
    *   RELIABLE `checkpoint()` into this directory (HDFS/object store on
    *   a real cluster) instead of `localCheckpoint()`, and
    *   [[Dedup.components]] runs its per-round frames the same way —
    *   executor loss costs a re-read, not the whole pipeline (see
    *   [[Ckpt.fn]]). Identical results either way (spec-pinned). */
  def curationPipeline(
      oldSnap: DataFrame, newSnap: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, srcCol: String,
      jacN: Int, jacTNum: Int, jacTDen: Int,
      dup2MaxBp: Int, top2MaxBp: Int, dup3MaxBp: Int,
      decontN: Int, sampleK: Int, salt: String,
      packBudget: Int, nShards: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    val ckpt = Ckpt.fn(newSnap, checkpointDir)
    // 1. incremental batch
    val diff = snapshotDiff(oldSnap, newSnap, idCol, textCol)
    val batch = ckpt(newSnap
      .select(col(idCol).as("id"), col(textCol).as("text"),
        col(srcCol).as("source"))
      .join(diff.filter(col("status").isin("added", "changed"))
        .select(col("id")), "id"))
    // 2. exact dedup keep-best
    val exKeep = batch.groupBy(md5(col("text")).as("h"))
      .agg(min(col("id")).as("id")).select(col("id"))
    val ex = ckpt(batch.join(exKeep, "id"))
    // 3. near dedup keep-best (exact Jaccard pairs → components).
    // collapseExact = false: stage 2 ALREADY collapsed byte-identical
    // docs (md5 keep-best), so the operator's default collapse would
    // re-run the same md5 agg against a provably-distinct corpus.
    val pairs = Dedup.ngramJaccardPairs(ex, "id", "text",
        n = jacN, tNum = jacTNum, tDen = jacTDen, collapseExact = false)
      .select(col("a_id"), col("b_id"))
    val comp = Dedup.components(pairs, ex.select(col("id")),
      checkpointDir = checkpointDir)
    // checkpoint: surv feeds the quality derivation AND the keep join,
    // and a join lineage above qualityFilterStack's staged projections
    // lets CollapseProject re-inline the hoisted gram/fold attributes
    // (the q123 lambda-capture lesson) — measured 7.2 s -> ~2 s at
    // sf0.1 with the checkpoint.
    val surv = ckpt(ex.join(
      comp.filter(col("id") === col("component")).select(col("id")), "id"))
    // 4. quality gates. The checkpoint before .filter(keep) is a
    // pushdown BARRIER, not just reuse: Catalyst would push the keep
    // predicate through qualityFilterStack's staged projections,
    // re-inlining the tokenize/gram/runFold chain many times into one
    // Filter (the q123 CollapseProject lesson, filter-pushdown
    // edition) — measured 11 s vs 0.3 s at sf0.1 for the same rows.
    // The barrier property is plan-gated (CurationPlanShapeSpec).
    val qual = ckpt(qualityFilterStack(surv, "id", "text",
        dup2MaxBp, top2MaxBp, dup3MaxBp))
      .filter(col("keep")).select(col("doc_id").as("id"))
    val qs = ckpt(surv.join(qual, "id"))
    emitStages(qs, bench, decontN, sampleK, salt, packBudget, nShards, ckpt)
  }

  /** [[curationPipeline]] stages 5–8 (decontaminate → weighted sample →
    * per-source packing → balanced shards) over a quality-survivor frame
    * `qs` = (id, text, source) — shared by the batch pipeline and the
    * incremental loop's emission ([[IncrementalCuration.emit]]), which
    * is what makes "incremental == batch" provable for the WHOLE
    * pipeline output, not just the survivor set. */
  private[pipeline] def emitStages(qs: DataFrame, bench: DataFrame,
      decontN: Int, sampleK: Int, salt: String,
      packBudget: Int, nShards: Int,
      ckpt: DataFrame => DataFrame): DataFrame = {
    // 5. decontaminate; post-edit token count = sampling weight
    val weighted = TextAnalysis.decontaminate(qs, bench, "id", "text", decontN)
      .select(col("doc_id").as("id"),
        (col("n_tok") - col("n_removed")).as("w"))
    // 6. weighted sample (key, w, priority)
    val samp = ckpt(prioritySample(weighted, "id", "w", sampleK, salt))
      // feeds pack AND shards
    // 7. pack per source
    val packed = packSequences(
      samp.join(qs.select(col("id").as("key"), col("source")), "key"),
      "key", "source", "w", packBudget)
    // 8. balanced shards over the same sample
    val sh = balancedShards(samp, "key", "w", nShards)
    packed
      .select(col("key").as("id"), col("source"), col("w"),
        col("cum_tok"), col("bin_id"))
      .join(sh.select(col("id"), col("rn"), col("shard")), "id")
      .select(col("id"), col("source"), col("w"), col("cum_tok"),
        col("bin_id"), col("rn"), col("shard"))
  }

  /** The incremental counterpart of [[curationPipeline]]'s stages 1–4 —
    * what a continuously-crawling 100 TB pipeline actually runs: a
    * foreachBatch loop that, per micro-batch of arriving docs,
    *
    *  1. ingest pre-filter: keep only docs `added` or `changed` vs the
    *     previous crawl ([[snapshotDiff]] semantics against a static
    *     old-digest dim — the shuffle carries (id, 32-hex), never text);
    *  2. quality flags via the [[streamIngest]] stack (one pass over the
    *     arriving text — flags are STORED, not filtered on: the batch
    *     pipeline applies quality AFTER components, and a quality-failing
    *     doc must still glue its near-dup cluster together);
    *  3. exact dedup: min id per md5(text) within the batch, then
    *     anti-join against the digests seen so far (first-seen-wins ==
    *     the batch pipeline's global min-id when doc ids arrive
    *     monotonically — the crawl regime, ids assigned at ingest);
    *  4. near-dup pair discovery, EXACT: the batch's distinct n-gram
    *     hashes ([[graft.expressions.functions.ngram_shingle_hashes]],
    *     the same expression as [[Dedup.ngramJaccardPairs]]) posting-join
    *     against the accumulated gram state — each shared gram counted
    *     once per pair, so `count == |intersection|` and the Jaccard
    *     verify is the same int64 `inter*tDen >= uni*tNum`. No LSH, no
    *     recall loss: this arm is exact by contract, like the batch
    *     PPJoin (which prunes the same posting join losslessly). The
    *     same fail-fast posting cap guards degenerate vocabularies.
    *
    * [[survivors]] then derives the running curated table at read time:
    * [[Dedup.components]] over every pair found so far (keep-best = each
    * cluster's min id) ∩ quality-pass. Derivation must run at READ time,
    * not per batch: a later doc can glue two existing clusters together
    * and retract a previously-rooted survivor, so per-batch emission of
    * survivors would need retractions — state is monotone, the view is
    * not.
    *
    * Per-batch cost: O(batch) for digest/quality/grams + the posting
    * join O(Σ_g df_batch(g)·df_state(g)) — never a corpus re-scan; the
    * corpus is re-read only as the (id, gram-hash) posting state, the
    * incremental contract. Spec-pinned equal to the batch
    * [[curationPipeline]] survivors across forced micro-batches
    * (IncrementalCurationSpec, q147 gate).
    *
    * State: localCheckpoint'd frames swapped per batch, or — with
    * `stateDir` — parquet tables partitioned by batch_id, each batch
    * overwrite-writing ITS OWN partition (idempotent under
    * foreachBatch's at-least-once replay); a fresh instance on the same
    * dir rehydrates — the [[Dedup.IncrementalNearDup]] contract. */
  final class IncrementalCuration(
      oldSnap: DataFrame,
      idCol: String, textCol: String, srcCol: String,
      jacN: Int = 3, jacTNum: Int = 4, jacTDen: Int = 5,
      dup2MaxBp: Int = 1000, top2MaxBp: Int = 1500, dup3MaxBp: Int = 100,
      maxPosting: Int = 100000,
      stateDir: Option[String] = None) {
    require(jacN >= 1 && jacTNum > 0 && jacTNum <= jacTDen,
      s"bad n-gram params: n=$jacN, t=$jacTNum/$jacTDen")

    private val sp = oldSnap.sparkSession

    private def fs(path: String): org.apache.hadoop.fs.FileSystem =
      new org.apache.hadoop.fs.Path(path)
        .getFileSystem(sp.sparkContext.hadoopConfiguration)

    private def readState(sub: String): Option[DataFrame] = stateDir.flatMap { dir =>
      if (fs(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/$sub")))
        Some(sp.read.parquet(s"$dir/$sub").drop("batch_id"))
      else None
    }

    // Static pre-filter dim: the previous crawl's (id, digest). Seeded
    // once (batch_id=-1) in stateDir mode so a restarted instance never
    // re-digests the old crawl.
    private val oldDig: DataFrame = stateDir match {
      case Some(dir) =>
        if (!fs(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/olddig")))
          oldSnap.select(col(idCol).as("id"), md5(col(textCol)).as("h_old"))
            .write.mode("overwrite").parquet(s"$dir/olddig/batch_id=-1")
        readState("olddig").get
      case None =>
        oldSnap.select(col(idCol).as("id"), md5(col(textCol)).as("h_old"))
          .localCheckpoint()
    }

    // Accumulated state. None = empty (nothing ingested yet); in
    // stateDir mode rehydrated from the partitioned tables.
    //   docs  (id, source)      exact-dedup survivors so far
    //   dig   (h)               digests seen so far
    //   qual  (id, keep)        per-doc quality verdicts
    //   post  (g, id, sz)       distinct-gram postings; sz = |grams(id)|
    //   pairs (a_id, b_id)      verified near-dup pairs so far
    @volatile private var docsS: Option[DataFrame] = readState("docs")
    @volatile private var digS: Option[DataFrame] = readState("dig")
    @volatile private var qualS: Option[DataFrame] = readState("qual")
    @volatile private var postS: Option[DataFrame] = readState("post")
    @volatile private var pairsS: Option[DataFrame] = readState("pairs")

    private def grams(docs: DataFrame): DataFrame = docs
      .select(col("id"), split(lower(col("text")), "\\s+").as("toks"))
      .filter(size(col("toks")) >= jacN)
      .select(col("id"),
        graft.expressions.functions
          .ngram_shingle_hashes(col("toks"), jacN, distinct = true).as("gs"))
      .select(col("id"), size(col("gs")).as("sz"), explode(col("gs")).as("g"))

    /** State from batches OTHER than `batchId`. In stateDir mode this is
      * what makes at-least-once replay idempotent: a replayed batch must
      * NOT see its own earlier partitions (it would anti-join itself away
      * and overwrite its partitions with empty frames); in-memory mode
      * has no restart, so the vars already hold exactly the prior
      * batches. */
    private def prior(sub: String, inMem: Option[DataFrame],
        batchId: Long): Option[DataFrame] = stateDir match {
      case Some(dir) =>
        if (fs(dir).exists(new org.apache.hadoop.fs.Path(s"$dir/$sub")))
          Some(sp.read.parquet(s"$dir/$sub")
            .filter(col("batch_id") =!= batchId).drop("batch_id"))
        else None
      case None => inMem
    }

    /** foreachBatch body — also callable directly on batch frames. */
    def processBatch(batch0: DataFrame, batchId: Long): Unit = {
      // 1. ingest pre-filter: added/changed vs the old crawl
      val batch = batch0
        .select(col(idCol).as("id"), col(textCol).as("text"),
          col(srcCol).as("source"), md5(col(textCol)).as("h"))
        .join(oldDig, Seq("id"), "left")
        .filter(col("h_old").isNull || col("h_old") =!= col("h"))
        .drop("h_old")
      // 2. quality flags (streamIngest stack), stored not filtered
      val qual = streamIngest(batch, "id", "text",
          dup2MaxBp, top2MaxBp, dup3MaxBp)
        .select(col("doc_id").as("id"), col("keep"))
      // 3. exact dedup: min id per digest in-batch (struct min — id
      // leads, so lexicographic min == min id), then drop digests
      // already seen in PRIOR batches
      val exBatch0 = batch
        .groupBy(col("h"))
        .agg(min(struct(col("id"), col("text"), col("source"))).as("d"))
        .select(col("h"), col("d.id").as("id"), col("d.text").as("text"),
          col("d.source").as("source"))
      val exBatch = prior("dig", digS, batchId) match {
        case Some(dig) => exBatch0.join(dig, Seq("h"), "left_anti")
        case None => exBatch0
      }
      val bPost = grams(exBatch)
      // Persist/absorb the batch FIRST (so same-batch pairs are found),
      // then discover pairs against the absorbed state.
      val bPostC = stateDir match {
        case Some(dir) =>
          exBatch.select(col("id"), col("text"), col("source"))
            .write.mode("overwrite").parquet(s"$dir/docs/batch_id=$batchId")
          exBatch.select(col("h"))
            .write.mode("overwrite").parquet(s"$dir/dig/batch_id=$batchId")
          qual.write.mode("overwrite").parquet(s"$dir/qual/batch_id=$batchId")
          bPost.write.mode("overwrite").parquet(s"$dir/post/batch_id=$batchId")
          docsS = readState("docs"); digS = readState("dig")
          qualS = readState("qual"); postS = readState("post")
          sp.read.parquet(s"$dir/post/batch_id=$batchId").drop("batch_id")
        case None =>
          // Materialize the batch ONCE (exBatch's lineage holds the
          // snapshot join + digest agg + anti-join) and derive every
          // state slice from the checkpointed blocks lazily; the running
          // state is a union of per-batch checkpointed leaves — flat
          // lineage, no per-batch re-checkpoint of the whole union
          // (measured: the union re-checkpoints re-ran the exBatch
          // lineage 3x per batch and dominated q147's wall).
          //
          // Round 18 (guide §1.2/§2.6 — fewer serial driver actions):
          // the exact-dedup survivors and the quality verdicts used to
          // be TWO eager localCheckpoints per batch; they now ride ONE
          // union-tagged checkpoint (slot 0 = survivor rows, slot 1 =
          // quality rows) and exB/qualC are narrow filters over the same
          // materialized blocks. Both branches share the oldDig
          // broadcast (ReusedExchange); per batch this halves the
          // checkpoint actions — with the guard fold below, 4 eager
          // actions per batch become 2 (JobProfile before/after in
          // OPTIMIZATION_r18.md).
          val combined = exBatch
            .select(lit(0).as("slot"), col("id"), col("text"),
              col("source"), col("h"), lit(null).cast("boolean").as("keep"))
            .union(qual.select(lit(1).as("slot"), col("id"),
              lit(null).cast("string").as("text"),
              lit(null).cast("string").as("source"),
              lit(null).cast("string").as("h"), col("keep")))
            .localCheckpoint()
          val exB = combined.filter(col("slot") === 0)
            .select(col("id"), col("text"), col("source"), col("h"))
          val qualC = combined.filter(col("slot") === 1)
            .select(col("id"), col("keep"))
          val bp = grams(exB) // projection over materialized blocks
          docsS = Some(docsS.fold(
            exB.select(col("id"), col("text"), col("source")))(
            _.union(exB.select(col("id"), col("text"), col("source")))))
          digS = Some(digS.fold(exB.select(col("h")))(
            _.union(exB.select(col("h")))))
          qualS = Some(qualS.fold(qualC)(_.union(qualC)))
          postS = Some(postS.fold(bp: DataFrame)(_.union(bp)))
          bp
      }
      val allPost = prior("post", None, batchId) match {
        case Some(p) => p.union(bPostC)
        case None => postS.get // in-memory: already prior ∪ batch
      }
      // Fail fast on degenerate postings, the ngramJaccardPairs
      // contract: candidate rows grow with df_batch·df_state per gram,
      // and an exact operator may not silently drop oversized postings.
      // stateDir arm: keep the driver-side guard BEFORE the pair write,
      // so a tripped cap never lands a partial pairs partition. The
      // in-memory arm (the q147/q153 query path) folds the guard into
      // the pair-checkpoint action below instead — round 18, guide
      // §1.2/§2.4: the guard's posting join was a full extra pass over
      // allPost⨝batch-grams per batch; as a zero-row union branch over
      // the SAME join subtree it shares the join's exchanges
      // (ReusedExchange) and its own driver action disappears.
      if (maxPosting > 0 && stateDir.isDefined) {
        val worst = allPost.join(bPostC.select(col("g")).distinct(), "g")
          .groupBy(col("g")).agg(count(lit(1)).as("pn"))
          .agg(max(col("pn"))).head()
        val biggest = if (worst.isNullAt(0)) 0L else worst.getLong(0)
        require(biggest <= maxPosting, postingCapMsg(biggest))
      }
      // 4. exact pair discovery: shared grams counted once per pair
      // (least/greatest + distinct folds the two join directions and the
      // batch×batch double-emission), so count(*) == |intersection| of
      // the two distinct-gram sets — identical to the PPJoin verify.
      val a = allPost.select(col("id").as("ia"), col("g"))
      val b = bPostC.select(col("id").as("ib"), col("g"))
      val joined = a.join(b, "g")
      val inter = joined
        .filter(col("ia") =!= col("ib"))
        .select(least(col("ia"), col("ib")).as("a_id"),
          greatest(col("ia"), col("ib")).as("b_id"), col("g"))
        .distinct()
        .groupBy(col("a_id"), col("b_id"))
        .agg(count(lit(1)).as("inter"))
      val sz = allPost.select(col("id"), col("sz")).distinct()
      val newPairs = inter
        .join(sz.select(col("id").as("a_id"), col("sz").as("sa")), "a_id")
        .join(sz.select(col("id").as("b_id"), col("sz").as("sb")), "b_id")
        .filter(col("inter") * jacTDen >=
          (col("sa") + col("sb") - col("inter")) * jacTNum)
        .select(col("a_id"), col("b_id"))
      pairsS = stateDir match {
        case Some(dir) =>
          newPairs.write.mode("overwrite")
            .parquet(s"$dir/pairs/batch_id=$batchId")
          readState("pairs")
        case None =>
          // checkpoint only THIS batch's pairs (the posting join runs
          // once); the running set is a lazy union of checkpointed leaves.
          // The posting-cap guard rides the same action as a zero-row
          // branch — the exact aggregation the old head() guard ran
          // (allPost joined to the batch's distinct grams, rows counted
          // per gram), built over the same `a` projection as the pair
          // join so the big side's exchange is shared (ReusedExchange);
          // assert_true trips the identical message, rethrown as the
          // contract's IllegalArgumentException.
          val guarded =
            if (maxPosting <= 0) newPairs
            else newPairs.union(a
              .join(b.select(col("g")).distinct(), "g")
              .groupBy(col("g")).agg(count(lit(1)).as("pn"))
              .agg(max(col("pn")).as("mx"))
              .filter(assert_true(
                coalesce(col("mx"), lit(0L)) <= maxPosting,
                concat(lit("IncrementalCuration: largest posting touched "
                    + "by this batch holds "), col("mx"),
                  lit(s" docs, over the cap $maxPosting — raise jacN "
                    + "(vocabulary too degenerate) or raise maxPosting "
                    + "(0 disables)"))).isNotNull)
              .select(lit(null).cast("long").as("a_id"),
                lit(null).cast("long").as("b_id")))
          val np =
            try guarded.localCheckpoint()
            catch { case e: Throwable =>
              var c: Throwable = e
              var found: String = null
              while (c != null && found == null) {
                val m = c.getMessage
                if (m != null && m.contains("largest posting")) found = m
                c = c.getCause
              }
              if (found != null) throw new IllegalArgumentException(found)
              else throw e
            }
          Some(pairsS.fold(np: DataFrame)(_.union(np)))
      }
    }

    private def postingCapMsg(biggest: Long): String =
      s"IncrementalCuration: largest posting touched by this batch holds " +
        s"$biggest docs, over the cap $maxPosting — raise jacN (vocabulary " +
        "too degenerate) or raise maxPosting (0 disables)"

    /** The running quality-survivor DOCUMENT table (id, text, source):
      * keep-best over the near-dup components found so far ∩
      * quality-pass. Recomputed at read time — the components/flags
      * derivation runs over dimension-small state (ids, pairs, flags);
      * text rides the final join only. EAGER like [[Dedup.components]]. */
    def survivorDocs(): DataFrame = {
      val docsAll = docsS.getOrElse(
        return oldSnap.select(col(idCol).as("id"), col(textCol).as("text"),
          col(srcCol).as("source")).limit(0))
      val nodes = docsAll.select(col("id"))
      val pairsAll = pairsS.getOrElse(
        docsAll.select(col("id").as("a_id"), col("id").as("b_id")).limit(0))
      val comp = Dedup.components(pairsAll, nodes)
      docsAll
        .join(comp.filter(col("id") === col("component")).select(col("id")), "id")
        .join(qualS.get.filter(col("keep")).select(col("id")), "id")
        .select(col("id"), col("text"), col("source"))
    }

    /** The running curated-survivor table (id, source). */
    def survivors(): DataFrame =
      survivorDocs().select(col("id"), col("source"))

    /** Run the batch pipeline's emission stages (decontaminate →
      * weighted sample → per-source packing → balanced shards) over the
      * CURRENT incremental survivors — the full [[curationPipeline]]
      * output contract reproduced from incrementally-built state
      * (q153's oracle is the full q136 chain, so incremental == batch
      * is pinned for the whole pipeline, not just the survivor set). */
    def emit(bench: DataFrame, decontN: Int, sampleK: Int, salt: String,
        packBudget: Int, nShards: Int): DataFrame =
      Curation.emitStages(survivorDocs().localCheckpoint(), bench,
        decontN, sampleK, salt, packBudget, nShards,
        df => df.localCheckpoint())

    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }

  /** DSIR importance weights (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every RAW-pool
    * document by log p_target(x) − log p_raw(x) under hashed
    * bag-of-words models of a small target corpus vs the raw pool — the
    * data-selection primitive behind domain-matched pretraining sets.
    * Features are md5-prefix-hashed unigram buckets (cross-engine
    * portable, the q105 conv trick; DSIR's 10⁴-bucket hashing with the
    * same collision semantics), add-one smoothed.
    *
    * Determinism: bucket counts and totals are exact integers; each
    * bucket's log-ratio is rounded to integer micro-nats ONCE, at the
    * dimension — per-doc scores are then integer sums of (tf × unats),
    * order-independent under any partitioning (the q117/q127
    * discipline). Output per raw doc: n_tok, w_unats (Σ tf·unats),
    * w_per_tok_unats (floor of the per-token mean) — feed the weights
    * to [[prioritySample]] for the resampling step.
    *
    * Scale shape: tokenize → one map-side-combined (doc, bucket) tf
    * agg (collapsed BEFORE any join — the q99 discipline); the bucket
    * dimension is ≤ nBuckets rows (counts, totals, log-ratios all
    * dimension-sized) and BROADCASTS back onto the tf frame; one
    * doc-keyed rollup. The corpus shuffles once, as (doc, bucket, tf)
    * triples. The tf frame is localCheckpoint'd — it feeds the bucket
    * dimension and the doc rollup. */
  /** Luhn checksum validity of an all-digit token (ISO/IEC 7812 — the
    * mod-10 test every real card number passes): digits from the RIGHT,
    * every second doubled with 9-subtraction, sum ≡ 0 (mod 10). One
    * in-row fold; callers guard with a digit-run regex so the casts
    * never see non-digits (ANSI-safe). */
  def luhnValid(tok: Column): Column = {
    val digits = transform(reverse(split(tok, "")), c => c.cast("int"))
    val summed = aggregate(
      zip_with(digits, sequence(lit(1), size(digits)), (d, i) =>
        when(pmod(i, lit(2)) === 0,
          when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)),
      lit(0), (acc, x) => acc + x)
    pmod(summed, lit(10)) === 0
  }

  /** Checksum-verified card-number redaction — the precision upgrade
    * over the regex tier ([[redactPii]]): a 13–19 digit run is redacted
    * ONLY if it passes the Luhn test, so order ids, timestamps packed
    * as digits, and random numerics survive while real PANs are
    * scrubbed (regex-only PII passes flag them all — the
    * false-positive cost this stage exists to remove). Token-wise
    * rebuild: candidates = whitespace tokens matching the digit-run
    * shape; valid ones become `<CC>`. Zero-shuffle projection (every
    * test is an in-row fold), streams unchanged. Audit counts per doc:
    * candidates seen, Luhn-valid redacted. */
  def redactCreditCards(docs: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val isCand = (t: Column) => t.rlike("^[0-9]{13,19}$")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("tk"))
      .select(col("doc_id"),
        size(filter(col("tk"), t => isCand(t))).cast("long")
          .as("n_candidates"),
        size(filter(col("tk"), t => isCand(t) && luhnValid(t))).cast("long")
          .as("n_redacted"),
        array_join(transform(col("tk"), t =>
          when(isCand(t) && luhnValid(t), lit("<CC>")).otherwise(t)), " ")
          .as("redacted"))
  }

  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, nBuckets: Int = 4096): DataFrame = {
    require(nBuckets > 0, s"need a positive bucket count, got $nBuckets")
    val base = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_t"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .withColumn("b",
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)))
    val tf = base.groupBy(col("doc_id"), col("is_t"), col("b"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val counts = tf.groupBy(col("b")).agg(
      sum(when(col("is_t"), col("tf")).otherwise(0L)).as("ct"),
      sum(when(!col("is_t"), col("tf")).otherwise(0L)).as("cr"))
    val totals = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    val dim = counts.crossJoin(broadcast(totals))
      .select(col("b"),
        round((log((col("ct") + 1).cast("double") / (col("nt") + nBuckets)) -
               log((col("cr") + 1).cast("double") / (col("nr") + nBuckets)))
          * 1e6, 0).cast("long").as("unats"))
    tf.filter(!col("is_t"))
      .join(broadcast(dim), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("unats")).as("w_unats"))
      .select(col("doc_id"), col("n_tok"), col("w_unats"),
        floor(col("w_unats").cast("double") / col("n_tok")).cast("long")
          .as("w_per_tok_unats"))
  }
}
