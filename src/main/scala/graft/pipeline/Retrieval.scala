package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Retrieval-side scoring over a document corpus: BM25 term weights and
  * PMI bigram collocations. Complements Pipeline4's TF-IDF (q81) and
  * bounded inverted index (q82).
  *
  * Scale notes (100 TB):
  *   - Everything is hash aggregation on (doc, term) / term keys — Spark
  *     map-side-combines both, so the shuffle carries distinct keys, not
  *     token instances.
  *   - Corpus-level constants (N, total token count, total doc length)
  *     ride along as a broadcast 1-row frame; no driver collect, no
  *     recompute per partition.
  *   - Doubles appear ONLY in the final ln()/division; every aggregate is
  *     an exact integer, so the result is reproducible to the rounding
  *     edge in any engine.
  */
object Retrieval {

  /** Per-(doc, term) BM25 with the standard k1/b parametrisation and the
    * Robertson-Sparck-Jones idf `ln((N - df + 0.5)/(df + 0.5) + 1)`. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    // NULL-text docs are excluded EVERYWHERE, explicitly: split(NULL)
    // yields NULL toks, whose rows the explode silently drops — so such
    // docs would contribute no terms yet the "every doc yields >= 1
    // token" n_docs/avgdl derivation below wouldn't count them either.
    // Filtering here makes that one consistent, documented contract: a
    // NULL-text doc is not part of the corpus (no terms, no corpus
    // stats) rather than half-in.
    val toks = docs.filter(col(textCol).isNotNull)
      .select(col(idCol).as("doc_id"),
        split(lower(col(textCol)), "\\s+").as("toks"))
    // dl rides THROUGH the explode and the tf agg (constant per group,
    // picked up with first()) — no separate doc-length frame, no
    // doc_id shuffle join.
    val terms = toks.select(col("doc_id"),
      size(col("toks")).cast("long").as("dl"), explode(col("toks")).as("term"))
    // tf is consumed THREE times (score join, df rollup, corpus stats);
    // without a checkpoint each consumer re-executes the scan+tokenize
    // lineage — three corpus scans where one suffices (the q61 `grams`
    // pattern; on a real cluster persist()/checkpoint()). Everything
    // downstream derives from tf: df by term rollup, n_docs as the
    // distinct doc count (every doc yields >=1 token — split() never
    // returns an empty array), sum_dl = sum(tf) exactly.
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
      .localCheckpoint()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = tf.agg(count_distinct(col("doc_id")).as("n_docs"),
      sum(col("tf")).as("sum_dl"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    val idf = log((col("n_docs").cast("double") - col("df") + 0.5) /
      (col("df") + 0.5) + 1.0)
    val norm = col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / avgdl))
    tf.join(dfreq, "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        round(idf * (col("tf") * lit(k1 + 1.0)) / norm, 6).as("bm25"))
  }

  /** Per-document mean unigram surprisal — the perplexity-style quality
    * signal of a corpus-trained unigram LM (CCNet-style filtering, one
    * model order down). Engine-exact by construction: each token's
    * surprisal ln(N/c) is rounded to integer MICRO-nats BEFORE the
    * per-doc sum, so the aggregation is integer and order-independent —
    * a raw double sum would differ across engines by reduction order.
    *
    * Scale: the raw token stream never crosses a shuffle — it collapses
    * to (doc, term, tf) in the FIRST map-side-combined agg, so the vocab
    * join and the per-doc rollup carry distinct pairs, not token
    * instances (2–10× fewer shuffle bytes on natural text). No broadcast
    * of anything corpus-sized. tf is checkpointed (the q61 `grams`
    * pattern) because both the vocab rollup and the score join consume
    * it — otherwise each re-runs the scan+tokenize lineage. */
  def unigramSurprisal(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val uc = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
    val n = uc.agg(sum(col("c")).as("n_toks"))
    val scored = uc.crossJoin(broadcast(n))
      .select(col("term"),
        round(log(col("n_toks").cast("double") / col("c")) * 1e6, 0)
          .cast("long").as("s_micro"))
    tf.join(scored, "term")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tok"),
        sum(col("tf") * col("s_micro")).as("surp_sum_micro"))
      .select(col("doc_id"), col("n_tok"), col("surp_sum_micro"),
        // floor of the same IEEE division both engines compute —
        // a bare long cast would truncate in Spark but round in DuckDB
        floor(col("surp_sum_micro") / col("n_tok")).cast("long")
          .as("mean_surprisal_micro"))
  }

  /** Bigram collocations by pointwise mutual information:
    * pmi = ln(c_xy * N_uni^2 / (N_bi * c_x * c_y)), adjacent whitespace
    * tokens only, thresholded on the raw pair count to keep the result
    * set to the statistically meaningful tail. */
  def pmiBigrams(docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    val toks = docs.select(split(lower(col(textCol)), "\\s+").as("toks"))
    val uni = toks.select(explode(col("toks")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val pairs = toks
      .filter(size(col("toks")) >= 2)
      .select(explode(zip_with(
        slice(col("toks"), lit(1), size(col("toks")) - 1),
        slice(col("toks"), lit(2), size(col("toks")) - 1),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
    // bigram counts feed both the thresholded result and the corpus
    // total — checkpoint the (small) bigram-vocab frame so the
    // explode+zip_with lineage runs once, not twice. n_bi = sum of ALL
    // bigram counts (pre-threshold), identical to counting pair rows.
    val bi0 = pairs.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy"))
      .localCheckpoint()
    val bi = bi0.filter(col("c_xy") >= minCount)
    val nUni = uni.agg(sum(col("c")).as("n_uni"))
    val nBi = bi0.agg(sum(col("c_xy")).as("n_bi"))
    bi.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c_x"), "w1")
      .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c_y"), "w2")
      .crossJoin(broadcast(nUni))
      .crossJoin(broadcast(nBi))
      .select(col("w1"), col("w2"), col("c_xy"),
        round(log((col("c_xy").cast("double") * col("n_uni") * col("n_uni")) /
          ((col("n_bi").cast("double") * col("c_x")) * col("c_y"))), 6).as("pmi"))
  }

  /** BM25 ranked retrieval: top-k documents per query — the search
    * operator the per-(doc, term) [[bm25]] weights exist to feed
    * (more-like-this curation, retrieval-based decontamination, eval-set
    * construction all run exactly this). Queries are bags of DISTINCT
    * terms (query term frequency deliberately ignored — the classic
    * probabilistic-retrieval form for short queries).
    *
    * Exactness: each (doc, term) weight is [[bm25]]'s 6-dp rounded
    * double, scaled to an integer micro score per contribution; the
    * per-(query, doc) total is then an order-independent integer sum
    * and the top-k rank (score desc, doc_id asc) is exact.
    *
    * Scale shape: the weight table is corpus-sized but joins the
    * exploded query terms on a TERM-keyed shuffle join — the posting
    * fan-out per term is |queries containing t| × df(t), the inverted-
    * index reality (a stopword-laden query touches its full posting
    * list; cap query length upstream, not here — dropping postings
    * would change scores). Top-k is a per-query window, partitioned on
    * q_id. Output: (q_id, doc_id, score_micro, rn ≤ k). */
  def bm25Search(queries: DataFrame, // (q_id, qtext)
                 docs: DataFrame, idCol: String, textCol: String,
                 k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k >= 1, s"top-k needs k >= 1, got $k")
    val contrib = bm25(docs, idCol, textCol, k1, b)
      .select(col("term"), col("doc_id"),
        round(col("bm25") * 1e6, 0).cast("long").as("c_micro"))
    val qt = queries.select(col("q_id"),
      explode(array_distinct(split(lower(col("qtext")), "\\s+"))).as("term"))
    val scored = qt.join(contrib, "term")
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("c_micro")).as("score_micro"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(col("score_micro").desc, col("doc_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Multinomial Naive Bayes document classifier, trained and applied
    * in one dataflow — the classic quality/domain-classifier primitive
    * (the GPT-3 data-curation recipe trains a linear classifier to
    * score candidate documents; NB over token counts is its
    * count-exact, oracle-replayable form). Trains on the
    * `id % holdMod != holdRem` split, predicts the class column for the
    * held-out split.
    *
    * Add-one smoothing: s(t, c) = ln((c_tc + 1)/(n_toks_c + V)); a
    * term unseen for class c (including fully-OOV terms) coalesces to
    * the same formula at c_tc = 0, so there is no separate OOV branch.
    * Every ln is rounded to integer micro-nats per (term, class) —
    * the q92/q117 convention — so the per-doc totals are
    * order-independent integer sums; prediction is argmax score with
    * ties to the lexicographically smallest class.
    *
    * Scale shape: class stats and priors are nClass-sized broadcasts;
    * the (term, class) likelihood table joins the exploded eval tokens
    * on a (class, term)-keyed SHUFFLE join — vocab × nClass never
    * broadcasts. Training-token lineage is checkpointed once and feeds
    * the three count aggregates. Output: (doc_id, pred, best_micro),
    * one row per held-out doc. */
  def naiveBayesClassify(docs: DataFrame, idCol: String, textCol: String,
                         classCol: String, holdMod: Int = 10,
                         holdRem: Int = 0): DataFrame = {
    require(holdMod >= 2, s"holdMod must leave a training split, got $holdMod")
    val base = docs.select(col(idCol).as("doc_id"), col(classCol).as("cls"),
      split(lower(col(textCol)), "\\s+").as("toks"))
    val tr = base.filter(col("doc_id") % holdMod =!= holdRem)
    val trt = tr.select(col("cls"), explode(col("toks")).as("term"))
      .localCheckpoint() // feeds per-(class,term), per-class and vocab counts
    val tc = trt.groupBy(col("cls"), col("term")).agg(count(lit(1)).as("c"))
    val cst = trt.groupBy(col("cls")).agg(count(lit(1)).as("ntk"))
    val csd = tr.groupBy(col("cls")).agg(count(lit(1)).as("nd"))
    val tot = tr.agg(count(lit(1)).as("ndocs"))
    val voc = trt.agg(count_distinct(col("term")).as("v"))
    val cs = csd.join(cst, "cls")
      .crossJoin(broadcast(tot)).crossJoin(broadcast(voc))
      .select(col("cls"), col("ntk"), col("v"),
        round(log(col("nd").cast("double") / col("ndocs")) * 1e6, 0)
          .cast("long").as("prior_micro"),
        round(log(lit(1.0) / (col("ntk") + col("v"))) * 1e6, 0)
          .cast("long").as("miss_micro"))
    val hit = tc.join(broadcast(cs.select(col("cls"), col("ntk"), col("v"))), "cls")
      .select(col("cls"), col("term"),
        round(log((col("c") + lit(1.0)) / (col("ntk") + col("v"))) * 1e6, 0)
          .cast("long").as("s_micro"))
    val ev = base.filter(col("doc_id") % holdMod === holdRem)
    val etf = ev.select(col("doc_id"), explode(col("toks")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val scored = etf
      .crossJoin(broadcast(cs.select(col("cls"), col("prior_micro"),
        col("miss_micro"))))
      .join(hit, Seq("cls", "term"), "left")
      .groupBy(col("doc_id"), col("cls"))
      .agg((first(col("prior_micro")) +
        sum(col("tf") * coalesce(col("s_micro"), col("miss_micro"))))
        .as("score"))
    scored.groupBy(col("doc_id"))
      .agg(min_by(col("cls"), struct((-col("score")).as("ns"), col("cls")))
        .as("pred"),
        max(col("score")).as("best_micro"))
  }

  /** Held-out Stupid-Backoff bigram scoring (Brants et al., EMNLP 2007 —
    * the large-LM quality signal that replaced Kneser-Ney at web scale):
    * train bigram/unigram counts on `trainDocs`, score every bigram
    * position of `evalDocs` with
    *   S(w|v) = c2(v,w)/c1(v)            if the bigram was seen,
    *          = alpha * c1(w)/N          backing off to the unigram,
    *          = alpha * 1/N              for out-of-vocabulary w.
    * Scores are ln() in integer micro-nats rounded PER TYPE (the q92
    * convention), so per-doc sums are order-independent exact integers
    * in any engine. Output: (doc_id, n_scored, sb_sum_micro,
    * mean_sb_micro) — every eval doc gets a row; docs with < 2 tokens
    * score (0, 0, 0).
    *
    * Scale shape: train counts are hash aggs on term / (prev,cur) keys
    * (map-side combined — shuffle carries distinct keys, not token
    * instances); eval positions compress to per-doc DISTINCT (prev,cur)
    * types with a tf before any join, then two shuffle joins against
    * the type-keyed score tables (vocab² can exceed any broadcast cap —
    * nothing corpus-sized is ever broadcast). The 1-row N frame rides
    * along broadcast. uc is localCheckpoint'd (vocab-shaped, three
    * consumers); token lineages are scan-shaped and recompute. */
  def stupidBackoffScore(evalDocs: DataFrame, trainDocs: DataFrame,
                         idCol: String, textCol: String,
                         alpha: Double = 0.4): DataFrame = {
    val bigramsOf = (d: DataFrame, keep: Seq[org.apache.spark.sql.Column]) =>
      d.filter(size(col("toks")) >= 2)
        .select(keep :+ explode(zip_with(
          slice(col("toks"), lit(1), size(col("toks")) - 1),
          slice(col("toks"), lit(2), size(col("toks")) - 1),
          (a, b) => struct(a.as("prev"), b.as("cur")))).as("p"): _*)
        .select(keep ++ Seq(col("p.prev").as("prev"), col("p.cur").as("cur")): _*)

    val tt = trainDocs.select(split(lower(col(textCol)), "\\s+").as("toks"))
    val uc = tt.select(explode(col("toks")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c1"))
      .localCheckpoint()
    val n = uc.agg(sum(col("c1")).as("n_toks"))
    val bc = bigramsOf(tt, Seq.empty)
      .groupBy(col("prev"), col("cur")).agg(count(lit(1)).as("c2"))
    val hitScore = bc
      .join(uc.select(col("term").as("prev"), col("c1").as("cprev")), "prev")
      .select(col("prev"), col("cur"),
        round(log(col("c2").cast("double") / col("cprev")) * 1e6, 0)
          .cast("long").as("s_hit"))
    val backScore = uc.crossJoin(broadcast(n))
      .select(col("term").as("cur"),
        round(log(lit(alpha) * col("c1") / col("n_toks")) * 1e6, 0)
          .cast("long").as("s_back"))

    val ev = evalDocs.select(col(idCol).as("doc_id"),
      split(lower(col(textCol)), "\\s+").as("toks"))
    val epc = bigramsOf(ev, Seq(col("doc_id")))
      .groupBy(col("doc_id"), col("prev"), col("cur"))
      .agg(count(lit(1)).as("tf2"))
    val perDoc = epc
      .join(hitScore, Seq("prev", "cur"), "left")
      .join(backScore, Seq("cur"), "left")
      .crossJoin(broadcast(n))
      .withColumn("s", coalesce(col("s_hit"), col("s_back"),
        round(log(lit(alpha) * lit(1L) / col("n_toks")) * 1e6, 0).cast("long")))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf2")).as("n_scored"),
        sum(col("tf2") * col("s")).as("sb_sum_micro"))
    ev.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("sb_sum_micro"), lit(0L)).as("sb_sum_micro"),
        when(coalesce(col("n_scored"), lit(0L)) > 0,
          floor(col("sb_sum_micro") / col("n_scored")).cast("long"))
          .otherwise(lit(0L)).as("mean_sb_micro"))
  }

  /** Rank-biased overlap grid (Webber/Moffat/Zobel 2010, truncated):
    * from two rankings joined as `(ra, rb)` pairs (only ids present in
    * BOTH top lists matter — truncated RBO's overlap term ignores the
    * rest), the per-depth overlap/agreement and cumulative RBO prefix
    * for depths 1..maxDepth. The grid is a ≤maxDepth-row dimension
    * (boundedDim-guarded window); overlap is exact integer,
    * agreement/rbo are rounded doubles (q301). Self-RBO at depth k is
    * (1−p)·Σ_{d≤k} p^(d−1) = 1−p^k; disjoint rankings give 0
    * (RboSpec pins both brackets). */
  def rboGrid(bothRanks: org.apache.spark.sql.DataFrame, p: Double = 0.9,
      maxDepth: Int = 10): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val s = bothRanks.sparkSession
    val depths = s.range(1, maxDepth + 1).select(col("id").as("depth"))
    val ov = broadcast(depths).crossJoin(bothRanks)
      .filter(col("ra") <= col("depth") && col("rb") <= col("depth"))
      .groupBy(col("depth")).agg(count(lit(1)).as("overlap"))
    val grid = depths.join(ov, Seq("depth"), "left")
      .select(col("depth"), coalesce(col("overlap"), lit(0L)).as("overlap"),
        pow(lit(p), col("depth") - 1).as("wt"))
      .withColumn("term",
        col("wt") * col("overlap").cast("double") / col("depth"))
    // decimal-exact complement: 1.0 - 0.9 in binary doubles is
    // 0.09999999999999998, which diverges from an oracle's literal 0.1
    // at the rounding edge — go through the decimal string instead
    val oneMinusP = (BigDecimal(1) - BigDecimal(p.toString)).toDouble
    Stats.boundedDim(grid, "rbo depth grid", 1000)
      .withColumn("rbo_cum",
        round(lit(oneMinusP) * sum(col("term")).over(
          Window.orderBy(col("depth"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6))
      .select(col("depth"), col("overlap"),
        round(col("overlap").cast("double") / col("depth"), 6)
          .as("agreement"),
        col("rbo_cum"))
  }
}
