package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language-ID heuristics, fingerprinting. All pure
  * Catalyst expressions (higher-order array functions + string built-ins)
  * — per-row projections, zero shuffle, codegen'd.
  */
object TextAnalysis {

  val Stopwords: Seq[String] = Seq(
    "the", "a", "of", "and", "to", "in", "is", "on", "for", "with")

  /** Whitespace tokens (lower-cased). */
  def toks(text: Column): Column = split(lower(text), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(toks(text))

  /** BPE-ish subword token estimate: word chunks + digits + punctuation
    * counted separately (a regex proxy for a real tokenizer's piece
    * count). */
  def subwordCountApprox(text: Column): Column =
    size(filter(split(lower(text), "(?<=[a-z]{4})|[^a-z0-9]+"), t => length(t) > 0))

  def distinctTokenCount(text: Column): Column = size(array_distinct(toks(text)))

  def stopwordCount(text: Column): Column =
    size(filter(toks(text), t => t.isin(Stopwords.map(x => x: Any): _*)))

  /** Marker-phrase occurrence count — `(len - len(replace))/len(marker)`,
    * exact integer, reproducible in any engine. */
  def occurrences(text: Column, marker: String): Column =
    ((length(text) - length(replace(text, lit(marker), lit("")))) / marker.length)
      .cast("int")

  /** Tiny n-gram language-ID heuristic over marker words. Returns
    * struct(en, es, de, fr, pred). Deterministic argmax with fixed
    * tie-break order en > es > de > fr. */
  def langScores(text: Column): Column = {
    val padded = concat(lit(" "), lower(text), lit(" "))
    val en = occurrences(padded, " the ") + occurrences(padded, " and ") + occurrences(padded, " with ")
    val es = occurrences(padded, " el ") + occurrences(padded, " los ") + occurrences(padded, " con ")
    val de = occurrences(padded, " der ") + occurrences(padded, " und ") + occurrences(padded, " mit ")
    val fr = occurrences(padded, " le ") + occurrences(padded, " les ") + occurrences(padded, " avec ")
    val pred = when(en >= es && en >= de && en >= fr, "en")
      .when(es >= de && es >= fr, "es")
      .when(de >= fr, "de")
      .otherwise("fr")
    struct(en.as("en"), es.as("es"), de.as("de"), fr.as("fr"), pred.as("pred"))
  }

  /** Quality facets as exact integers (ratios left to the consumer so the
    * output stays engine-exact): chars, tokens, distinct tokens, stopword
    * hits, digit chars, punctuation chars. */
  def qualityFacets(text: Column): Column = struct(
    length(text).as("n_chars"),
    tokenCount(text).as("n_tokens"),
    distinctTokenCount(text).as("n_distinct"),
    stopwordCount(text).as("n_stop"),
    (length(text) - length(regexp_replace(text, "[0-9]", ""))).as("n_digits"),
    (length(text) - length(regexp_replace(text, "[^a-zA-Z0-9\\s]", ""))).as("n_punct"))

  /** Content-defined fingerprint: min over all 8-char shingles of the
    * md5 hex digest (winnowing-style rolling fingerprint with window =
    * whole doc). Engine-exact (md5 + lexical min). One fused expression
    * per row (graft.expressions.MinMd5Window) — zero explode, zero
    * shuffle; the explode + group-by formulation below is kept as the
    * spec-pinned reference. */
  def fingerprint(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int = 8): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.expressions.functions.min_md5_window(col(textCol), k).as("fingerprint"))

  /** Benchmark-contamination audit over HASH-COMPRESSED word n-gram
    * shingles: corpus docs sharing any n-gram with the benchmark slice,
    * with per-doc shared-shingle and benchmark-doc counts.
    *
    * The wide-window upgrade of the q73 string-shingle audit (SURVEY.md
    * §8.2): at n = 8 or 13 a raw shingle string is ~50–90 bytes, so the
    * broadcast benchmark shingle table (and the join keys streaming
    * through the probe side) grow ~10× over the 8-byte `xxhash64`
    * compression. Hashing is SEMANTICALLY INVISIBLE modulo 64-bit
    * collisions (~n²/2⁶⁵ — the q80 oracle joins on the raw strings,
    * so the driver gate itself verifies no collision fired); memory per
    * benchmark shingle is what bounds the audit at large n, which is the
    * whole point of widening the window.
    *
    * Same scale shape as q73: the benchmark side is small by nature →
    * broadcast while under `benchCap` (counted on the raw pruned scan,
    * not the shingle lineage), shuffle-hash past it; the corpus streams
    * by in one scan, no corpus shuffle before the per-doc aggregate. */
  def contaminationHashed(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      isBench: Column,
      n: Int,
      benchCap: Long = 100000L): org.apache.spark.sql.DataFrame =
    contaminationHashedToks(
      docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("toks"),
        isBench.as("is_bench")),
      n, benchCap)

  /** [[contaminationHashed]] over PRE-TOKENIZED docs — (doc_id, toks
    * array<string>, is_bench boolean). The entry point for derived
    * corpora whose token stream already exists (q101's concatenated
    * long docs flatten per-base-doc token arrays here instead of
    * string-concatenating and regex-re-splitting ~10× longer texts —
    * the re-split was the single-core hot spot of the long-doc audit). */
  def contaminationHashedToks(
      docsToks: org.apache.spark.sql.DataFrame,
      n: Int,
      benchCap: Long = 100000L): org.apache.spark.sql.DataFrame = {
    val benchDocs = docsToks.filter(col("is_bench"))
    val bench = shingleHashFrame(benchDocs, "bench_id", n)
    val corpus = shingleHashFrame(docsToks.filter(!col("is_bench")), "doc_id", n)
    val benchSide =
      if (benchDocs.count() <= benchCap) broadcast(bench)
      else bench.hint("shuffle_hash")
    corpus.join(benchSide, "h")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("n_bench_docs"),
        count(lit(1)).as("n_shared_shingles"))
  }

  private def shingleHashFrame(df: org.apache.spark.sql.DataFrame,
      idAs: String, n: Int): org.apache.spark.sql.DataFrame = df
    .select(col("doc_id").as(idAs), col("toks"))
    .filter(size(col("toks")) >= n)
    .select(col(idAs), explode(
      graft.expressions.functions.ngram_shingle_hashes(col("toks"), n, distinct = true))
      .as("h"))

  /** [[contaminationHashed]] with a BLOOM-FILTER pre-filter — the
    * decontamination shape for a benchmark set too big to broadcast as
    * a hash table.
    *
    * [[contaminationHashedToks]] broadcasts the benchmark shingle table
    * itself: ~16 bytes/entry of hash-relation (8-byte key + overhead),
    * so 10⁹ benchmark n-grams ≈ 30+ GB per executor — past any
    * broadcast budget, and the fallback shuffle-hash join re-shuffles
    * the ENTIRE corpus shingle stream on h. This variant broadcasts a
    * Bloom filter instead (~1.2 GB at 10⁹ entries / 3% fpp — compact
    * enough to ship), streams the corpus past it as a zero-shuffle
    * filter, and only the surviving candidates (true hits + the fpp
    * sliver) shuffle into an EXACT verify join against the benchmark
    * table. No false negatives (Bloom guarantee) + keyed verify (kills
    * false positives) ⇒ bit-identical output to the exact operator —
    * which is precisely what the q158 gate hash-proves. This is Spark's
    * own runtime-filter pattern (InjectRuntimeFilter), applied where
    * the "join" is a semantic membership test.
    *
    * The one driver-side step is collecting the built Bloom filter —
    * ONE row whose size is fixed by `expectedItems` at construction
    * (0.9 MB per 2²⁰ entries), the same bounded-dim discipline as the
    * detection summary collect. */
  def contaminationBloomToks(
      docsToks: org.apache.spark.sql.DataFrame,
      n: Int,
      expectedItems: Long = 1L << 20): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.Bridge
    import org.apache.spark.sql.types.BinaryType

    val bench = shingleHashFrame(docsToks.filter(col("is_bench")), "bench_id", n)
    val corpus = shingleHashFrame(docsToks.filter(!col("is_bench")), "doc_id", n)
    val bloomBytes = bench
      .select(Bridge.column(new BloomFilterAggregate(
          Bridge.expression(col("h")), expectedItems)
        .toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), Bridge.expression(col("h"))))
    corpus.filter(mightContain)
      // exact verify: only bloom survivors shuffle; shuffle-hash on the
      // bench side — the whole point is that bench does NOT broadcast
      .join(bench.hint("shuffle_hash"), "h")
      .groupBy(col("doc_id"))
      .agg(count_distinct(col("bench_id")).as("n_bench_docs"),
        count(lit(1)).as("n_shared_shingles"))
  }

  /** The BENCHMARK-side leak report — the reverse rollup of
    * [[contaminationHashed]]: per BENCHMARK doc, how many corpus docs
    * share at least one word n-gram with it and how many
    * (corpus-doc, shingle) hits in total. Every benchmark doc gets a
    * row — a zero is the audit result you want to see, and the rows
    * that aren't zero rank which eval items leaked hardest (the view
    * an eval owner reads, where [[contaminationFlags]] is the view a
    * corpus owner reads). Same hashed-long join discipline: shingles
    * shuffle as xxhash64 longs, the bench side broadcasts below
    * `benchCap` docs. */
  def benchLeakReport(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      isBench: Column, n: Int,
      benchCap: Long = 100000L): org.apache.spark.sql.DataFrame = {
    val docsToks = docs.select(col(idCol).as("doc_id"),
      toks(col(textCol)).as("toks"), isBench.as("is_bench"))
    val benchDocs = docsToks.filter(col("is_bench"))
    val bench = shingleHashFrame(benchDocs, "bench_id", n)
    val corpus = shingleHashFrame(docsToks.filter(!col("is_bench")), "doc_id", n)
    val benchSide =
      if (benchDocs.count() <= benchCap) broadcast(bench)
      else bench.hint("shuffle_hash")
    val hits = corpus.join(benchSide, "h")
      .groupBy(col("bench_id"))
      .agg(count_distinct(col("doc_id")).as("n_corpus_docs"),
        count(lit(1)).as("n_hits"))
    benchDocs.select(col("doc_id").as("bench_id"))
      .join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_corpus_docs"), lit(0L)).as("n_corpus_docs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
  }

  /** The benchmark's distinct shingle-hash SET as a single-row frame
    * (`bh` array<long>) — the static side of [[contaminationFlags]].
    * Bounded by construction: benchmarks are small by nature (the q73
    * guard counts the raw scan before anything broadcasts). */
  def benchShingleHashSet(
      benchDocs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    benchDocs
      .select(toks(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(
        graft.expressions.functions.ngram_shingle_hashes(col("toks"), n, distinct = true))
        .as("h"))
      .agg(sort_array(collect_set(col("h"))).as("bh"))

  /** Per-doc contamination flag: how many of the doc's distinct n-gram
    * shingles appear anywhere in the benchmark. STATE-FREE — one
    * projection after a 1-row stream-static join — so the same operator
    * runs in a batch job (q84, oracle-pinned) or a streaming query in
    * APPEND mode with no watermark, no aggregation state: each arriving
    * doc is flagged immediately. Docs shorter than n get 0 (empty
    * shingle set), every input doc is kept. */
  def contaminationFlags(
      docs: org.apache.spark.sql.DataFrame,
      benchSet: org.apache.spark.sql.DataFrame, // from [[benchShingleHashSet]]
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame =
    docs
      .select(col(idCol).as("doc_id"),
        graft.expressions.functions.ngram_shingle_hashes(
          toks(col(textCol)), n, distinct = true).as("hs"))
      .withColumn("j", lit(1))
      .join(broadcast(benchSet.withColumn("j", lit(1))), "j")
      .select(col("doc_id"),
        // binary search per shingle against the sorted broadcast set —
        // array_intersect would re-hash the ENTIRE benchmark array for
        // every document row (O(docs × |bench|) kills this at corpus
        // scale; measured 13 s → sub-second at sf0.1).
        graft.expressions.functions.count_in_sorted(col("hs"), col("bh"))
          .as("n_contaminated"))

  /** Span-level DECONTAMINATION — the edit step after
    * [[contaminationFlags]]' audit: remove every token covered by a
    * benchmark n-gram, keep the rest. A token at position i (0-based,
    * lower-cased whitespace tokens) is covered iff ANY window start
    * j ∈ [i−n+1, i] matches the benchmark set; flags come from the
    * positional (non-distinct) fused shingle hashes, each start checked
    * with one binary search against the sorted broadcast benchmark
    * array (the count_in_sorted convention — per-start cost independent
    * of benchmark size). Output: (doc_id, n_tok, n_removed,
    * cleaned_text) with cleaned_text the space-join of surviving
    * lower-cased tokens (the pipeline-normalized form).
    *
    * Scale shape: a pure per-row projection against a 1-row broadcast —
    * zero shuffle, works unchanged as a streaming projection (the
    * contaminationFlags posture). The q115 oracle rebuilds spans from
    * RAW n-gram strings, so the driver gate proves the xxhash64
    * compression lossless here too. */
  def decontaminate(
      docs: org.apache.spark.sql.DataFrame,
      benchSet: org.apache.spark.sql.DataFrame, // from [[benchShingleHashSet]]
      idCol: String, textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    require(n >= 2, s"window below 2 tokens is not a span, got $n")
    // Staged projections (the q50/q51 memory): every HOF lambda reads a
    // materialized attribute, never an inline expensive subtree.
    val flagged = docs
      .select(col(idCol).as("doc_id"), toks(col(textCol)).as("tk"))
      .withColumn("hs", graft.expressions.functions.ngram_shingle_hashes(
        col("tk"), n, distinct = false))
      .withColumn("j", lit(1))
      .join(broadcast(benchSet.withColumn("j", lit(1))), "j")
      .withColumn("flags", transform(col("hs"),
        h => graft.expressions.functions.count_in_sorted(array(h), col("bh")) > 0))
    val withCov = flagged.withColumn("cov",
      transform(sequence(lit(0), size(col("tk")) - 1), i => {
        val lo = greatest(i - (n - 1), lit(0))
        val hi = least(i, size(col("flags")) - 1)
        // hi < lo ⇔ no window can reach this token (short doc, or the
        // tail beyond the last start on docs shorter than 2n−1)
        when(hi >= lo, exists(slice(col("flags"), lo + 1, hi - lo + 1),
          b => b)).otherwise(lit(false))
      }))
    withCov.select(col("doc_id"),
      size(col("tk")).cast("long").as("n_tok"),
      size(filter(col("cov"), c => c)).cast("long").as("n_removed"),
      array_join(transform(
        filter(sequence(lit(0), size(col("tk")) - 1),
          i => !element_at(col("cov"), i + 1)),
        i => element_at(col("tk"), i + 1)), " ").as("cleaned_text"))
  }

  /** CCNet-style boilerplate signal: the share of a document's segments
    * that recur across `minDf`+ DISTINCT documents (navigation chrome,
    * legal footers, templated intros — the content paragraph-level dedup
    * removes before training). The segment unit is sentences
    * (`chunkTokens = 0`: the q98 convention — split on `[.!?]+` runs
    * over the lower-cased text, trimmed, empty fragments dropped) or
    * non-overlapping `chunkTokens`-token windows (for corpora without
    * punctuation structure — the driver fixture; near-dup docs share
    * token runs, which is exactly what recurs). Segments travel as
    * fused xxhash64 longs — the frequency dim and the join shuffle
    * 8-byte keys, never segment strings (the splitLeakage convention;
    * the q112 oracle joins the RAW strings, so the driver gate proves
    * the compression lossless).
    *
    * Output per doc: n_sent (segment instances), n_boiler (instances
    * whose segment occurs in >= minDf docs), boiler_bp = floor(
    * n_boiler · 10⁴ / n_sent) — floor of the same IEEE quotient both
    * engines compute; segment-free docs are kept with zeros.
    *
    * Scale shape: explode → per-(doc, hash) instance counts (map-side
    * combined) → per-hash distinct-doc counts off that same frame → one
    * keyed join back on the hash → per-doc rollup. Every shuffle is
    * keyed on an 8-byte hash or doc_id; nothing corpus-sized broadcasts. */
  def boilerplateRatio(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, minDf: Int,
      chunkTokens: Int = 0): org.apache.spark.sql.DataFrame = {
    require(minDf >= 2, s"minDf below 2 would flag every segment, got $minDf")
    // chunk mode tokenizes into an ATTRIBUTE before the transform —
    // slice(t, …) with a captured split() would re-split the text once
    // per chunk element (the q123 lambda-capture lesson).
    val sents =
      (if (chunkTokens == 0)
        docs.select(col(idCol).as("doc_id"),
          filter(transform(split(lower(col(textCol)), "[.!?]+"), x => trim(x)),
            x => length(x) > 0).as("segs"))
      else
        docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("t"))
          .select(col("doc_id"), transform(
            sequence(lit(0),
              floor((size(col("t")) - 1) / chunkTokens).cast("int")),
            i => array_join(
              slice(col("t"), i * chunkTokens + 1, lit(chunkTokens)), " "))
            .as("segs")))
        .select(col("doc_id"), explode(col("segs")).as("sent"))
        .select(col("doc_id"), xxhash64(col("sent")).as("h"))
    // perDoc feeds BOTH the frequency dim and the score join — without a
    // checkpoint each consumer re-runs the tokenize+hash explode lineage
    // (the bm25 tf convention; persist()/checkpoint() on a real cluster).
    val perDoc = sents.groupBy(col("doc_id"), col("h"))
      .agg(count(lit(1)).as("n_inst"))
      .localCheckpoint()
    val dfreq = perDoc.groupBy(col("h")).agg(count(lit(1)).as("df"))
    val agg = perDoc.join(dfreq, "h")
      .groupBy(col("doc_id"))
      .agg(sum(col("n_inst")).as("n_sent"),
        sum(when(col("df") >= minDf, col("n_inst")).otherwise(0L)).as("n_boiler"))
    docs.select(col(idCol).as("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_sent"), lit(0L)).as("n_sent"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"),
        when(coalesce(col("n_sent"), lit(0L)) > 0,
          floor(col("n_boiler") * 10000 / col("n_sent")).cast("long"))
          .otherwise(lit(0L)).as("boiler_bp"))
  }

  /** Adjacent n-token grams of a token array (empty for short docs —
    * sequence(1, 0) would step BACKWARDS). */
  private[pipeline] def gramsOf(t: Column, n: Int): Column =
    when(size(t) >= n,
      transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  /** Distinct count + longest equal run of a SORTED string array, via
    * one fold (no explode, no shuffle — O(g log g) per doc including
    * the sort). Returns the full fold state; read `nd` and `best`. */
  private[pipeline] def runFold(sorted: Column): Column =
    aggregate(sorted,
      struct(lit(null).cast("string").as("prev"), lit(0L).as("run"),
        lit(0L).as("best"), lit(0L).as("nd")),
      (acc, x) => {
        val same = acc.getField("prev").isNotNull && acc.getField("prev") === x
        val run = when(same, acc.getField("run") + 1L).otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("nd") + when(same, lit(0L)).otherwise(lit(1L))).as("nd"))
      })

  /** Gopher-style per-doc repetition signals (Rae et al. 2021, app. A —
    * the "repetitious text" quality filters), re-expressed for Spark as
    * a ZERO-SHUFFLE projection. For n ∈ {2, 3} over the whitespace
    * tokens of lower(text):
    *
    *   - `dup{n}_bp`  — instances that repeat an n-gram already seen in
    *     the SAME doc, as basis points of all n-gram instances:
    *     floor((n_grams − n_distinct) · 10⁴ / n_grams);
    *   - `top{n}_bp`  — the share held by the doc's most frequent
    *     n-gram: floor(max_count · 10⁴ / n_grams).
    *
    * (Gopher's char-weighted variants need a char-attribution rule for
    * overlapping grams; the instance-weighted form keeps the signal and
    * stays integer-exact.) Docs with fewer than n tokens report 0 for
    * that n. All counting happens inside the row via [[runFold]]'s
    * sorted fold — the operator is a pure map over any partitioning,
    * costs no shuffle at any corpus size, and works unchanged as a
    * streaming projection. The basis points are floor of an IEEE
    * quotient both engines compute identically (the q112 convention).
    *
    * The stage structure is deliberate: gram build, sort+fold, and
    * field extraction live in SEPARATE selects so each non-cheap
    * expression is referenced exactly once per project —
    * CollapseProject then keeps the boundaries and nothing re-evaluates
    * (inlining the fold into its three consumers cost 6× wall on the
    * first cut: 16.4 s → 2.5 s at sf0.1). */
  def repetitionSignals(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String): org.apache.spark.sql.DataFrame = {
    def bp(x: Column, n: Column): Column =
      when(n > 0, floor(x * 10000 / n).cast("long")).otherwise(lit(0L))
    docs.select(col(idCol).as("doc_id"), toks(col(textCol)).as("t"))
      // t MUST be an attribute before it enters the transform lambdas:
      // expressions captured inside a lambda body re-evaluate PER
      // ELEMENT (no hoisting), so slice(split(...), i, n) would re-split
      // the text once per gram.
      .select(col("doc_id"),
        gramsOf(col("t"), 2).as("g2"), gramsOf(col("t"), 3).as("g3"))
      .select(col("doc_id"),
        size(col("g2")).cast("long").as("n2"),
        size(col("g3")).cast("long").as("n3"),
        runFold(sort_array(col("g2"))).as("st2"),
        runFold(sort_array(col("g3"))).as("st3"))
      .select(col("doc_id"), col("n2"), col("n3"),
        col("st2.nd").as("nd2"), col("st2.best").as("top2"),
        col("st3.nd").as("nd3"), col("st3.best").as("top3"))
      .select(col("doc_id"),
        col("n2"),
        bp(col("n2") - col("nd2"), col("n2")).as("dup2_bp"),
        bp(col("top2"), col("n2")).as("top2_bp"),
        col("n3"),
        bp(col("n3") - col("nd3"), col("n3")).as("dup3_bp"),
        bp(col("top3"), col("n3")).as("top3_bp"))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken 2003 — the MOSS
    * algorithm): the windowed upgrade of [[fingerprint]]'s whole-doc
    * min. Every w-window of consecutive k-char shingle hashes
    * contributes its minimum; the distinct mins are the doc's
    * fingerprint set, guaranteeing any shared substring of length
    * ≥ w+k−1 yields a shared fingerprint (the detection guarantee the
    * whole-doc min cannot give). md5 keeps the hashes
    * engine-portable; min is lexical.
    *
    * Zero shuffle — hashes and window mins stay inside the row (staged
    * as attributes per the q123 lambda rule). The in-row window scan is
    * O(n·w) via array_min-over-slice; a monotonic-queue fused
    * expression would be O(n) if profiles show w dominating. Docs
    * shorter than k hash their whole text once; fewer than w hashes →
    * one clipped window. Output: (doc_id, n_fp, fp_min, fp_max). */
  def winnowFingerprints(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String,
      k: Int = 8, w: Int = 16): org.apache.spark.sql.DataFrame =
    winnowSets(docs, idCol, textCol, k, w)
      .select(col("doc_id"),
        size(col("fps")).cast("long").as("n_fp"),
        array_min(col("fps")).as("fp_min"),
        array_max(col("fps")).as("fp_max"))

  /** The distinct winnowed-fingerprint SET per doc — the frame a
    * fingerprint-index join would consume; [[winnowFingerprints]] is
    * its gate-friendly rollup. Production path is the fused O(n)
    * monotonic-deque expression; [[winnowSetsHof]] is the
    * differential-spec'd HOF reference (O(n·w) with a slice allocation
    * per window — 6.4 s vs fused at sf0.1). */
  private[pipeline] def winnowSets(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int, w: Int): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"),
      graft.expressions.functions.winnow_mins(col(textCol), k, w).as("fps"))

  /** Cross-doc overlap pairs from winnowed fingerprints — what MOSS
    * actually reports: doc pairs sharing ≥ minShared fingerprints,
    * i.e. ≥ minShared distinct (w+k−1)-char-or-longer shared regions.
    * Fingerprints in more than maxDf docs are dropped FIRST (boilerplate
    * removal — the MOSS "ignore too-common" rule, and the same two-pass
    * count→filter discipline as the LSH bucket caps: the df aggregate's
    * buffers are constant-size, and no posting ever fans out past
    * maxDf²). The exploded fingerprint frame is checkpointed once and
    * feeds the df dim and both join sides. Output: (doc_a, doc_b,
    * n_shared), doc_a < doc_b. */
  def winnowPairs(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 8, w: Int = 16,
      minShared: Int = 2, maxDf: Int = 10): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1 and maxDf >= 2, got $minShared/$maxDf")
    val fp = winnowSets(docs, idCol, textCol, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .localCheckpoint() // feeds the df dim AND both join sides
    val keep = fp.join(
      fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("fp")), "fp")
    keep.select(col("fp"), col("doc_id").as("doc_a"))
      .join(keep.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** [[winnowPairs]] with matched-region EVIDENCE — the per-pair
    * offsets a MOSS report actually shows: for each overlapping pair,
    * alongside the shared-fingerprint count, the first and last
    * window-start position of any shared fingerprint on EACH side
    * (1-based; a window starting at position p witnesses the char
    * range [p, p+w+k-2], so (first, last+w+k-2) brackets the matched
    * material). Same boilerplate discipline as [[winnowPairs]]:
    * fingerprints in more than maxDf docs are dropped BEFORE the join,
    * so no posting fans out past maxDf². The positional frame comes
    * from the fused [[graft.expressions.functions.winnow_spans]] scan
    * (one O(n) pass per doc — not the O(n·w) HOF window rebuild).
    * Output: (doc_a, doc_b, n_shared, a_first, a_last, b_first,
    * b_last), doc_a < doc_b. */
  def winnowSpanPairs(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 8, w: Int = 16,
      minShared: Int = 2, maxDf: Int = 10): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1 and maxDf >= 2, got $minShared/$maxDf")
    val fp = docs.select(col(idCol).as("doc_id"),
        explode(graft.expressions.functions.winnow_spans(
          col(textCol), k, w)).as("s"))
      .select(col("doc_id"), col("s.fp").as("fp"),
        col("s.lo").as("lo"), col("s.hi").as("hi"))
      .localCheckpoint() // feeds the df dim AND both join sides
    val keep = fp.join(
      fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("fp")), "fp")
    keep.select(col("fp"), col("doc_id").as("doc_a"),
        col("lo").as("a_lo"), col("hi").as("a_hi"))
      .join(keep.select(col("fp"), col("doc_id").as("doc_b"),
        col("lo").as("b_lo"), col("hi").as("b_hi")), "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"),
        min(col("a_lo")).as("a_first"), max(col("a_hi")).as("a_last"),
        min(col("b_lo")).as("b_first"), max(col("b_hi")).as("b_last"))
      .filter(col("n_shared") >= minShared)
  }

  /** The MOSS similarity PERCENTAGE on top of [[winnowPairs]]: for each
    * overlapping pair, shared fingerprints as a share of the smaller
    * side's fingerprint set, in integer basis points — sim_bp =
    * n_shared·10000 div min(n_fp_a, n_fp_b), the normalized score the
    * MOSS UI ranks by (a small doc fully contained in a big one scores
    * ~100% instead of being diluted). n_fp counts the DISTINCT
    * fingerprints that survive the df ≤ maxDf boilerplate drop on each
    * side, so containment is measured against comparable material.
    * Output: (doc_a, doc_b, n_shared, n_fp_a, n_fp_b, sim_bp).
    *
    * Scale shape: [[winnowPairs]]' exploded+capped frame plus one
    * per-doc count aggregate and two dimension joins on doc id — the
    * pair frame is (already) bounded by maxDf², and the count frame is
    * one row per doc. */
  def winnowSimilarity(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 8, w: Int = 16,
      minShared: Int = 2, maxDf: Int = 10): org.apache.spark.sql.DataFrame = {
    require(minShared >= 1 && maxDf >= 2,
      s"need minShared >= 1 and maxDf >= 2, got $minShared/$maxDf")
    val fp = winnowSets(docs, idCol, textCol, k, w)
      .select(col("doc_id"), explode(col("fps")).as("fp"))
      .localCheckpoint() // feeds the df dim, the counts AND both sides
    val keep = fp.join(
      fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
        .filter(col("df") <= maxDf).select(col("fp")), "fp")
      .localCheckpoint() // consumed by the pair join (twice) + counts
    val nfp = keep.groupBy(col("doc_id")).agg(count(lit(1)).as("n_fp"))
    keep.select(col("fp"), col("doc_id").as("doc_a"))
      .join(keep.select(col("fp"), col("doc_id").as("doc_b")), "fp")
      .where(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
      .join(nfp.select(col("doc_id").as("doc_a"), col("n_fp").as("n_fp_a")),
        "doc_a")
      .join(nfp.select(col("doc_id").as("doc_b"), col("n_fp").as("n_fp_b")),
        "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_shared"),
        col("n_fp_a"), col("n_fp_b"),
        // integer div (matches the oracle's `//`) — the repo convention for
        // engine-exact bp ratios; `/` is double division, exact only while
        // n_shared*10000 stays within double's 2^53 integer margin.
        expr("(n_shared * 10000) div least(n_fp_a, n_fp_b)").as("sim_bp"))
  }

  /** HOF reference formulation of [[winnowSets]] (spec twin, not the
    * production path). */
  private[pipeline] def winnowSetsHof(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int, w: Int): org.apache.spark.sql.DataFrame =
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"),
        transform(
          sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1))),
          i => md5(col("text").substr(i, lit(k)))).as("h"))
      .select(col("doc_id"),
        transform(
          sequence(lit(1), greatest(size(col("h")) - (w - 1), lit(1))),
          j => array_min(slice(col("h"), j, lit(w)))).as("fps"))
      .select(col("doc_id"), array_distinct(col("fps")).as("fps"))

  /** One BPE merge step over the corpus — the tokenizer-training
    * primitive (Sennrich et al. 2016) at corpus scale: count adjacent
    * symbol pairs weighted by WORD frequency (the standard compression:
    * pair statistics run over the distinct-word table, never over raw
    * token instances), pick the top pair (count desc, pair asc), apply
    * the merge, and return the post-merge pair counts.
    *
    * Symbols start as single characters space-joined per word; the
    * merge is a literal string `replace` on that sequence — both
    * engines replace left-to-right, non-overlapping, continuing AFTER
    * each replacement ("a a a" + merge "a a" → "aa a"), which is
    * exactly the greedy BPE application for single-char symbols. (A
    * multi-step trainer must switch to symbol-array merges — after one
    * merge, multichar symbols make string-level matching ambiguous;
    * one step is what this operator contracts.)
    *
    * Scale shape: the word-frequency table is the only corpus-sized
    * aggregate (one shuffle on the word); everything after runs on the
    * distinct-word frame, checkpointed once for the two pair counts.
    * Pair cardinality is bounded by charset² regardless of corpus
    * size; the chosen merge is a 1-row broadcast. Output: topN rows of
    * (pair, cnt, merged), ordered (cnt desc, pair) — a total order, no
    * global window needed. */
  def bpeMergeStep(docs: org.apache.spark.sql.DataFrame,
      textCol: String, topN: Int = 20): org.apache.spark.sql.DataFrame = {
    def pairsOf(cs: Column): Column = zip_with(
      slice(cs, lit(1), size(cs) - 1), slice(cs, lit(2), size(cs) - 1),
      (a, b) => concat(a, lit(" "), b))
    val chars = transform(sequence(lit(1), length(col("wd"))),
      i => col("wd").substr(i, lit(1)))
    // empty words (leading-whitespace split artifacts) would make
    // sequence(1, 0) step BACKWARDS — drop them; they carry no pairs.
    val seqd = docs.select(explode(toks(col(textCol))).as("wd"))
      .filter(length(col("wd")) > 0)
      .groupBy(col("wd")).agg(count(lit(1)).as("n"))
      .select(col("wd"), col("n"),
        array_join(chars, " ").as("sq"), chars.as("cs"))
      .localCheckpoint() // feeds the pre-merge count AND the re-count
    val pc0 = seqd.select(explode(pairsOf(col("cs"))).as("pr"), col("n"))
      .groupBy(col("pr")).agg(sum(col("n")).as("c"))
    val top1 = pc0.orderBy(col("c").desc, col("pr")).limit(1)
      .select(col("pr").as("mpair"),
        translate(col("pr"), " ", "").as("msym"))
    val merged = seqd.crossJoin(broadcast(top1))
      .select(split(expr("replace(sq, mpair, msym)"), " ").as("ms"),
        col("n"), col("mpair"))
    merged.select(explode(pairsOf(col("ms"))).as("pair"), col("n"),
        col("mpair").as("merged"))
      .groupBy(col("pair"), col("merged")).agg(sum(col("n")).as("cnt"))
      .orderBy(col("cnt").desc, col("pair")).limit(topN)
      .select(col("pair"), col("cnt"), col("merged"))
  }

  /** Multi-step BPE TRAINING — [[bpeMergeStep]] iterated `nMerges`
    * times over a SYMBOL-ARRAY representation (after one merge,
    * multichar symbols make string-level replace ambiguous — a pair
    * pattern can false-match across symbol boundaries — so the trainer
    * works on exploded (word, position, symbol) rows instead). Per
    * step: count adjacent symbol pairs weighted by word frequency,
    * pick the top pair (count desc, pair asc — one total order), apply
    * the merge greedily left-to-right, and continue on the merged
    * state. Greedy non-overlapping application is exact: consecutive
    * overlapping matches only arise in runs of one repeated symbol
    * (match at i and i+1 forces pa = pb), so "kept" matches are the
    * even offsets within each maximal run of consecutive matches —
    * the gaps-and-islands window formulation below, which any engine
    * replays with lead/sum/min windows (no lookbehind regex, which
    * RE2-based engines lack).
    *
    * Output: one row per merge step — (step, pair, merged, cnt,
    * vocab_size) where cnt is the pre-merge weighted pair count and
    * vocab_size the corpus-wide distinct symbol count AFTER applying
    * the merge (direct evidence each application cascaded correctly).
    *
    * Scale shape: the word-frequency aggregate is the only
    * corpus-sized shuffle; every step after runs over the exploded
    * distinct-word symbol frame (vocabulary-sized, shrinking as merges
    * apply). Per-word windows partition on the word — millions of tiny
    * sort groups, never a single-partition window. EAGER and
    * iterative like the k-means trainers (q106–q110): each step
    * collects the 1-row top pair and the scalar vocab size (bounded
    * driver materializations) and localCheckpoints the symbol frame so
    * lineage stays flat across steps. */
  def bpeTrain(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): org.apache.spark.sql.DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainState(docs, textCol, nMerges)._2
      .toDF("step", "pair", "merged", "cnt", "vocab_size")
      .withColumn("step", col("step").cast("long"))
  }

  /** The trained tokenizer APPLIED: the distinct-word vocabulary after
    * `nMerges` BPE merges — (wd, n, n_syms, seg) with `seg` the
    * space-joined symbol sequence. This is the encode side of
    * [[bpeTrain]] (identical greedy application path, shared code), so
    * a gate row over it pins every word's final segmentation, not just
    * the per-step vocab size. Same scale shape and eager contract as
    * the trainer. */
  def bpeSegment(docs: org.apache.spark.sql.DataFrame, textCol: String,
      nMerges: Int): org.apache.spark.sql.DataFrame =
    segFrame(bpeTrainState(docs, textCol, nMerges)._1)

  /** Segmentations at SEVERAL merge counts from ONE training run:
    * greedy BPE is deterministic, so the k-merge state is a prefix of
    * any longer train — snapshotting the symbol frame at each
    * checkpoint costs nothing beyond the max(checkpoints) rounds the
    * longest vocabulary needs anyway (q416's migration audit would
    * otherwise train each vocabulary from scratch). Returns
    * checkpoint → (wd, n, n_syms, seg), same schema as [[bpeSegment]].
    */
  def bpeSegmentAt(docs: org.apache.spark.sql.DataFrame, textCol: String,
      checkpoints: Seq[Int])
      : Map[Int, org.apache.spark.sql.DataFrame] = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ >= 1))
    val (_, _, snaps) =
      bpeTrainState3(docs, textCol, checkpoints.max, checkpoints.toSet)
    snaps.map { case (k, f) => k -> segFrame(f) }
  }

  private def segFrame(syms: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    syms.groupBy(col("wd"), col("n"))
      .agg(count(lit(1)).as("n_syms"),
        array_join(
          transform(sort_array(collect_list(struct(col("i"), col("sym")))),
            x => x.getField("sym")), " ").as("seg"))

  /** Shared train/apply loop: returns the final (wd, n, i, sym) symbol
    * frame and the per-step merge records. */
  private def bpeTrainState(docs: org.apache.spark.sql.DataFrame,
      textCol: String, nMerges: Int)
      : (org.apache.spark.sql.DataFrame, Seq[(Int, String, String, Long, Long)]) = {
    val (f, st, _) = bpeTrainState3(docs, textCol, nMerges, Set.empty)
    (f, st)
  }

  /** [[bpeTrainState]] plus symbol-frame snapshots after the requested
    * merge steps (each already localCheckpoint'ed — stable frames). A
    * checkpoint past vocabulary exhaustion snapshots the final state. */
  private def bpeTrainState3(docs: org.apache.spark.sql.DataFrame,
      textCol: String, nMerges: Int, snapshotAt: Set[Int])
      : (org.apache.spark.sql.DataFrame,
         Seq[(Int, String, String, Long, Long)],
         Map[Int, org.apache.spark.sql.DataFrame]) = {
    require(nMerges >= 1 && nMerges <= 64,
      s"nMerges in [1,64] (each step is a Spark job round), got $nMerges")
    val byWord = org.apache.spark.sql.expressions.Window
      .partitionBy(col("wd")).orderBy(col("i"))
    val chars = transform(sequence(lit(1), length(col("wd"))),
      i => col("wd").substr(i, lit(1)))
    // empty words (leading-whitespace split artifacts) would make
    // sequence(1, 0) step BACKWARDS — drop them; they carry no pairs.
    var syms = docs.select(explode(toks(col(textCol))).as("wd"))
      .filter(length(col("wd")) > 0)
      .groupBy(col("wd")).agg(count(lit(1)).as("n"))
      .select(col("wd"), col("n"), posexplode(chars))
      .select(col("wd"), col("n"), (col("pos") + 1).as("i"),
        col("col").as("sym"))
      .localCheckpoint()
    val steps = scala.collection.mutable.ArrayBuffer
      .empty[(Int, String, String, Long, Long)]
    val snaps = scala.collection.mutable.Map
      .empty[Int, org.apache.spark.sql.DataFrame]
    var t = 1
    var exhausted = false
    while (t <= nMerges && !exhausted) {
      val top = syms
        .withColumn("nxt", lead(col("sym"), 1).over(byWord))
        .filter(col("nxt").isNotNull)
        .groupBy(concat(col("sym"), lit(" "), col("nxt")).as("pr"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("pr")).limit(1)
        .collect() // 1 row per step — bounded driver materialization
      if (top.isEmpty) exhausted = true
      else {
        val pr = top(0).getString(0)
        val cnt = top(0).getLong(1)
        // symbols never contain whitespace (they come from \s+ tokens),
        // so the pair string has exactly one space.
        val Array(pa, pb) = pr.split(" ", 2)
        val ms = pa + pb
        val matched = syms.withColumn("mm",
          col("sym") === lit(pa) &&
            coalesce(lead(col("sym"), 1).over(byWord) === lit(pb),
              lit(false)))
        // gaps-and-islands: grp is constant within each maximal run of
        // consecutive matches; greedy keeps the even offsets in a run.
        val grouped = matched.withColumn("grp",
          col("i") - sum(when(col("mm"), 1).otherwise(0)).over(byWord))
        val kept = grouped.withColumn("keep",
          col("mm") &&
            (col("i") - min(when(col("mm"), col("i")))
              .over(org.apache.spark.sql.expressions.Window
                .partitionBy(col("wd"), col("grp")))) % 2 === 0)
        syms = kept
          .withColumn("consumed",
            coalesce(lag(col("keep"), 1).over(byWord), lit(false)))
          .filter(!col("consumed"))
          .select(col("wd"), col("n"),
            row_number().over(byWord).cast("long").as("i"),
            when(col("keep"), lit(ms)).otherwise(col("sym")).as("sym"))
          .localCheckpoint()
        val vocab = syms.agg(countDistinct(col("sym"))).head.getLong(0)
        steps += ((t, pr, ms, cnt, vocab))
        if (snapshotAt.contains(t)) snaps(t) = syms
        t += 1
      }
    }
    // checkpoints at/past exhaustion resolve to the final state
    snapshotAt.filter(_ >= t).foreach(k => snaps(k) = syms)
    (syms, steps.toSeq, snaps.toMap)
  }

  /** Reference formulation of [[fingerprint]]: explode each k-char
    * window position, md5 per window, min() aggregate — the standard
    * shingle fan-out (len×32-byte shuffle per doc). Differential-tested
    * against the fused expression; not the production path. */
  private[pipeline] def fingerprintExplode(docs: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, k: Int = 8): org.apache.spark.sql.DataFrame = {
    docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .select(col("doc_id"),
        explode(sequence(lit(1), greatest(length(col("text")) - (k - 1), lit(1)))).as("i"),
        col("text"))
      .select(col("doc_id"), md5(col("text").substr(col("i"), lit(k))).as("h"))
      .groupBy(col("doc_id")).agg(min(col("h")).as("fingerprint"))
  }

  /** TextRank keyword scores (Mihalcea & Tarau 2004) in exact integer
    * arithmetic: undirected weighted co-occurrence edges from ADJACENT
    * token pairs of `tokCol` (an array column — pre-filter it), then
    * `iters` damped power-iteration rounds with total mass `total`
    * (pico-scale 1e12 by default), damping 0.85 as 85/100 integer
    * ops, contributions `weight·pr div wdeg`. Every intermediate is
    * int64 and truncating division agrees across engines, so a SQL
    * oracle replays the iteration bit-for-bit (q300).
    *
    * Int64 bound (ADVICE r12): the per-edge contribution is computed
    * `(c * pr) div wdeg` with `pr ≤ total` (default 1e12 pico-mass),
    * so an edge weight `c` past ~`2^63/total ≈ 9.2e6` would overflow
    * the product. The caller contract is therefore
    * `max-edge-weight × total < 2^63` — edge weight is the adjacent
    * co-occurrence COUNT of one ordered word pair, so even a 100 TB
    * corpus needs a single bigram repeated >9 million times before
    * the bound binds; shrink `total` (mass precision) proportionally
    * if your corpus has such a head. ANSI mode (the gate default)
    * fails loudly rather than corrupting scores silently.
    *
    * Returns the full word dimension `(w, wdeg, pr)`. One pass builds
    * the edges; each round is a word-dimension join — the corpus is
    * never rescanned. Mass is conserved up to div truncation: each
    * round loses < (#edges + #words) pico-units (TextRankSpec pins the
    * bound). */
  def textrankScores(docs: org.apache.spark.sql.DataFrame, tokCol: String,
      iters: Int = 3, total: Long = 1000000000000L): org.apache.spark.sql.DataFrame = {
    val adj = docs.select(col(tokCol).as("w"))
      .filter(size(col("w")) >= 2)
      .select(explode(zip_with(
        slice(col("w"), lit(1), size(col("w")) - 1),
        slice(col("w"), lit(2), size(col("w")) - 1),
        (a, b) => struct(least(a, b).as("w1"), greatest(a, b).as("w2"))))
        .as("p"))
      .select(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .filter(col("w1") =!= col("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .localCheckpoint() // canonical weighted edges (w1 < w2)
    val edges = adj.select(col("w1").as("src"), col("w2").as("dst"), col("c"))
      .union(adj.select(col("w2"), col("w1"), col("c")))
      .localCheckpoint() // symmetric, feeds every iteration
    val wdeg = edges.groupBy(col("src")).agg(sum(col("c")).as("wdeg"))
    val words = wdeg.select(col("src").as("w"), col("wdeg"))
      .localCheckpoint()
    val n = math.max(words.count(), 1L)
    val base = (15L * total) / (100L * n)
    var pr = words.select(col("w"), lit(total / n).as("pr"))
      .localCheckpoint()
    for (_ <- 1 to iters) {
      val contrib = edges
        .join(pr.select(col("w").as("src"), col("pr")), "src")
        .join(wdeg, "src")
        .select(col("dst"), expr("(c * pr) div wdeg").as("ctb"))
        .groupBy(col("dst")).agg(sum(col("ctb")).as("inflow"))
      pr = words
        .join(contrib.select(col("dst").as("w"), col("inflow")),
          Seq("w"), "left")
        .select(col("w"),
          (lit(base) + expr("(85 * coalesce(inflow, 0L)) div 100"))
            .as("pr"))
        .localCheckpoint()
    }
    words.join(pr, "w").select(col("w"), col("wdeg"), col("pr"))
  }

}
