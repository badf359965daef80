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
}
