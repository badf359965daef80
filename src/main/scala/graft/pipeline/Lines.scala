package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Line/sentence-granularity curation — the C4 heuristics (Raffel et al.
  * 2020 §2.2) and RefinedWeb-style corpus-level duplicate-line removal
  * (Penedo et al. 2023 §3.2). Web-scale curation works a granularity
  * BELOW the document: a page is kept or cleaned line by line, and a
  * line repeated across many pages (navigation chrome, cookie banners,
  * boilerplate footers) is evidence against every page it appears on.
  *
  * Scale shapes:
  *  - [[c4LineFilter]] is a zero-shuffle projection — every rule is a
  *    higher-order-function fold inside the row, so it streams
  *    unchanged and survives any corpus size with no hot spot.
  *  - [[corpusLineDedup]] is the two-pass count→filter discipline (the
  *    q112 boilerplate pattern): line occurrence counts aggregate on an
  *    md5-key shuffle (32 hex chars per line, never the line text), the
  *    repeated-line dim is small by nature (bounded by actually-repeated
  *    content), and the removal join is keyed — no corpus broadcast, no
  *    all-pairs anything. The gate oracle replays md5 portably; a
  *    production deployment can swap xxhash64 for half the key bytes
  *    (the contaminationHashed precedent — same semantics modulo 64-bit
  *    collisions).
  */
object Lines {

  /** Split `text` into trimmed non-empty "lines" on `sep` (default: the
    * `". "` sentence boundary the derived gate corpus plants). */
  def splitLines(text: Column, sep: String = "\\. "): Column =
    filter(transform(split(text, sep), x => trim(x)), x => length(x) > 0)

  private def wordCount(line: Column): Column =
    size(split(line, "\\s+")).cast("long")

  private def hasToken(line: Column, token: String): Column =
    concat(lit(" "), line, lit(" ")).contains(s" $token ")

  /** C4-style line filtering + document reassembly.
    *
    * Per line: keep iff word count >= `minWords` AND no blocklisted
    * token (C4 drops lines with fewer than three words and pages with
    * "bad words"; the curly-brace / boilerplate-phrase rules collapse
    * into the same token-blocklist shape). Per doc: keep iff at least
    * `minKeptLines` lines survive (C4 drops pages with fewer than three
    * sentences). Output carries the cleaned text (kept lines re-joined)
    * plus the audit counts a curation report wants.
    *
    * Every rule is computed INSIDE the row (transform/filter/aggregate
    * HOFs over the split array) — zero shuffle, streams unchanged. */
  def c4LineFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      blocklist: Seq[String],
      minWords: Int = 3,
      minKeptLines: Int = 3,
      sep: String = "\\. "): DataFrame = {
    val lines = splitLines(col(textCol), sep)
    val keptLines = filter(lines, l =>
      wordCount(l) >= minWords &&
        !blocklist.map(hasToken(l, _)).reduce(_ || _))
    docs
      .select(col(idCol).as("doc_id"), lines.as("lines"),
        keptLines.as("kept"))
      .select(col("doc_id"),
        size(col("lines")).cast("long").as("n_lines"),
        size(col("kept")).cast("long").as("n_kept"),
        coalesce(aggregate(col("kept"), lit(0L), (acc, l) => acc + wordCount(l)),
          lit(0L)).as("kept_words"),
        (size(col("kept")) >= minKeptLines).as("keep_doc"),
        array_join(col("kept"), " | ").as("clean_text"))
  }

  /** RefinedWeb-style corpus-level duplicate-line removal: a line that
    * occurs in >= `minDocs` DISTINCT documents is boilerplate and is
    * removed from every document; survivors are reassembled in original
    * order. Returns (doc_id, n_lines, n_removed, clean_text) — one row
    * per input doc (a fully-boilerplate doc keeps its row with empty
    * clean_text, which is what a downstream min-length gate then drops).
    *
    * Two-pass: (1) per-line-KEY distinct-doc counts — the shuffle
    * carries (md5 hex, doc_id), never line text; (2) the repeated-line
    * dim (small by nature) joins back on the key, and one doc-keyed
    * aggregate rebuilds the document. The in-row collect_list is bounded
    * by single-document length — the same per-doc bound every tokenize
    * step already carries. */
  def corpusLineDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minDocs: Int = 2,
      sep: String = "\\. "): DataFrame = {
    val e = docs
      .select(col(idCol).as("doc_id"),
        posexplode(splitLines(col(textCol), sep)).as(Seq("pos", "line")))
      .select(col("doc_id"), col("pos"), col("line"), md5(col("line")).as("k"))
    val repeated = e.groupBy(col("k"))
      .agg(count_distinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= minDocs)
      .select(col("k"), lit(true).as("is_dup"))
    e.join(repeated, Seq("k"), "left")
      .select(col("doc_id"), col("pos"), col("line"),
        coalesce(col("is_dup"), lit(false)).as("is_dup"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("pos"), col("line"), col("is_dup"))))
        .as("ls"))
      .select(col("doc_id"),
        size(col("ls")).cast("long").as("n_lines"),
        size(filter(col("ls"), x => x.getField("is_dup"))).cast("long")
          .as("n_removed"),
        array_join(transform(filter(col("ls"), x => !x.getField("is_dup")),
          x => x.getField("line")), " | ").as("clean_text"))
  }
}
