package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Large-scale document deduplication operators (training-data pipeline
  * extensions; BASELINE.json north star).
  *
  * Scale design: every variant is shuffle-minimal —
  *  - exact: one hash-aggregate on a digest (map-side partial agg).
  *  - MinHash+LSH: candidate generation is a group-by on (band, band
  *    signature); only candidate pairs (a tiny fraction of n²) are
  *    verified. No cross join ever materializes.
  *  - SimHash: signature per doc + banded blocking, same pattern.
  * All hashing is Spark-native (`xxhash64` — codegen'd) — no UDFs.
  */
object Dedup {

  /** Exact duplicate groups by content digest. O(n) + one shuffle. */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("text_md5"))
      .agg(min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_dups"))

  /** Distinct lower-cased whitespace tokens per doc. */
  def tokens(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      explode(array_distinct(split(lower(col(textCol)), "\\s+"))).as("tok"))

  /** Word k-shingles per doc (distinct). */
  def shingles(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = split(lower(col(textCol)), "\\s+")
    docs.select(col(idCol).as("doc_id"), toks.as("toks"))
      .select(col("doc_id"), explode(array_distinct(
        // sliding window of k tokens, joined by ''
        filter(
          transform(sequence(lit(0), greatest(size(col("toks")) - k, lit(0))),
            i => array_join(slice(col("toks"), i + 1, lit(k)), "")),
          s => length(s) > 0))).as("shingle"))
  }

  /** MinHash signatures: 2-universal rehash family over a base xxhash64.
    * numHashes aggregates = one group-by pass over exploded shingles. */
  def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    // 31-bit modulus keeps base*a < 2^62 — no int64 overflow under ANSI.
    val prime = 2147483647L // 2^31 - 1
    val base = pmod(xxhash64(col("shingle")), lit(prime))
    val mins = (0 until numHashes).map { i =>
      val a = (1103515245L * (i + 1)) % prime
      val b = (12345L + 7919L * i) % prime
      min(pmod(base * lit(a) + lit(b), lit(prime))).as(s"h$i")
    }
    sh.groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
  }

  /** MinHash + LSH banding: docs sharing any band bucket become candidate
    * pairs; pairs are then verified with exact token Jaccard. Returns
    * (a_id, b_id, inter, uni) for verified pairs with
    * inter/uni >= threshold. */
  def minhashNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      shingleK: Int = 3,
      threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = minhashSignatures(shingles(docs, idCol, textCol, shingleK), numHashes)
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        hash((b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i")): _*)
          .as("sig"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.sig").as("sig"))
    // candidate pairs: join within bucket, a < b; distinct across bands
    val cand = buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.sig") === col("y.sig") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()
    verifyJaccard(cand, tokens(docs, idCol, textCol), threshold)
  }

  /** Exact token-Jaccard verification for an explicit candidate-pair set.
    * Pure integer output (inter, uni) — oracle-safe. */
  def verifyJaccard(pairs: DataFrame, toks: DataFrame, threshold: Double): DataFrame = {
    val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("ntok"))
    val inter = pairs
      .join(toks.as("ta"), col("a_id") === col("ta.doc_id"))
      .join(toks.as("tb"), col("b_id") === col("tb.doc_id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("sa.ntok") + col("sb.ntok") - col("inter")).as("uni"))
      .filter(col("inter").cast("double") >= col("uni") * threshold)
  }

  /** 64-bit SimHash per doc: per-token xxhash64, signed bit votes, sign of
    * each bit-position sum. One explode + one group-by (64 conditional
    * sums), fully codegen'd. */
  def simhash64(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(docs, idCol, textCol)
      .withColumn("h", xxhash64(col("tok")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1L) === 1L, 1L).otherwise(-1L)).as(s"b$b")
    }
    val agg = toks.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
    val sim = (0 until 64).map { b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce((a, b) => a.bitwiseOR(b))
    agg.select(col("doc_id"), sim.as("simhash"))
  }
}
