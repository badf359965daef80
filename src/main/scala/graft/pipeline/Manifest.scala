package graft.pipeline

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus release manifests (q352/q356/q365): order-independent,
  * mergeable fingerprints. Row digest = 60-bit md5 prefix of
  * `doc_id:text`; 256 digest-prefix buckets per source; bucket
  * fingerprint = commutative sum of digests in decimal(38,0) mod
  * 2⁶¹−1 (partial-agg / shard-merge / micro-batch-merge are all the
  * same cellwise modular addition); source root = md5 over the
  * zero-padded (bucket, fold) list (≤ 256 entries — bounded).
  *
  * The modular fold is a REPRODUCIBILITY stamp, not a cryptographic
  * commitment: collisions are trivial to construct on purpose, and
  * adversarial-resistance is out of scope (the q171 dataset card links
  * roots for drift detection, not tamper-proofing).
  */
object Manifest {

  /** 2⁶¹ − 1 (prime): fold modulus. Folds merge by modular addition. */
  val FoldM = 2305843009213693951L

  /** (source, b, n, fold) bucket frame over (source, doc_id, text). */
  def bucketFolds(docs: DataFrame): DataFrame =
    docs
      .select(col("source"),
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":"), col("text"))), 1, 15), 16, 10).cast("long").as("h"))
      .select(col("source"), col("h"), pmod(col("h"), lit(256L)).as("b"))
      .groupBy(col("source"), col("b"))
      .agg(count(lit(1)).as("n"),
        (sum(col("h").cast("decimal(38,0)")) % lit(FoldM)).cast("long")
          .as("fold"))

  /** (source, n_rows, n_buckets, root) from a bucket frame. */
  def roots(buckets: DataFrame): DataFrame =
    buckets.groupBy(col("source"))
      .agg(sum(col("n")).as("n_rows"), count(lit(1)).as("n_buckets"),
        md5(concat_ws("|", sort_array(collect_list(concat(
          lpad(col("b").cast("string"), 3, "0"), lit(":"),
          col("fold").cast("string")))))).as("root"))

  /** Incremental manifest: per-source bucket folds accumulated across
    * micro-batches by modular addition — the streaming twin of the
    * batch manifest, exact by the mergeability identity (q352's spec).
    * State is the ≤ 256-buckets-per-source driver map; each batch
    * collects only its OWN bounded bucket frame. ManifestSpec pins
    * roots-after-every-wave == the q365 batch replay. */
  final class IncrementalManifest {

    private val state = mutable.Map.empty[(String, Long), (Long, Long)]

    def processBatch(batch: DataFrame, batchId: Long): Unit = {
      val rows = bucketFolds(batch).collect() // ≤ 256 rows per source
      // the state map is mutated on the streaming thread and read by
      // currentRoots() — synchronize both sides (ADVICE r13: a
      // mid-stream currentRoots() from another thread was a data
      // race; the Spark collect stays OUTSIDE the lock).
      state.synchronized {
        rows.foreach { r =>
          val k = (r.getString(0), r.getLong(1))
          val (n0, f0) = state.getOrElse(k, (0L, 0L))
          val merged =
            ((BigInt(f0) + BigInt(r.getLong(3))) % BigInt(FoldM)).toLong
          state(k) = (n0 + r.getLong(2), merged)
        }
      }
    }

    /** (source, n_rows, root) — same root construction as [[roots]].
      * Thread-safe vs an in-flight processBatch (consistent snapshot
      * of whole batches — a batch is applied atomically above). */
    def currentRoots(): Seq[(String, Long, String)] =
      state.synchronized { state.groupBy(_._1._1).toSeq }.map { case (src, cells) =>
        val entries = cells.toSeq
          .map { case ((_, b), (_, f)) => f"$b%03d:$f" }
          .sorted.mkString("|")
        val md = java.security.MessageDigest.getInstance("MD5")
        val root = md.digest(entries.getBytes("UTF-8"))
          .map(x => f"$x%02x").mkString
        (src, cells.values.map(_._1).sum, root)
      }.sortBy(_._1)

    def start(stream: DataFrame): org.apache.spark.sql.streaming.StreamingQuery =
      stream.writeStream
        .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
  }
}
