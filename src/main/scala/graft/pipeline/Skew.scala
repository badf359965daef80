package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the cases AQE's skew-join split can't
  * reach (single hot GROUP BY key; a shuffle join whose skewed side AQE
  * won't split because the stage isn't eligible).
  *
  * At 100 TB a zipfian key (one user, one null-bucket, one "UNKNOWN"
  * state) puts an entire key's rows in ONE reducer task regardless of
  * `spark.sql.shuffle.partitions`. Salting spreads a key across
  * `buckets` reducers at the cost of (join) replicating the dim rows
  * `buckets`× or (agg) one extra tiny shuffle of partial aggregates —
  * both O(buckets), chosen per key-cardinality, never O(data).
  */
object Skew {

  /** Deterministic per-row salt in [0, buckets): hashes a caller-chosen
    * unique expression (a key column) rather than `rand()`, so runs are
    * reproducible and retried tasks don't re-deal rows. */
  def salt(uniq: Column, buckets: Int): Column =
    pmod(hash(uniq), lit(buckets)).cast("int")

  /** Two-phase aggregation: `SUM`/`COUNT` by (keys, salt) — the heavy
    * shuffle, now spread over `buckets` reducers per key — then re-merge
    * by keys alone over ≤ |keys|×buckets tiny partial rows. Exact for
    * any commutative-associative aggregate; exposed for sum+count (the
    * profiling engine's aggregates). */
  def twoPhaseSumCount(
      df: DataFrame,
      keys: Seq[String],
      sums: Seq[(String, Column)],
      uniq: Column,
      buckets: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt", salt(uniq, buckets))
    val partialAggs = sums.map { case (n, c) => sum(c).as(n) } :+
      count(lit(1)).as("_n")
    val partial = salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.map { case (n, _) => sum(col(n)).as(n) } :+
      sum(col("_n")).as("cnt")
    partial.groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted equi-join for a skewed fact against a dim too large to
    * broadcast: fact rows get a deterministic salt, dim rows are
    * replicated across all `buckets` salts (explode of a `sequence` —
    * dim×buckets rows, fine when dim ≪ fact), and the join key becomes
    * (key, salt) so one hot key spreads over `buckets` reducers.
    * `uniq` must vary WITHIN a key (a row id, not the join key itself —
    * hashing the key would send the whole hot key to one salt).
    * Inner and left-outer semantics preserved. */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      factKey: String,
      dimKey: String,
      uniq: Column,
      buckets: Int = 32,
      joinType: String = "inner"): DataFrame = {
    val saltedFact = fact.withColumn("_salt", salt(uniq, buckets))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact("_salt") === saltedDim("_salt"),
        joinType)
      .drop("_salt")
  }
}
