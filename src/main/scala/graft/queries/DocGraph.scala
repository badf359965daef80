package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The synthetic deterministic document link graph shared by the graph
  * gates (q178/q185/q198/q199 family and q299): three arithmetic edge
  * generators over `doc_id` (linear, quadratic, halving) — dense enough
  * for triangles/cores, fully replayable in the DuckDB oracles, and
  * replica-safe (arithmetic is mod-n on pmod-reduced ids, so sf≈10
  * replica ids never overflow — the q178 lesson).
  */
private[queries] object DocGraph {

  /** (vertex frame, canonical undirected edge set (u < v), both
    * localCheckpointed — the edge set feeds degrees, orientation and
    * closure in the consumers). */
  def docsAndUnd(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
      .localCheckpoint()
    val n = docs.count()
    // (d·d) mod n == ((d mod n)·(d mod n)) mod n — oracle-identical,
    // but survives replica-scale ids (the q178 sf≈10 overflow)
    val m = pmod(col("doc_id"), lit(n))
    val raw = docs.select(col("doc_id").as("src"),
        ((m * 7 + 1) % n).as("dst"))
      .union(docs.select(col("doc_id"), (m * m) % n))
      .union(docs.select(col("doc_id"), expr("doc_id div 2")))
      .filter(col("src") =!= col("dst"))
    val und = raw.select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v")).distinct()
      .localCheckpoint() // feeds degrees, orientation, and closure
    (docs, und)
  }

  /** The matching DuckDB edge-set CTE prefix (`nn`, `raw`, `und`). */
  val undSql: String =
    """nn AS (SELECT count(*) AS n FROM documents),
       raw AS (
         SELECT doc_id AS src,
           (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
         FROM documents
         UNION ALL SELECT doc_id,
           (doc_id * doc_id) % (SELECT n FROM nn) FROM documents
         UNION ALL SELECT doc_id, doc_id // 2 FROM documents),
       und AS (
         SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
         FROM raw WHERE src <> dst)"""
}
