package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic graph operators over (src, dst) edge frames — the engine
  * pieces behind q198 (HITS) and q199 (k-core), factored so the scale
  * microbench can drive them on synthetic 10M-edge graphs.
  *
  * Both keep the suite's scaled-integer discipline: every per-round
  * reduction is a keyed join + keyed agg on the edge frame, totals ride
  * 1-row broadcasts, and inter-round lineage is cut with checkpoint
  * barriers (the Dedup.components discipline).
  */
object GraphOps {

  /** k-core peel over a SYMMETRIC edge frame (both directions present):
    * `rounds` unrolled iterations of "drop vertices with degree < k".
    * Returns (id, core_deg) for the surviving subgraph. Monotone —
    * each round only shrinks the edge frame, so round cost is bounded
    * by the previous round's survivors. */
  def kcorePeel(edges0: DataFrame, kk: Int, rounds: Int): DataFrame = {
    require(kk >= 1 && rounds >= 1, s"bad kcore params: $kk/$rounds")
    var edges = edges0.select(col("src"), col("dst")).localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= kk).select(col("src").as("k"))
        .localCheckpoint()
      edges = edges
        .join(keep, edges("src") === keep("k"), "leftsemi")
        .join(keep, edges("dst") === keep("k"), "leftsemi")
        .localCheckpoint()
    }
    edges.groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("id"), col("core_deg"))
  }

  /** HITS hubs & authorities over a DIRECTED edge frame — the q198
    * report shape: a¹ (from h⁰ ≡ 1e6) → h¹ → a², every half-step
    * renormalized to Σ = 1e6 by integer div over a 1-row broadcast
    * total (deterministic, order-independent). Returns
    * (id, authority_ppm, hub_ppm) for every vertex. */
  def hits(edges0: DataFrame): DataFrame = {
    val edges = edges0.select(col("src"), col("dst")).localCheckpoint()
    val verts = edges.select(col("src").as("id"))
      .union(edges.select(col("dst"))).distinct()
      .localCheckpoint()
    def renorm(df: DataFrame, c: String) = {
      val tot = df.agg(sum(col(c)).as("t"))
      df.crossJoin(broadcast(tot))
        .select(col("id"), expr(s"($c * 1000000) div t").as(c))
    }
    // h⁰ ≡ 1e6, so a¹ raw = in-degree·1e6
    val a1 = renorm(verts.join(edges.groupBy(col("dst")).agg(
        (count(lit(1)) * 1000000L).as("raw")),
        verts("id") === col("dst"), "left")
      .select(col("id"), coalesce(col("raw"), lit(0L)).as("a")), "a")
      .localCheckpoint()
    val h1 = renorm(verts.join(
        edges.join(a1, edges("dst") === a1("id"))
          .groupBy(col("src")).agg(sum(col("a")).as("raw")),
        verts("id") === col("src"), "left")
      .select(verts("id"), coalesce(col("raw"), lit(0L)).as("h")), "h")
      .localCheckpoint()
    val a2 = renorm(verts.join(
        edges.join(h1, edges("src") === h1("id"))
          .groupBy(col("dst")).agg(sum(col("h")).as("raw")),
        verts("id") === col("dst"), "left")
      .select(verts("id"), coalesce(col("raw"), lit(0L)).as("a")), "a")
    a2.join(h1, "id")
      .select(col("id"), col("a").as("authority_ppm"),
        col("h").as("hub_ppm"))
  }
}
