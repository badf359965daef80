package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LeafNode}
import graft.SparkSpec

/** The curationPipeline optimizer-barrier CONTRACT (VERDICT r9 item 2).
  *
  * The pipeline's quality stage gates on `.filter(col("keep"))` above
  * [[Curation.qualityFilterStack]]'s staged projections. Without a
  * barrier, Catalyst pushes that predicate through the projections and
  * CollapseProject re-inlines the tokenize/gram/runFold chain into one
  * Filter — measured 11 s vs 0.3 s at sf0.1 for identical rows. The
  * barrier is a checkpoint (a `LogicalRDD` leaf the optimizer cannot see
  * through), which is an implementation side effect of checkpointing,
  * not a documented API: these specs pin it, so a Spark upgrade that
  * weakens the barrier FAILS THE BUILD instead of silently re-inlining.
  */
class CurationPlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureDocs: DataFrame = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "spam spam spam spam spam spam spam spam spam spam spam spam"),
    (3L, "a measured essay on the history of distributed query engines"),
    (4L, "short"),
  ).toDF("doc_id", "text")

  /** Reuse the session's already-claimed reliable checkpoint dir if any
    * test claimed one before us (session-global state), else claim a
    * fresh temp dir — makes the suite order-independent. */
  private def reliableDir: String =
    spark.sparkContext.getCheckpointDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft_ckpt_").toString)

  test("keep-filter stays a bare attribute over the barrier leaf (both flavors)") {
    val qual = Curation.qualityFilterStack(fixtureDocs, "doc_id", "text",
      dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100)
    val flavors = Seq(
      "localCheckpoint" -> Ckpt.fn(fixtureDocs, None),
      "reliable checkpoint" -> Ckpt.fn(fixtureDocs, Some(reliableDir)))
    for ((name, barrier) <- flavors) {
      val plan = barrier(qual).filter(col("keep"))
        .queryExecution.optimizedPlan
      val filters = plan.collect { case f: LFilter => f }
      assert(filters.size == 1, s"$name: expected 1 Filter node:\n$plan")
      val f = filters.head
      // The condition must gate on the `keep` attribute read from the
      // materialized frame (Spark wraps it as `isnotnull(keep) AND keep`
      // — fine, still the bare attribute). Any bigger tree means the
      // optimizer saw through the barrier and re-inlined the quality
      // projections (the re-inlined form references text-derived exprs
      // and runs to hundreds of nodes).
      assert(f.condition.references.map(_.name).toSet == Set("keep"),
        s"$name: filter references ${f.condition.references.map(_.name).toSet}, " +
          s"not just keep — chain re-inlined:\n$plan")
      val nNodes = f.condition.collect { case e => e }.size
      assert(nNodes <= 5,
        s"$name: keep-filter condition has $nNodes expression nodes — " +
          s"chain re-inlined through the barrier:\n$plan")
      assert(f.child.isInstanceOf[LeafNode],
        s"$name: filter not directly over the barrier leaf:\n$plan")
    }
  }

  test("negative control: without a barrier the keep-filter re-inlines (why the barrier exists)") {
    // Documents the failure mode the contract defends against. If a
    // Spark upgrade makes THIS test fail, Catalyst stopped re-inlining
    // filters through staged projections — re-evaluate whether the
    // barriers are still needed before deleting them. (A Seq.toDF
    // LocalRelation would be fully constant-folded at optimize time, so
    // the un-barriered plan is built over the real parquet source.)
    val docs = graft.queries.Tables.documents(spark, sf)
    val plan = Curation.qualityFilterStack(docs, "doc_id", "text",
        dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100)
      .filter(col("keep")).queryExecution.optimizedPlan
    val filters = plan.collect { case f: LFilter => f }
    assert(filters.exists(f => f.condition.collect { case e => e }.size > 5),
      s"keep-filter NOT re-inlined without a barrier — barrier may be obsolete:\n$plan")
  }

  test("curationPipeline reliable-checkpoint path reproduces the q136 result") {
    // Same inputs, same parameters as the q136 gate row, barriers on
    // reliable storage — byte-identical output (the orderBy(id) tail
    // makes collect order deterministic).
    val dir = reliableDir
    val local = graft.queries.Pipeline9.q136Run(spark, sf, None)
      .collect().map(_.toString).toSeq
    val reliable = graft.queries.Pipeline9.q136Run(spark, sf, Some(dir))
      .collect().map(_.toString).toSeq
    assert(local.nonEmpty, "q136 produced no rows at sf0.001")
    assert(reliable == local,
      s"reliable path diverged: ${reliable.diff(local).take(3)} vs ${local.diff(reliable).take(3)}")
  }
}
