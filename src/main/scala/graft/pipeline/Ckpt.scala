package graft.pipeline

import org.apache.spark.sql.DataFrame

/** Optimizer-barrier / lineage-truncation policy shared by the iterative
  * and multi-consumer operators ([[Dedup.components]],
  * [[Curation.curationPipeline]]).
  *
  * Two jobs, one call:
  *   - lineage truncation: iterative operators (label propagation) and
  *     multi-consumer frames (a pipeline stage feeding 2–3 downstream
  *     stages) re-run their full upstream lineage per consumer/round
  *     without it;
  *   - OPTIMIZER BARRIER: a checkpointed frame is a `LogicalRDD` leaf, so
  *     Catalyst cannot push a downstream filter through the (hoisted,
  *     staged) projections above it — the q123/q136 CollapseProject
  *     re-inlining failure mode (11 s vs 0.3 s for the same rows). The
  *     barrier property is asserted by CurationPlanShapeSpec, so a Spark
  *     upgrade that weakens it fails the build instead of silently
  *     regressing.
  *
  * `localCheckpoint()` blocks live in executor storage and die with the
  * executor — fine single-node, wrong on a real cluster for long chains.
  * Passing `checkpointDir` switches every barrier to RELIABLE
  * `checkpoint()` into that directory (HDFS/object store), so executor
  * loss costs a re-read instead of the whole chain.
  */
object Ckpt {

  /** Barrier function for `checkpointDir`: reliable `checkpoint()` into
    * the dir when set (claiming the session checkpoint dir — refusing to
    * hijack one already pointed elsewhere), `localCheckpoint()` when not.
    *
    * `session` is any DataFrame of the session the barriers will run in
    * (used only to reach SparkContext). */
  def fn(session: DataFrame, checkpointDir: Option[String]): DataFrame => DataFrame =
    checkpointDir match {
      case Some(dir) =>
        // setCheckpointDir mutates SESSION-GLOBAL state — a concurrent
        // job using checkpoint() in this session would silently have its
        // location redirected. Only claim the setting when unset; if the
        // session already checkpoints somewhere else, fail loudly instead
        // of hijacking it. (setCheckpointDir stores a fully-qualified
        // path with a per-context UUID subdir, so "already ours" means
        // the existing dir lives UNDER the qualified requested dir.)
        val sc = session.sparkSession.sparkContext
        val qualified = {
          val p = new org.apache.hadoop.fs.Path(dir)
          p.getFileSystem(sc.hadoopConfiguration).makeQualified(p).toString
        }
        sc.getCheckpointDir match {
          case None => sc.setCheckpointDir(dir)
          case Some(existing)
            if existing == qualified ||
              existing.startsWith(qualified.stripSuffix("/") + "/") => ()
          case Some(existing) => throw new IllegalArgumentException(
            s"checkpointDir=$dir: session checkpoint dir is already " +
              s"$existing — refusing to redirect session-global state; pass that " +
              "dir, or leave checkpointDir unset to use localCheckpoint")
        }
        df => df.checkpoint()
      case None => df => df.localCheckpoint()
    }
}
