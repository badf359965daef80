package graft.queries

/** Test-side bridge for `private[queries]` members needed by specs in
  * other packages (Md5SigSpec pins the fused kernels against the HOF
  * twins with the production permutation table). */
object PipelineTestBridge {
  def minHashPerms: Seq[(Long, Long)] = Pipeline.MinHashPerms
}
