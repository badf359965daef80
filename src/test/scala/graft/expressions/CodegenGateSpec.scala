package graft.expressions

import graft.SparkSpec

/** Whole-stage-codegen gate for the fused-kernel production path.
  *
  * With `spark.sql.codegen.fallback=false`, a janino compile failure in
  * any generated stage throws instead of silently demoting the stage to
  * interpreted execution. Round-2 verdict confirmed exactly that demotion
  * on the profile path (SemVerdict emitted an unqualified `InternalRow`
  * the generated class could not always resolve), so this spec pins the
  * fix: the profile summary (q28) and fused phone validation (q44) must
  * run end-to-end with fallback disabled.
  */
class CodegenGateSpec extends SparkSpec {

  private def withNoFallback[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None    => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  private def run(name: String): Long = {
    val fn = graft.SparkEntry.queries(name)
    fn(spark, sf).count()
  }

  test("q28 profile summary compiles under whole-stage codegen (no fallback)") {
    withNoFallback { assert(run("q28_profile_summary") > 0) }
  }

  test("q44 fused phone validation compiles under whole-stage codegen (no fallback)") {
    withNoFallback { assert(run("q44_fused_phone_validate") > 0) }
  }

  // The when-tree validators were the round-2 64 KB offenders (phone v0/v1,
  // coords; Validators.once collapses the duplication). Pin the production
  // queries that use them.
  test("when-tree validator queries compile under whole-stage codegen (no fallback)") {
    withNoFallback {
      for (q <- Seq("q20_phone_validate", "q17_phone_v1_validate",
                    "q21_state_validate", "q26_coords_validate"))
        assert(run(q) > 0, q)
    }
  }
}
