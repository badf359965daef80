package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 seventh batch: planted label conflicts all surface,
  * fertility bounds, component-size accounting.
  */
class Pipeline43Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q309 label conflicts: every planted group surfaces, none invented") {
    val out = q("q309_label_conflict_audit").collect()
    assert(out.nonEmpty, "planted conflicts not detected")
    out.foreach { r =>
      assert(r.getLong(1) >= 2 && r.getLong(2) >= 2, s"non-conflict row: $r")
      assert(r.getLong(4) > 0 && r.getLong(4) < 1000000L,
        s"majority share must be interior for a conflicted group: $r")
    }
    // expected = distinct quantized keys among the planted (%50) vectors
    val expected = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 50 === 0)
      .select(md5(concat_ws(",",
        graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
          .cast("array<string>"))).as("k"))
      .distinct().count()
    assert(out.length == expected,
      s"${out.length} conflicted groups != $expected planted keys")
  }

  test("q310 fertility: bounds and doc accounting") {
    val out = q("q310_tokenizer_fertility").collect()
    assert(out.map(_.getLong(2)).sum ==
      Tables.documents(spark, sf).count())
    out.foreach { r =>
      // every subword piece is at least one character
      if (r.getLong(4) > 0)
        assert(r.getLong(6) >= 1000000L, s"chars/subword below 1: $r")
    }
  }

  test("q311 component sizes: partition accounting and giant consistency") {
    val out = q("q311_component_size_dist").collect()
    val n = Tables.documents(spark, sf).count()
    assert(out.map(r => r.getLong(0) * r.getLong(1)).sum == n,
      "component sizes don't partition the vertex set")
    val maxSz = out.map(_.getLong(0)).max
    assert(out.forall(_.getLong(2) == maxSz * 1000000L / n),
      "giant share inconsistent with the max component size")
    assert(out.length >= 3, s"degenerate size histogram: ${out.length} rows")
  }
}
