package graft.queries

import graft.SparkSpec

/** Round-14 pack, fifth batch: dedup savings, streaming PSI. */
class Pipeline78Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q389: histogram tiles the corpus; savings identities hold") {
    val rows = q("q389_dedup_savings").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    val (totDocs, totBytes, bps) =
      (rows.map(_._5).distinct, rows.map(_._6).distinct,
        rows.map(_._7).distinct)
    assert(totDocs.length == 1 && totBytes.length == 1 && bps.length == 1)
    assert(rows.map(t => t._1 * t._2).sum == totDocs.head,
      "cluster histogram must tile the corpus")
    rows.foreach { case (k, n, rd, rb, _, _, _) =>
      assert(rd == (k - 1) * n, s"k=$k redundant_docs identity")
      assert((k == 1) == (rb == 0L), s"k=$k redundant_bytes sign")
    }
    assert(rows.map(_._3).sum * 10000 / totDocs.head >= 0)
    // the plants produce multi-member clusters (sizes 2, 4 and 5 when
    // doc_id % 100 hits both arms)
    assert(rows.exists(_._1 >= 4L), "planted 4-way clusters missing")
    assert(rows.map(_._4).sum > 0L, "plants must save bytes")
  }

  test("q390: the streamed census reproduces q373 row-for-row") {
    val streamed = q("q390_stream_weekly_psi").collect()
      .map(_.toSeq).toSet
    val batch = q("q373_weekly_mix_psi").collect().map(_.toSeq).toSet
    assert(streamed.nonEmpty)
    assert(streamed == batch,
      "streaming PSI must equal the batch PSI exactly")
  }

  test("q391: skyline is mutually non-dominated and dominates the rest") {
    val sky = q("q391_pareto_skyline").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(sky.nonEmpty)
    // no skyline member dominates another
    for (a <- sky; b <- sky if a != b)
      assert(!(a._2 >= b._2 && a._3 >= b._3 &&
        (a._2 > b._2 || a._3 > b._3)),
        s"skyline member $b dominated by $a")
    // every corpus doc is dominated-or-equal by some skyline member
    val all = graft.queries.Tables.documents(spark, sf)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        graft.pipeline.TextAnalysis.tokenCount(
          org.apache.spark.sql.functions.col("text"))
          .cast("long").as("toks"),
        (graft.pipeline.TextAnalysis.stopwordCount(
          org.apache.spark.sql.functions.col("text"))
          .cast("long") * 10000L).as("st"))
      .selectExpr("doc_id", "toks", "st div greatest(1L, toks) AS q_bp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    all.foreach { case (id, t, qq) =>
      assert(sky.exists(s => s._2 >= t && s._3 >= qq),
        s"doc $id not covered by any skyline member")
    }
  }
}
