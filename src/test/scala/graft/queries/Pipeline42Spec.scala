package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 sixth batch: novelty first-doc/total identities, hubness
  * degree accounting, TTR brute-force cross-check.
  */
class Pipeline42Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q306 novelty: first gram-bearing doc is fully novel; totals add up") {
    val out = q("q306_novelty_rate").collect()
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), s"novel > grams: $r")
      assert(r.getLong(3) <= 1000000L, s"ppm out of range: $r")
    }
    val withGrams = out.filter(_.getLong(1) > 0)
    assert(withGrams.nonEmpty)
    val first = withGrams.minBy(_.getLong(0))
    assert(first.getLong(2) == first.getLong(1) &&
      first.getLong(3) == 1000000L,
      s"earliest doc not fully novel: $first")
    // every distinct gram hash is novel in exactly one doc
    val totalNovel = out.map(_.getLong(2)).sum
    val distinctGrams = Tables.documents(spark, sf)
      .select(split(lower(col("text")), "\\s+").as("w"))
      .filter(size(col("w")) >= 3)
      .select(explode(expr(
        """transform(sequence(1, size(w) - 2),
             i -> conv(substring(md5(concat_ws(' ', element_at(w, i),
               element_at(w, i + 1), element_at(w, i + 2))), 1, 15),
               16, 10))""")).as("g"))
      .distinct().count()
    assert(totalNovel == distinctGrams,
      s"novel totals $totalNovel != distinct grams $distinctGrams")
  }

  test("q307 hubness: degree accounting against the k=4 out-degree bound") {
    val out = q("q307_knn_hubness").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val reps = out.map(_._2).sum
    val inEdges = out.map { case (d, n) => d * n }.sum
    assert(reps > 0)
    assert(inEdges <= 4L * reps, s"in-edges $inEdges exceed 4*reps $reps")
    // hubness exists on the fixture: some rep is pointed at by > k
    // neighbors or some anti-hub has none (both tails being empty would
    // mean a perfectly regular graph — not this corpus)
    assert(out.exists { case (d, _) => d == 0 || d > 4 },
      s"degenerate flat in-degree histogram: ${out.toSeq}")
  }

  test("q308 TTR: invariants and one-doc brute force") {
    val out = q("q308_type_token_ratio").collect()
    out.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2) && r.getLong(2) <= r.getLong(1),
        s"hapax/types/tok ordering broken: $r")
      assert(r.getLong(4) <= 1000000L && r.getLong(5) <= 1000000L)
    }
    val doc = Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .head()
    val toks = doc.getString(1).toLowerCase.split("\\s+")
      .filter(_.nonEmpty).toSeq
    val types = toks.distinct
    val hapax = types.count(t => toks.count(_ == t) == 1)
    val row = out.find(_.getLong(0) == doc.getLong(0)).get
    assert(row.getLong(1) == toks.size && row.getLong(2) == types.size &&
      row.getLong(3) == hapax,
      s"brute force mismatch: $row vs (${toks.size}, ${types.size}, $hapax)")
  }
}
