package graft.expressions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-18 kernel gate: the fused MaxSim and clipped-n-gram-overlap
  * expressions (VecSim.scala) must be BIT-IDENTICAL to the interpreted
  * HOF formulations they replace — per pair / per doc, over the real
  * fixture data plus edge rows. The HOF twins below are verbatim copies
  * of the pre-round-18 code (q370's subCos cell, q193's gram explode). */
class VecSimSpec extends SparkSpec {

  test("maxsim_micro == explode + subCos-HOF + sum, per (probe, doc) pair") {
    val emb = graft.queries.Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        graft.pipeline.Similarity.quantize(col("embedding")).as("v"))
      .localCheckpoint()
    // verbatim pre-round-18 q370 formulation: per-vector slice norms,
    // broadcast probes, i-explode, array_max over j of the subCos cell,
    // (q_id, vec_id) sum aggregate
    val normed = emb.withColumn("nm",
      expr("transform(sequence(0, 3), k -> " +
        "sqrt(CAST(aggregate(slice(v, k * 16 + 1, 16), 0L, " +
        "(acc, e) -> acc + e * e, acc -> acc) AS DOUBLE)))"))
    // ALL pairs (every vector as both query and doc — wider than any
    // production probe panel reaches)
    val probes = normed.orderBy(col("vec_id")).limit(40)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nm").as("qn"))
    val subCos =
      """CAST(round(
           aggregate(zip_with(slice(qv, i * 16 + 1, 16),
                              slice(v, j * 16 + 1, 16),
                              (x, y) -> x * y), 0L,
                     (acc, e) -> acc + e, acc -> acc) /
           (element_at(qn, i + 1) * element_at(nm, j + 1))
           * 1000000.0) AS BIGINT)"""
    val hof = normed
      .join(broadcast(probes), lit(true))
      .select(col("q_id"), col("vec_id"),
        explode(sequence(lit(0), lit(3))).as("i"),
        col("qv"), col("v"), col("qn"), col("nm"))
      .select(col("q_id"), col("vec_id"),
        expr(s"array_max(transform(sequence(0, 3), j -> $subCos))")
          .as("best_micro"))
      .groupBy(col("q_id"), col("vec_id"))
      .agg(sum(col("best_micro")).as("m1"))
    val fused = emb
      .join(broadcast(emb.orderBy(col("vec_id")).limit(40)
        .select(col("vec_id").as("q_id"), col("v").as("qv"))), lit(true))
      .select(col("q_id"), col("vec_id"),
        graft.expressions.functions.maxsim_micro(col("qv"), col("v"))
          .as("m2"))
    val j = hof.join(fused, Seq("q_id", "vec_id"))
    assert(j.count() == hof.count() && hof.count() > 500)
    assert(j.filter(!(col("m1") <=> col("m2"))).count() == 0)
  }

  test("clipped_ngram_overlap == gram explode + clip-count twin (n=1,2)") {
    import spark.implicits._
    // real docs (the q193 shape: candidate = every 3rd token dropped)
    // plus edge rows: empty, single-token, exactly-n-token, repeated,
    // multi-byte
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .union(Seq(
        (9100001L, ""),
        (9100002L, "one"),
        (9100003L, "one two"),
        (9100004L, "a a a a b a a"),
        (9100005L, "köln über straße köln über"))
        .toDF("doc_id", "text"))
    val toks = docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .withColumn("cand",
        expr("filter(transform(toks, (t, i) -> struct(t AS t, i AS i)), " +
          "s -> (s.i + 1) % 3 != 0).t"))
    def grams(c: String, n: Int) =
      expr(s"transform(sequence(1, size($c) - ${n - 1}), " +
        s"i -> array_join(slice($c, i, $n), ' '))")
    for (n <- Seq(1, 2)) {
      // the verbatim q193/q194 path: explode both sides, count per
      // (doc, gram, side), sum the clipped minimum. sequence(1, size-n+1)
      // misbehaves below n+? tokens, so the HOF side keeps the original
      // guard (size >= 4 on real docs; edge rows sized to stay valid or
      // empty-gram).
      val ok = toks.filter(size(col("toks")) >= 4)
      val hof = ok.select(col("doc_id"),
          explode(array(
            struct(grams("cand", n).as("g"), lit("c").as("side")),
            struct(grams("toks", n).as("g"), lit("r").as("side")))).as("e"))
        .select(col("doc_id"), col("e.side").as("side"),
          explode(col("e.g")).as("g"))
        .groupBy(col("doc_id"), col("g"))
        .agg(sum(when(col("side") === "c", 1L).otherwise(0L)).as("cc"),
          sum(when(col("side") === "r", 1L).otherwise(0L)).as("rc"))
        .groupBy(col("doc_id"))
        .agg(sum(least(col("cc"), col("rc"))).as("m1"))
      val fused = ok.select(col("doc_id"),
        graft.expressions.functions
          .clipped_ngram_overlap(col("cand"), col("toks"), n).as("m2"))
      val j = hof.join(fused, "doc_id")
      assert(j.count() == hof.count() && hof.count() > 100)
      assert(j.filter(!(col("m1") <=> col("m2"))).count() == 0, s"n=$n")
    }
    // edge rows the HOF twin cannot express (size < n windows): the
    // kernel must return 0, not throw
    val edges = toks.filter(col("doc_id") >= 9100000L)
      .select(col("doc_id"),
        graft.expressions.functions
          .clipped_ngram_overlap(col("cand"), col("toks"), 2).as("m"),
        size(col("toks")).as("nt"))
      .collect()
    assert(edges.forall(r => r.getLong(1) >= 0))
  }
}
