package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q193–q199 pack, beyond the DuckDB
  * oracle hash (which pins values): the properties that must hold by
  * CONSTRUCTION, so a refactor that accidentally changes semantics
  * fails here with a named reason instead of an opaque hash mismatch.
  */
class Pipeline13Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q193 ROUGE: candidate is a sub-multiset — m1 = c1 = r1 - r1/3") {
    // dropping every 3rd token can't create unigrams, so unigram
    // precision is exactly 1 and the candidate count is r1 - floor(r1/3)
    val bad = q("q193_rouge_eval")
      .filter(col("m1") =!= col("c1") ||
        col("c1") =!= col("r1") - expr("r1 div 3") ||
        col("m2") > col("c2") || col("f1_bp") > 10000 ||
        col("f2_bp") > 10000)
      .count()
    assert(bad === 0)
  }

  test("q194 BLEU: corpus precision bounds and brevity < 1") {
    val bad = q("q194_bleu_corpus")
      .filter(col("p1_bp") =!= 10000 || // sub-multiset ⇒ clipped p1 ≡ 1
        col("p2_bp") > 10000 || col("p2_bp") < 0 ||
        col("brevity_bp") >= 10000 || col("cand_len") >= col("ref_len"))
      .count()
    assert(bad === 0)
  }

  test("q195 chunks: offsets slice the source text to the digested chunk") {
    // recompute each chunk from the original text via substring on the
    // reported [char_lo, char_hi) and compare digests — certifies the
    // offsets are REAL positions, not just internally consistent
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"),
        concat_ws(" ", split(lower(col("text")), "\\s+")).as("norm"))
    val bad = q("q195_rag_chunks")
      .join(docs, "doc_id")
      .filter(md5(expr("substring(norm, char_lo + 1, char_hi - char_lo)"))
        =!= col("chunk_digest"))
      .count()
    assert(bad === 0)
  }

  test("q195 chunks: ceil(n/stride) chunks per doc, last ends at text end") {
    val perDoc = q("q195_rag_chunks").groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), max("char_hi").as("last_hi"),
        max("chunk_idx").as("max_idx"))
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"),
        size(split(lower(col("text")), "\\s+")).as("n"),
        length(concat_ws(" ", split(lower(col("text")), "\\s+")))
          .as("norm_len"))
    val bad = perDoc.join(docs, "doc_id")
      .filter(col("n_chunks") =!= expr("(n + 11) div 12") ||
        col("last_hi") =!= col("norm_len") ||
        col("max_idx") =!= col("n_chunks") - 1)
      .count()
    assert(bad === 0)
  }

  test("q196 run-collapse: counts reconcile and collapse is idempotent") {
    import spark.implicits._
    val out = q("q196_run_collapse")
    assert(out.filter(col("n_kept") + col("n_removed") =!= col("n_toks") ||
      col("max_run") < 1 || col("n_kept") < 1).count() === 0)
    // idempotence on a crafted stutter: collapsing twice = collapsing once
    val crafted = Seq((1L, "a a a b b c a"), (2L, "x"), (3L, "y y"))
      .toDF("doc_id", "text")
    val collapse = expr("array_join(filter(transform(toks, (t, i) -> " +
      "struct(t AS t, i AS i)), s -> s.i = 0 OR toks[s.i - 1] != s.t).t," +
      " ' ')")
    val once = crafted
      .select(col("doc_id"), split(col("text"), "\\s+").as("toks"))
      .select(col("doc_id"), collapse.as("clean"))
    val twice = once
      .select(col("doc_id"), split(col("clean"), "\\s+").as("toks"))
      .select(col("doc_id"), collapse.as("clean"))
    assert(once.collect().toSet === twice.collect().toSet)
    assert(once.filter(col("doc_id") === 1).head.getString(1) === "a b c a")
  }

  test("q197 KMV set ops: sketch bounds hold for every pair") {
    val srcPairs = 20 * 19 / 2 // the fixture's 20 sources, all pairs
    val out = q("q197_kmv_setops")
    assert(out.count() === srcPairs)
    assert(out.filter(col("nk") > 64 || col("shared") > col("nk") ||
      col("jaccard_bp") > 10000 || col("union_est") < col("nk"))
      .count() === 0)
  }

  test("q198 HITS: each renormalized score vector sums to ~1e6") {
    val out = q("q198_hits")
    // floor-div renorm loses < 1 ppm per vertex; the filtered output can
    // additionally drop zero-score rows, which lose nothing
    val Array(sa, sh, n) = out
      .agg(sum("authority_ppm"), sum("hub_ppm"), count(lit(1)))
      .head().toSeq.map(_.toString.toLong).toArray
    assert(sa <= 1000000L && sa > 1000000L - n - 1)
    assert(sh <= 1000000L && sh > 1000000L - n - 1)
  }

  test("q199 k-core: 4 peel rounds converge — a 5th removes nobody") {
    val r4 = graft.queries.Pipeline13.kcore(spark, sf, rounds = 4)
    val r5 = graft.queries.Pipeline13.kcore(spark, sf, rounds = 5)
    assert(r4.collect().toSet === r5.collect().toSet)
    assert(r4.filter(col("core_deg") < 2).count() === 0)
  }
}
