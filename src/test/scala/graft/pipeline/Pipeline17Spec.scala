package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.SparkEntry

/** Structural invariants for the q213–q216 pack. */
class Pipeline17Spec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q213 pooling: frame count = ceil(ceil(len/64)/2) per clip") {
    val docs = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id").as("media_id"), length(col("text")).as("len"))
    val bad = q("q213_clip_pooling").join(docs, "media_id")
      .filter(col("n_frames") =!=
        expr("((((len + 63) div 64) + 1) div 2)"))
      .count()
    assert(bad === 0)
  }

  test("q214 MMR: 3 distinct picks per query, first is the top hit") {
    val out = q("q214_mmr_diversify")
    val perQ = out.groupBy("q_id")
      .agg(count(lit(1)).as("n"), countDistinct("id").as("d"),
        min(when(col("pick") === 1, col("rn"))).as("rn1"),
        min(when(col("pick") === 1, col("red_bp"))).as("red1"))
    assert(perQ.filter(col("n") =!= 3 || col("d") =!= 3 ||
      col("rn1") =!= 1 || col("red1") =!= 0).count() === 0)
    // λ = 0.7 arithmetic: mmr = 7·rel − 3·red with rel = (9 − rn)·1250
    assert(out.filter(col("mmr") =!=
      lit(7L) * (lit(9L) - col("rn")) * 1250L - lit(3L) * col("red_bp"))
      .count() === 0)
  }

  test("q215 histogram quantiles: estimate within one bucket below exact") {
    val bw = graft.queries.Tables.load(spark, sf, "orders")
      .select(col("o_orderpriority").as("prio"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy("prio").agg(expr("(max(cents) div 32) + 1").as("bw"))
    val bad = q("q215_histogram_quantile").join(bw, "prio")
      .filter(col("err_p50") > 0 || col("err_p50") <= -col("bw") ||
        col("err_p90") > 0 || col("err_p90") <= -col("bw"))
      .count()
    assert(bad === 0)
  }

  test("q216 sessions: conversion bounded, session count covers users") {
    val out = q("q216_session_conversion")
    assert(out.filter(col("n_converted") > col("n_sessions") ||
      col("conversion_bp") > 10000 || col("mean_dur_us") < 0)
      .count() === 0)
    val users = graft.queries.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    val sessions = out.agg(sum("n_sessions")).head().getLong(0)
    assert(sessions >= users) // every user has at least one session
  }
}
