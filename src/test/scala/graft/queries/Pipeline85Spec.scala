package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-15 pack, sixth batch: canaries, streaming sessions, packing
  * contamination, refusals.
  */
class Pipeline85Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q412: eval-a hits only leaky sources, eval-b reads zero everywhere, train canary is benign") {
    val rows = q("q412_canary_census").collect()
    assert(rows.length == 60) // 20 sources x 3 canaries
    rows.foreach { r =>
      val (src, canary, kind, hits, verdict) = (r.getString(0),
        r.getString(1), r.getString(2), r.getLong(4), r.getString(6))
      if (canary.startsWith("eval-b-"))
        assert(hits == 0L && verdict == "clear",
          s"false positive: unplanted eval-b hit in $src")
      if (canary.startsWith("eval-a-")) {
        if (srcMod(src, 8) == 2)
          assert(hits > 0L && verdict == "leaked",
            s"leaky $src missed the eval-a canary")
        else assert(hits == 0L && verdict == "clear")
      }
      if (kind == "train")
        assert(verdict == "clear", "train canary must never page")
      assert(r.getLong(5) == hits * 10000L / r.getLong(3))
    }
    // the train canary DOES occur (proves the scan sees it and the
    // verdict logic, not the scan, is what spares it)
    assert(rows.filter(_.getString(2) == "train").map(_.getLong(4)).sum > 0L)
    assert(rows.exists(_.getString(6) == "leaked"))
  }

  test("q413: streaming emitted + watermark-withheld == batch sessions, and only open tails are withheld") {
    val emitted = q("q413_stream_sessionize")
    val ev = Tables.events(spark, sf)
    val maxUs = ev.agg(max(expr("ts div 1000"))).collect()(0).getLong(0)
    val batch = graft.streaming.EventsProfile
      .sessionizeBatch(ev, gapUs = 60L * 1000 * 1000)
    val nBatch = batch.count()
    val nEmitted = emitted.count()
    assert(nEmitted < nBatch,
      "append mode must withhold the still-open tail")
    // every emitted session closed before the final watermark
    val badEnd = emitted.filter(col("end_us") > maxUs).count()
    assert(badEnd == 0L, s"$badEnd sessions emitted past the watermark")
    // event mass is conserved up to the open tail: the withheld
    // sessions are exactly those whose end (last event + gap) would
    // outlive the final watermark — rebuild them batch-side and check
    // emitted + withheld == batch, events summing to the full stream
    val gap = 60L * 1000 * 1000
    val sess = ev.select(col("user_id"), expr("ts div 1000").as("us"))
      .withColumn("new_s", (col("us") - lag(col("us"), 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("us")) > gap).cast("long"))
      .withColumn("sid", sum(coalesce(col("new_s"), lit(0L))).over(
        org.apache.spark.sql.expressions.Window.partitionBy("user_id")
          .orderBy("us")))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n"), (max(col("us")) + gap).as("end_us"))
    val withheld = sess.filter(col("end_us") > maxUs)
    assert(nEmitted + withheld.count() == nBatch,
      "emitted + withheld must partition the batch sessions")
    val emittedEvents = emitted.agg(sum(col("n_events")))
      .collect()(0).getLong(0)
    val withheldEvents = withheld.agg(sum(col("n")))
      .collect()(0).getLong(0)
    assert(emittedEvents + withheldEvents == ev.count(),
      "session event mass lost between stream and batch")
  }

  test("q414: pair combinatorics are exact and shorter docs mean more cross-doc attention") {
    val rows = q("q414_pack_boundary_census").collect()
    rows.foreach { r =>
      val (bins, docs, cross, total, bp) = (r.getLong(1), r.getLong(2),
        r.getLong(4), r.getLong(5), r.getLong(7))
      assert(cross >= 0L && cross <= total)
      assert(bp == cross * 10000L / total)
      assert(r.getLong(6) == docs * 1000L / bins)
      assert((bp > 3000L) == (r.getString(8) == "needs_doc_masking"))
    }
    // fixture docs average ~40 tokens against a 256-token bin: many
    // docs per bin, so cross-doc mass dominates everywhere
    assert(rows.forall(_.getLong(7) > 3000L),
      "a ~40-token-doc corpus packed to 256 must need doc masking")
    // monotone sanity: the source with the most docs-per-bin is at
    // least as contaminated as the one with the fewest
    val byDensity = rows.sortBy(_.getLong(6))
    assert(byDensity.last.getLong(7) >= byDensity.head.getLong(7) - 500L)
  }

  test("q415: over-refusing sources page; hedge-only sources stay ok") {
    val rows = q("q415_refusal_census").collect()
    rows.foreach { r =>
      val (src, n, refusals, hedges, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))
      assert(bp == refusals * 10000L / n)
      if (srcMod(src, 9) == 3)
        assert(r.getString(5) == "over_refusing" && bp > 1500L,
          s"over-refusing $src read $bp bp")
      else
        assert(refusals == 0L && r.getString(5) == "ok",
          s"clean $src reads $refusals refusals")
      assert(hedges >= 0L && hedges < n)
    }
    assert(rows.exists(_.getString(5) == "over_refusing"))
    // hedging occurs in clean sources and is not held against them
    assert(rows.exists(r => r.getString(5) == "ok" && r.getLong(3) > 0L),
      "no hedge drawn in any ok source — the control arm is dead")
  }
}
