package graft.queries

import graft.SparkSpec

/** Round-15 pack, thirteenth batch: prompt pools, conflicts, blobs,
  * loops.
  */
class Pipeline92Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q440: statuses tile, both drop reasons are live, singletons always keep") {
    val rows = q("q440_prompt_pool_dedup").collect()
    rows.foreach { r =>
      val (n, kept, dup, over) = (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))
      assert(kept + dup + over == n,
        s"${r.getString(0)}: statuses don't tile the responses")
      assert(r.getLong(5) == kept * 10000L / n)
      // ~3/4 of docs are singleton prompts, always kept
      assert(kept * 4L >= n * 2L,
        s"${r.getString(0)} kept too little — singletons leaked drops")
    }
    assert(rows.map(_.getLong(3)).sum > 0L, "no dup drops — canned plant dead")
    assert(rows.map(_.getLong(4)).sum > 0L, "no overflow drops — pools too small")
  }

  test("q441: conflict pairs page; lone dividers never do") {
    val rows = q("q441_merge_conflict_scan").collect()
    rows.foreach { r =>
      val (src, conflicts, dividers) =
        (r.getString(0), r.getLong(2), r.getLong(3))
      if (srcMod(src, 14) == 10)
        assert(r.getString(5) == "broken_checkout" && conflicts > 0L,
          s"broken checkout $src read clean")
      else
        assert(r.getString(5) == "clean" && conflicts == 0L,
          s"clean $src reads $conflicts conflicts")
      val _ = dividers
      assert(r.getLong(4) == conflicts * 10000L / r.getLong(1))
    }
    assert(rows.exists(_.getString(5) == "broken_checkout"))
    // the divider-only control fires somewhere and never pages
    assert(rows.exists(_.getLong(3) > 0L),
      "no divider-only docs — the false-positive control is dead")
  }

  test("q442: blob mass is attributed to infested sources only, with byte accounting") {
    val rows = q("q442_base64_blob_census").collect()
    rows.foreach { r =>
      val (src, blobDocs, blobBytes) =
        (r.getString(0), r.getLong(2), r.getLong(3))
      if (srcMod(src, 15) == 12) {
        assert(r.getString(5) == "binary_in_text" && blobDocs > 0L)
        // each planted blob is a 96-char run
        assert(blobBytes >= blobDocs * 96L,
          s"$src blob bytes $blobBytes < docs*96")
      } else {
        assert(r.getString(5) == "clean" && blobDocs == 0L &&
          blobBytes == 0L,
          s"clean $src reads blob mass — 48-char gate too tight?")
      }
      assert(r.getLong(4) == blobDocs * 10000L / r.getLong(1))
    }
    assert(rows.exists(_.getString(5) == "binary_in_text"))
  }

  test("q443: the verdict keys on 4-runs; natural triples/doubles never page") {
    val rows = q("q443_degenerate_loop_scan").collect()
    rows.foreach { r =>
      val (src, doubled, looped, quad, bp) = (r.getString(0),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(quad <= looped && looped <= doubled,
        s"$src: run hierarchy violated ($doubled/$looped/$quad)")
      assert(bp == quad * 10000L / r.getLong(1))
      if (srcMod(src, 16) == 13)
        assert(r.getString(6) == "degenerate_generator" && bp > 600L,
          s"looping generator $src read $bp bp")
      else
        assert(r.getString(6) == "clean",
          s"organic $src paged at $bp bp — natural runs leak")
    }
    assert(rows.exists(_.getString(6) == "degenerate_generator"))
    // natural doubles are common on the small-vocabulary fixture —
    // the census must report them without paging
    assert(rows.filter(r => srcMod(r.getString(0), 16) != 13)
      .map(_.getLong(2)).sum > 0L)
  }
}
