package graft.queries

import graft.SparkSpec

/** Round-15 pack, fifth batch: post-training data hygiene. */
class Pipeline84Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q408: the ladder is monotone and every rung catches its plant") {
    val rows = q("q408_dedup_ladder").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows.size == 4)
    val d = (0 to 3).map(i => rows(i.toLong).getLong(2))
    // monotone: each rung can only merge groups
    assert(d(0) >= d(1) && d(1) >= d(2) && d(2) >= d(3))
    // every planted rung catches something beyond the previous one
    for (i <- 1 to 3)
      assert(rows(i.toLong).getLong(4) > 0L,
        s"rung $i caught nothing — its plant is dead")
    // internal consistency: dup_docs = n - distinct, same n on all rungs
    val n0 = rows(0L).getLong(2) + rows(0L).getLong(3)
    rows.values.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) == n0)
    }
    // marginals telescope back to rung-0 distinct
    assert(rows(0L).getLong(2) -
      (1 to 3).map(i => rows(i.toLong).getLong(4)).sum == rows(3L).getLong(2))
    // names pinned (downstream tooling keys on them)
    assert((0 to 3).map(i => rows(i.toLong).getString(1)) ==
      Seq("raw", "casefold", "punct_ws", "digit_mask"))
  }

  test("q409: homoglyph sources flag 'spoofed'; pure-Cyrillic sources stay 'multilingual'") {
    val rows = q("q409_script_mix_audit").collect()
    rows.foreach { r =>
      val (src, mixed, hg, verdict) =
        (r.getString(0), r.getLong(2), r.getLong(3), r.getString(5))
      srcMod(src, 6) match {
        case 0 =>
          assert(verdict == "spoofed" && hg > 0L,
            s"$src carries the homoglyph plant but read '$verdict'")
        case 1 =>
          assert(verdict == "multilingual" && hg == 0L && mixed > 0L,
            s"legit multilingual $src misread as '$verdict' (hg=$hg)")
        case _ =>
          assert(verdict == "clean" && mixed == 0L && hg == 0L,
            s"clean source $src reads mixed=$mixed hg=$hg")
      }
      assert(r.getLong(4) == mixed * 10000L / r.getLong(1))
      // a homoglyph doc is by definition mixed-script
      assert(hg <= mixed)
    }
    assert(rows.exists(_.getString(5) == "spoofed"))
    assert(rows.exists(_.getString(5) == "multilingual"))
    assert(rows.exists(_.getString(5) == "clean"))
  }

  test("q410: only feed-broken sources read malformed; flags partition the plants") {
    val rows = q("q410_conversation_audit").collect()
    var (altAll, emptyAll, endAll) = (0L, 0L, 0L)
    rows.foreach { r =>
      val (src, n, alt, empty, end, valid) = (r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))
      if (srcMod(src, 7) == 0) {
        // a broken feed always carries SOME malformation (the three
        // ~1/12 draws are per-doc; which kinds hit a 25-doc source at
        // sf0.001 varies, so kind coverage is asserted globally below)
        assert(alt + empty + end > 0L,
          s"feed-broken $src reads fully valid")
        assert(valid + alt + empty + end >= n,
          "flag mass lost conversations")
        altAll += alt; emptyAll += empty; endAll += end
      } else {
        assert(r.getString(7) == "well_formed" && valid == n &&
          alt + empty + end == 0L,
          s"clean feed $src reads malformed rows")
      }
      assert(r.getLong(6) == r.getLong(5) * 10000L / r.getLong(1))
    }
    // every malformation kind occurs across the broken feeds
    assert(altAll > 0L && emptyAll > 0L && endAll > 0L,
      s"a plant kind is dead: alt=$altAll empty=$emptyAll end=$endAll")
    assert(rows.exists(_.getString(7) == "malformed_feed"),
      "no malformed source despite the feed plant")
  }

  test("q411: biased sources read 10000 bp longer-chosen; unbiased hover near the coin flip") {
    val rows = q("q411_preference_pair_audit").collect()
    rows.foreach { r =>
      val (src, n, degen, dup, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(5))
      if (srcMod(src, 5) == 1) {
        assert(bp == 10000L && r.getString(6) == "length_biased",
          s"length-biased $src read $bp bp")
      } else {
        // 25 docs/source at sf0.001 — the md5 coin flip swings wide
        // (observed 2608–5909); the band only pins "nowhere near 10000"
        assert(bp >= 2000L && bp <= 8000L,
          s"unbiased $src read $bp bp — the coin flip drifted")
        assert(r.getString(6) == "ok")
      }
      assert(degen >= 0L && degen < n)
      // the shared-prompt plant guarantees dup mass in any source with
      // >= 2 drawn docs; structural bound only
      assert(dup == 0L || dup >= 2L)
    }
    assert(rows.exists(_.getString(6) == "length_biased"))
    assert(rows.exists(_.getLong(2) > 0L), "no degenerate pairs drawn")
    assert(rows.exists(_.getLong(3) > 0L), "no duplicate prompts drawn")
  }
}
