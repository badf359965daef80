package graft.queries

import graft.SparkSpec

/** Round-15 pack, seventh batch: tokenizer migration, license gate,
  * SFT yield, judge bias.
  */
class Pipeline86Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q416: more merges shrink every source and the corpus baseline is one constant") {
    val rows = q("q416_tokenizer_migration").collect()
    val corpusPm = rows.head.getLong(4)
    rows.foreach { r =>
      val (to, tn, shrink, dev) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(tn < to, s"${r.getString(0)}: 8 merges didn't shrink")
      assert(shrink == (to - tn) * 1000L / to)
      assert(r.getLong(4) == corpusPm,
        "corpus shrink must be the same scalar on every row")
      assert(dev == math.abs(shrink - corpusPm))
      assert((dev > 15L) == (r.getString(6) == "skewed_impact"))
    }
    // the fixture vocabulary is homogeneous across sources — migration
    // impact is uniform (observed dev <= 6 pm); the verdict machinery
    // is exercised by the formula check above
    assert(rows.forall(_.getString(6) == "uniform"))
  }

  test("q417: drop reasons partition each source and the shadow library poisons its originals") {
    val rows = q("q417_license_dedup_gate").collect()
    val bySrc = rows.map(r => r.getString(0) -> r).toMap
    rows.foreach { r =>
      assert(r.getLong(2) + r.getLong(3) + r.getLong(4) == r.getLong(1),
        s"${r.getString(0)}: kept + dropped reasons != n_docs")
      assert(r.getLong(5) == r.getLong(2) * 10000L / r.getLong(1))
    }
    // the pirate mirror keeps nothing and every drop is its own license
    val shadow = bySrc("shadow_lib")
    assert(shadow.getLong(2) == 0L &&
      shadow.getLong(3) == shadow.getLong(1))
    // cluster poisoning is live: some original source loses
    // own-license-clean docs to a restricted twin
    assert(rows.filter(_.getString(0) != "shadow_lib")
      .map(_.getLong(4)).sum > 0L,
      "no cluster-poison drops — the shadow_lib plant is dead")
    // and licenses alone drop mass too (noncommercial/restricted draws)
    assert(rows.map(_.getLong(3)).sum > 0L)
  }

  test("q418: verbose-prompt sources read low yield; masses tile the corpus") {
    val rows = q("q418_sft_token_yield").collect()
    rows.foreach { r =>
      val (src, n, p, resp, oh, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(oh == n * 6L)
      assert(bp == resp * 10000L / (p + resp + oh))
      if (srcMod(src, 11) == 4)
        assert(r.getString(6) == "low_yield" && bp < 4000L,
          s"verbose $src read $bp bp")
      else
        assert(r.getString(6) == "ok" && bp >= 4000L,
          s"normal $src read $bp bp")
    }
    assert(rows.exists(_.getString(6) == "low_yield"),
      "no verbose source despite the plant")
  }

  test("q419: the binomial flag pages exactly the biased judges") {
    val rows = q("q419_judge_position_bias").collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val (judge, n, wa, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(bp == wa * 10000L / n)
      val z2 = (2L * wa - n) * (2L * wa - n)
      assert((z2 > 9L * n) == (r.getString(4) == "position_biased"))
      val biased = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(judge)
          .substring(0, 2), 16) % 4 == 0
      if (biased) {
        assert(r.getString(4) == "position_biased",
          s"biased $judge slipped the binomial net at $bp bp")
        assert(bp >= 8300L && bp <= 9600L)
      } else {
        assert(r.getString(4) == "ok",
          s"honest $judge falsely paged at $bp bp")
        assert(bp >= 4000L && bp <= 6000L)
      }
    }
    assert(rows.exists(_.getString(4) == "position_biased"))
    assert(rows.exists(_.getString(4) == "ok"))
  }
}
