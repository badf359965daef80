package graft.queries

import graft.SparkSpec

/** Round-15 pack, ninth batch: format mix, header strip, embedding
  * sanity, chunk policy.
  */
class Pipeline88Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q424: heavy sources read code-heavy, light sources stay prose with nonzero code docs") {
    val rows = q("q424_format_mix").collect()
    rows.foreach { r =>
      val (src, n, code, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(bp == code * 10000L / n)
      if (srcMod(src, 4) == 0)
        assert(r.getString(4) == "code_heavy" && bp > 2000L,
          s"code-heavy $src read $bp bp")
      else
        assert(r.getString(4) == "prose" && bp <= 2000L,
          s"prose $src read $bp bp")
    }
    assert(rows.exists(_.getString(4) == "code_heavy"))
    // the light-source ~1/20 draw keeps the classifier honest: some
    // prose source still carries a few code docs
    assert(rows.exists(r => r.getString(4) == "prose" && r.getLong(2) > 0L),
      "no code docs in any prose source — the light plant is dead")
  }

  test("q425: header sources read the exact chrome prefix; clean sources read near-zero LCP") {
    val rows = q("q425_header_strip_planner").collect()
    rows.foreach { r =>
      val (src, n, lcp, savings) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))
      assert(savings == lcp * n)
      if (srcMod(src, 9) == 1) {
        assert(r.getString(5) == "strip_candidate" &&
          lcp >= 31L, s"header source $src read lcp=$lcp")
        assert(r.getString(4) == "SITE NAV | Subscribe | Login | ")
      } else {
        assert(lcp < 8L && r.getString(5) == "clean" &&
          r.getString(4) == "",
          s"clean $src reads lcp=$lcp")
      }
    }
    assert(rows.exists(_.getString(5) == "strip_candidate"))
  }

  test("q426: only broken stores read corruption, and all three kinds occur there") {
    val rows = q("q426_embedding_sanity").collect()
    var (nanAll, zeroAll, offAll) = (0L, 0L, 0L)
    rows.foreach { r =>
      val (src, n, nan, zero, off, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(bp == (n - nan - zero - off) * 10000L / n)
      if (srcMod(src, 6) == 3) {
        assert(r.getString(6) == "corrupt_store" &&
          nan + zero + off > 0L, s"broken store $src read healthy")
        nanAll += nan; zeroAll += zero; offAll += off
      } else {
        assert(r.getString(6) == "healthy" &&
          nan + zero + off == 0L,
          s"healthy store $src reads corruption")
      }
    }
    assert(nanAll > 0L && zeroAll > 0L && offAll > 0L,
      s"a corruption kind is dead: nan=$nanAll zero=$zeroAll off=$offAll")
  }

  test("q427: policy picks the cheaper token mass and the arithmetic tiles") {
    val rows = q("q427_chunk_policy_cost").collect()
    rows.foreach { r =>
      val (n, tokens, over, lost, chunks, overhead) = (r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
        r.getLong(6))
      assert(over <= n && lost <= tokens)
      // every doc yields >= 1 chunk; over-budget docs yield >= 2
      assert(chunks >= n + over)
      assert(overhead == (chunks - n) * 8L)
      assert(r.getLong(7) == lost * 10000L / tokens)
      assert((lost > overhead) == (r.getString(8) == "chunk"))
    }
    // the ~56-token median against a 48 budget: chunking must win
    // somewhere and the census must show real over-budget mass
    assert(rows.exists(_.getString(8) == "chunk"))
    assert(rows.forall(_.getLong(3) > 0L),
      "no over-budget docs anywhere — the budget stopped biting")
  }
}
