package graft.queries

import graft.SparkSpec

/** Round-15 pack, twelfth batch: pairing, label noise, injection,
  * invisible chars.
  */
class Pipeline91Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  private def srcMod(src: String, mod: Long): Long =
    java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils.md5Hex(src)
        .substring(0, 2), 16) % mod

  test("q436: all three drift kinds are live and the store sentinel carries the orphans") {
    val rows = q("q436_pairing_audit").collect()
    val store = rows.find(_.getString(0) == "__store__").get
    assert(store.getLong(4) > 0L, "no orphan vectors despite the shift plant")
    val sources = rows.filter(_.getString(0) != "__store__")
    assert(sources.forall(_.getLong(4) == 0L),
      "orphan vectors must ride the store sentinel only")
    assert(sources.map(_.getLong(2)).sum > 0L, "no unembedded docs")
    assert(sources.map(_.getLong(3)).sum > 0L, "no multi-embedded docs")
    rows.foreach { r =>
      val drift = r.getLong(2) + r.getLong(3) + r.getLong(4)
      assert((drift > 0L) == (r.getString(5) == "pairing_drift"))
    }
  }

  test("q437: noisy labelers page past 500 bp inversion; clean feeds read zero inversions") {
    val rows = q("q437_preference_label_noise").collect()
    rows.foreach { r =>
      val (src, n, pos, zero, inv, bp) = (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(pos + zero + inv == n, s"$src margins don't tile")
      assert(bp == inv * 10000L / n)
      if (srcMod(src, 12) == 9)
        assert(r.getString(6) == "noisy_labels" && inv > 0L,
          s"noisy $src read $bp bp")
      else {
        // an unswapped pair can invert only if the 6-token slice
        // out-scores the full text — impossible for a prefix slice
        assert(inv == 0L && r.getString(6) == "consistent",
          s"clean $src reads $inv inversions")
      }
      // zero margins exist (docs whose stopwords all sit in the first
      // 6 tokens) — the census must not lump them into inversions
      assert(zero >= 0L)
    }
    assert(rows.exists(_.getString(6) == "noisy_labels"))
  }

  test("q438: injection carriers are exactly the compromised feeds") {
    val rows = q("q438_prompt_injection_scan").collect()
    rows.foreach { r =>
      val (src, hits) = (r.getString(0), r.getLong(2))
      if (srcMod(src, 10) == 7)
        assert(r.getString(4) == "injection_carrier" && hits > 0L,
          s"compromised $src read clean")
      else
        assert(r.getString(4) == "clean" && hits == 0L,
          s"clean $src reads $hits injected docs — regex too loose?")
      assert(r.getLong(3) == hits * 10000L / r.getLong(1))
    }
    assert(rows.exists(_.getString(4) == "injection_carrier"))
  }

  test("q439: zero-width and bidi plants are attributed; clean sources read zero") {
    val rows = q("q439_invisible_char_scan").collect()
    var (zwAll, bdAll) = (0L, 0L)
    rows.foreach { r =>
      val (src, zw, bd) = (r.getString(0), r.getLong(2), r.getLong(3))
      if (srcMod(src, 13) == 11) {
        assert(r.getString(5) == "hidden_chars" && zw + bd > 0L)
        zwAll += zw; bdAll += bd
      } else {
        assert(zw == 0L && bd == 0L && r.getString(5) == "clean",
          s"clean $src reads hidden chars")
      }
      assert(r.getLong(4) == (zw + bd) * 10000L / r.getLong(1))
    }
    assert(zwAll > 0L && bdAll > 0L,
      s"a plant kind is dead: zw=$zwAll bidi=$bdAll")
  }
}
