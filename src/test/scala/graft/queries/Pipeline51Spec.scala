package graft.queries

import graft.SparkSpec

/** Round-12 pack, fifteenth batch: Fellegi–Sunter m/u accounting and
  * the fixture's discriminative structure (deletion typos make length
  * DISAGREEMENT the match evidence).
  */
class Pipeline51Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q329: m/u bounds, balanced labels, and the fixture's feature story") {
    val rows = q("q329_fellegi_sunter").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5))).toMap
    assert(rows.keySet == Set("jw_hi", "sdx_eq", "len_eq"))
    rows.values.foreach { case (nm, nn, m, u, w) =>
      assert(nm == nn, "one planted match per control pair")
      assert(m >= 0 && m <= 1000000L && u >= 0 && u <= 1000000L)
      assert(w == m * 1000000L / math.max(1L, u))
    }
    // deletion typos ALWAYS change length; adjacent-key controls never
    // do — length agreement is pure non-match evidence on this fixture
    val (_, _, mLen, uLen, wLen) = rows("len_eq")
    assert(mLen == 0 && uLen == 1000000L && wLen == 0)
    // JW >= 0.95 fires on matches (single deletion in an 18-char name)
    val (_, _, mJw, _, _) = rows("jw_hi")
    assert(mJw == 1000000L)
  }
}
