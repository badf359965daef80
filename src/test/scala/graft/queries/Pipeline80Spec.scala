package graft.queries

import graft.SparkSpec

/** Round-15 pack, first batch: the collapse-first detector-disagreement
  * cell census (q394, the production arm of q387).
  */
class Pipeline80Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q394: cell invariants — flags, evidence geometry, implied-pair expansion") {
    val rows = q("q394_detector_disagreement_cells").collect()
    assert(rows.nonEmpty)
    val flags = rows.map(_.getString(0)).toSet
    // the planted mild/strong edits put mass in every disagreement class
    assert(flags == Set("both", "minhash_only", "simhash_only"))
    rows.foreach { r =>
      val (flag, jBand, hamming) =
        (r.getString(0), r.getLong(1), r.getLong(2))
      val (nRep, implied) = (r.getLong(3), r.getLong(4))
      assert(jBand >= 0L && jBand <= 20L, s"j_band $jBand out of range")
      assert(hamming >= 0L && hamming <= 32L)
      assert(nRep >= 1L)
      // every rep pair expands to >= 1 raw pair; dup groups to more
      assert(implied >= nRep, s"cell ($flag,$jBand,$hamming): " +
        s"implied $implied < n_rep_pairs $nRep")
      flag match {
        // both: passed the 4/5 Jaccard verify AND Hamming <= 3
        case "both" => assert(jBand >= 16L && hamming <= 3L)
        // minhash_only: Jaccard passed; the 4x8-bit bands GUARANTEE
        // recall at Hamming <= 3 (3 flips cannot hit all 4 bands), so
        // absent cap events the signature distance must exceed 3
        case "minhash_only" => assert(jBand >= 16L && hamming > 3L)
        // simhash_only: within Hamming 3; Jaccard is usually below the
        // 4/5 bar, but can sit above it when the pair escaped all 4
        // MinHash bands (LSH recall at J ~= 0.8 is ~0.88, not 1 — the
        // calibration gap this census exists to surface)
        case "simhash_only" => assert(hamming <= 3L)
      }
    }
    // the exact-dup plants (every 8th/16th doc) must make the collapse
    // visible: at least one cell carries more raw mass than rep pairs
    assert(rows.exists(r => r.getLong(4) > r.getLong(3)),
      "no cell shows implied_pairs > n_rep_pairs — collapse not exercised")
  }
}
