package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.profile.Detector

/** Round-12 ninth batch: the register(spec) arm detects like a
  * built-in, padding-waste identities, temperature-mix brackets.
  */
class Pipeline45Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q315 card TypeSpec: Luhn boundary split and one-job detection") {
    val rows = q("q315_registered_card_validate").collect()
      .map(r => r.getLong(0) % 6 -> r.getInt(2)).toMap
    // ...366 passes the checksum, its off-by-one twin ...367 fails
    assert(rows(0L) == 1 && rows(2L) == 5, s"Luhn boundary lost: $rows")
    assert(rows(1L) == 2 && rows(3L) == 4 && rows(4L) == 5 && rows(5L) == 1)

    // detection through the SAME one-job path, zip-shaped control silent
    val t2 = Tables.customer(spark, sf)
      .select(col("c_custkey"), Synth.zip.as("control_col"),
        Pipeline45.cardCol.as("card_col"))
    val detected = Detector.detect(t2, Seq(Pipeline45.cardSpec),
      sampleN = 100, candidateCols = Some(Seq("card_col", "control_col")))
    assert(detected.map(d => (d.column, d.semType)).toSet ==
      Set(("card_col", "card")), s"got $detected")
  }

  test("q316 padding waste: token conservation and monotonicity") {
    val out = q("q316_padding_waste").orderBy(col("len_cap")).collect()
    val totalTok = Tables.documents(spark, sf)
      .agg(sum(size(split(lower(col("text")), "\\s+"))))
      .head().getLong(0)
    out.foreach { r =>
      assert(r.getLong(3) + r.getLong(4) == totalTok,
        s"kept + cut != total at L=${r.getLong(0)}")
      assert(r.getLong(6) <= 1000000L)
    }
    assert(out.map(_.getLong(2)).toSeq == // n_trunc nonincreasing in L
      out.map(_.getLong(2)).toSeq.sorted.reverse)
    assert(out.map(_.getLong(3)).toSeq == // kept nondecreasing in L
      out.map(_.getLong(3)).toSeq.sorted)
  }

  test("q317 temperature mix: probabilities sum to 1, tail boosted") {
    val out = q("q317_temperature_mix").collect()
      .groupBy(_.getLong(0))
    out.foreach { case (alpha, rows) =>
      val pSum = rows.map(_.getDouble(4)).sum
      assert(math.abs(pSum - 1.0) < 1e-3, s"alpha $alpha: p sums to $pSum")
    }
    // alpha = 1.0 reproduces natural sampling
    out(100L).foreach { r =>
      assert(math.abs(r.getDouble(5) - 1.0) < 1e-4,
        s"alpha=1 upsample != 1: $r")
    }
    // alpha = 0.25 boosts the smallest source, damps the largest
    val cold = out(25L).sortBy(_.getLong(2))
    assert(cold.head.getDouble(5) > 1.0, s"tail not boosted: ${cold.head}")
    assert(cold.last.getDouble(5) < 1.0, s"head not damped: ${cold.last}")
  }
}
