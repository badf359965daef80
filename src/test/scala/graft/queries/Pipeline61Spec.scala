package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-13 pack, ninth batch: Krippendorff alpha, int8 quantization
  * planner, IPF raking.
  */
class Pipeline61Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q347: coincidence matrix accounting + driver-recomputed alpha") {
    val rows = q("q347_krippendorff_alpha").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 16)
    val o2 = rows.map(t => (t._1, t._2) -> t._3).toMap
    // symmetry: ordered-pair counting is symmetric in (c, c')
    o2.foreach { case ((a, b), v) => assert(o2((b, a)) == v) }
    val nJudge = rows.head._5
    // every unit contributes m(m-1) = 6 ordered pairs; N = 3U
    assert(o2.values.sum == 2L * nJudge)
    // class marginals tile the judgment count (each n_c appears on 4 rows)
    assert(rows.filter(_._2 == 0L).map(_._4).sum == nJudge)
    val alpha = rows.head._6
    assert(rows.forall(_._6 == alpha))
    assert(alpha > 0L && alpha < 1000000L)

    // differential: recompute alpha from the raw per-annotator labels
    // (same md5 coin, collected) with BigInt arithmetic
    val labels = graft.queries.Tables.documents(spark, sf)
      .select(col("doc_id"), pmod(col("n_chars"), lit(4L)).as("base"))
      .select(col("doc_id"), col("base"),
        explode(array(lit(1L), lit(2L), lit(3L))).as("ann"))
      .select(col("doc_id"),
        expr("CAST(conv(substring(md5(concat('ann', " +
          "CAST(ann AS STRING), ':', CAST(doc_id AS STRING))), " +
          "1, 6), 16, 10) AS BIGINT) % 1000000").as("u"),
        col("base"),
        expr("CASE ann WHEN 1 THEN 0L WHEN 2 THEN 100000L " +
          "ELSE 200000L END").as("p"))
      .select(col("doc_id"),
        when(col("u") < col("p"),
          pmod(col("base") + 1L + pmod(col("u"), lit(3L)), lit(4L)))
          .otherwise(col("base")).as("lbl"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = labels.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dO2 = BigInt(0)
    byDoc.values.foreach { ls =>
      for (i <- ls.indices; j <- ls.indices if i != j)
        if (ls(i) != ls(j)) dO2 += 1
    }
    val nC = labels.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = BigInt(labels.length)
    var dE = BigInt(0)
    for (a <- nC.keys; b <- nC.keys if a != b)
      dE += BigInt(nC(a)) * BigInt(nC(b))
    val expected = BigInt(1000000) -
      ((n - 1) * dO2 * BigInt(1000000)) / (2 * dE)
    assert(alpha == expected.toLong,
      s"alpha $alpha vs driver-recomputed $expected")
    assert(nJudge == n.toLong)
  }

  test("q348: round-trip error within the 255-step bound; stats consistent") {
    val rows = q("q348_int8_quant_planner").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.length == 64)
    rows.foreach { case (_, vmin, vmax, range, maxErr, meanMilli) =>
      assert(vmin <= vmax)
      assert(range == math.max(1L, vmax - vmin))
      // affine round trip loses at most one grid step of range/255
      assert(maxErr <= range / 255L + 1L,
        s"max_err $maxErr vs bound ${range / 255L + 1L}")
      assert(meanMilli >= 0L && meanMilli <= maxErr * 1000L)
    }
  }

  test("q349: raking hits the uniform source marginal, preserves lang mix") {
    val rows = q("q349_ipf_raking").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    val srcSums = rows.groupBy(_._1).view.mapValues(_.map(_._5).sum).toMap
    val nSrc = srcSums.size
    val target = 1000000L / nSrc
    // after 3 rounds + a final lang pass the source sums sit near the
    // uniform target — integer truncation costs at most a few ppm per
    // cell, and the last lang-step perturbs by its own truncation
    srcSums.values.foreach { s =>
      assert(math.abs(s - target) * 100L <= target * 5L,
        s"source sum $s vs target $target")
    }
    // lang marginal: w3 lang shares track the observed lang shares
    val n = rows.map(_._3).sum
    val langW = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum).toMap
    val langN = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    langW.foreach { case (lang, w) =>
      val obs = langN(lang) * 1000000L / n
      assert(math.abs(w - obs) * 100L <= obs * 5L + 100L,
        s"lang $lang raked $w vs observed $obs")
    }
    rows.foreach { case (_, _, _, w0, w3, f) =>
      assert(f == w3 * 1000000L / math.max(1L, w0))
    }
  }
}
