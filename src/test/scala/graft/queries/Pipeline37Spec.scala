package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 pack: differential pins for the rank/agreement/independence
  * statistics (each gate recomputed brute-force from the collected
  * small-SF data with the SAME integer discipline) and the collapsed
  * label-propagation contract (q288 == q186 on a dup-free corpus;
  * members inherit their rep's label on a dup-dense one).
  */
class Pipeline37Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q288 == q186 final labels when the corpus has no duplicate vectors") {
    val dups = Tables.embeddings(spark, sf)
      .select(md5(concat_ws(",",
        graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
          .cast("array<string>"))).as("k"))
      .groupBy(col("k")).count().filter(col("count") > 1).count()
    assert(dups == 0L, "fixture unexpectedly has duplicate vectors")
    val collapsed = q("q288_labelprop_collapsed").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val plain = q("q186_label_propagation").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(collapsed == plain)
    // and with no dups every node is its own rep
    assert(q("q288_labelprop_collapsed")
      .filter(col("vec_id") =!= col("rep_id")).count() == 0L)
  }

  test("q288 on a dup-dense corpus: members inherit their rep's final label") {
    val base = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .limit(60).localCheckpoint()
    val dupped = base.unionByName(
      base.select((col("vec_id") + 100000L).as("vec_id"),
        col("embedding"), col("label")))
    val dir = java.nio.file.Files.createTempDirectory("emb_dup").toString
    dupped.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = graft.SparkEntry.queries("q288_labelprop_collapsed")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.length == 120)
    val byId = out.map(r => r._1 -> r).toMap
    // every +1e5 member maps to its base row as rep and carries the
    // SAME final label
    for (i <- out.filter(_._1 >= 100000L)) {
      val baseRow = byId(i._1 - 100000L)
      assert(i._2 == baseRow._1, s"wrong rep for ${i._1}: $i")
      assert(baseRow._2 == baseRow._1, "base row should be its own rep")
      assert(i._3 == baseRow._3, s"member label diverged from rep: $i vs $baseRow")
    }
  }

  test("q289 Spearman matches the brute-force tie-aware computation") {
    val rows = Tables.lineitem(spark, sf)
      .select(expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def rank2(vs: Seq[Long]): Map[Long, Long] = {
      val cnt = vs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val sorted = cnt.keys.toSeq.sorted
      val cums = sorted.scanLeft(0L)((acc, v) => acc + cnt(v))
      sorted.zip(cums).map { case (v, before) =>
        v -> (2L * (before + cnt(v)) - cnt(v) + 1L)
      }.toMap
    }
    val rx = rank2(rows.map(_._1))
    val ry = rank2(rows.map(_._2))
    val n = rows.length.toDouble
    val (sa, sb) = (rows.map(r => rx(r._1)).sum.toDouble,
      rows.map(r => ry(r._2)).sum.toDouble)
    val ssa = rows.map(r => rx(r._1) * rx(r._1)).sum.toDouble
    val ssb = rows.map(r => ry(r._2) * ry(r._2)).sum.toDouble
    val sab = rows.map(r => rx(r._1) * ry(r._2)).sum.toDouble
    val rho = (n * sab - sa * sb) /
      (math.sqrt(n * ssa - sa * sa) * math.sqrt(n * ssb - sb * sb))
    val got = q("q289_spearman").collect().head
    assert(got.getLong(0) == rows.length)
    assert(math.abs(got.getLong(1) - math.round(rho * 1e6)) <= 1,
      s"rho_ppm ${got.getLong(1)} vs brute ${math.round(rho * 1e6)}")
    // quantity vs extended price rank-correlates near ZERO (unit price
    // dominates the row totals) — the bound check, not a sign check
    assert(math.abs(got.getLong(1)) <= 1000000L)
  }

  test("q290 Kendall tau-b matches the O(n²) brute force") {
    val rows = Tables.lineitem(spark, sf)
      .select(expr("CAST(l_quantity AS BIGINT)"),
        expr("CAST(l_linenumber AS BIGINT)"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var c = 0L; var dd = 0L
    for (i <- rows.indices; j <- (i + 1) until rows.length) {
      val sx = java.lang.Long.compare(rows(i)._1, rows(j)._1)
      val sy = java.lang.Long.compare(rows(i)._2, rows(j)._2)
      if (sx != 0 && sy != 0) { if (sx == sy) c += 1 else dd += 1 }
    }
    val got = q("q290_kendall_tau").collect().head
    assert(got.getAs[Long]("c_pairs") == c, s"C ${got.getAs[Long]("c_pairs")} vs $c")
    assert(got.getAs[Long]("d_pairs") == dd)
    val n = rows.length.toLong
    val n0 = n * (n - 1) / 2
    val n1 = rows.groupBy(_._1).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val n2 = rows.groupBy(_._2).values.map(g => g.size.toLong * (g.size - 1) / 2).sum
    val tau = (c - dd) * 1e6 / (math.sqrt((n0 - n1).toDouble) * math.sqrt((n0 - n2).toDouble))
    assert(math.abs(got.getAs[Long]("tau_b_ppm") - math.round(tau)) <= 1)
  }

  test("q291 kappa matches the exact contingency recomputation and is bounded") {
    val got = q("q291_cohens_kappa").collect().head
    val n = got.getAs[Long]("n")
    val agree = got.getAs[Long]("agree")
    val pe = got.getAs[Long]("pe_num")
    assert(got.getAs[Long]("kappa_ppm") ==
      (n * agree - pe) * 1000000L / (n * n - pe))
    assert(got.getAs[Long]("kappa_ppm") <= 1000000L &&
      got.getAs[Long]("kappa_ppm") >= -1000000L)
    // chance-agreement sanity: pe_num/n² ∈ (0, 1)
    assert(pe > 0 && pe < n * n)
  }

  test("q292 chi2 terms recompute exactly; V in [0, 1e6]") {
    val cells = Tables.events(spark, sf)
      .select(col("event_type"), expr("(ts div 86400000000000) % 7").as("dow"))
      .groupBy(col("event_type"), col("dow")).agg(count(lit(1)).as("o"))
      .collect().map(r => ((r.getString(0), r.getLong(1)), r.getLong(2)))
    val n = cells.map(_._2).sum
    val rowM = cells.groupBy(_._1._1).view.mapValues(_.map(_._2).sum).toMap
    val colM = cells.groupBy(_._1._2).view.mapValues(_.map(_._2).sum).toMap
    val chi2Centi = cells.map { case ((t, w), o) =>
      val e = rowM(t) * colM(w) * 100L / n
      val dev = o * 100L - e
      dev * dev / e
    }.sum
    val got = q("q292_chi2_cramers_v").collect().head
    assert(got.getAs[Long]("chi2_centi") == chi2Centi)
    assert(got.getAs[Long]("n") == n)
    assert(got.getAs[Long]("dof") ==
      (rowM.size - 1).toLong * (colM.size - 1))
    val v = got.getAs[Long]("v_ppm")
    assert(v >= 0L && v <= 1000000L)
  }
}
