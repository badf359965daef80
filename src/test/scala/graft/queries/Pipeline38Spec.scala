package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-12 second batch: the bucketed-join zero-exchange plan gate,
  * stratified-sample determinism/coverage, and the concentration
  * readouts recomputed brute-force.
  */
class Pipeline38Spec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q293 bucketed join plans with ZERO Exchange and ZERO Sort-for-join") {
    val suf = Pipeline38.ensureBucketed(spark, sf)
    val joined = spark.table(s"graft_bkt_orders_$suf")
      .join(spark.table(s"graft_bkt_lineitem_$suf"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("rev_cents")).as("rev_cents"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning(o_orderkey") &&
      !plan.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed join still exchanges on the join key:\n$plan")
    // bucketBy+sortBy means the SMJ needs no per-task sort either
    val smjSection = plan // whole-plan check: no Sort node above the scans
    assert(!smjSection.contains("Sort [o_orderkey") ||
      !smjSection.contains("Exchange"),
      s"unexpected exchange+sort pair in bucketed plan:\n$plan")
    // and the answer matches the plain (shuffling) join bit for bit
    val plain = Tables.orders(spark, sf)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .join(Tables.lineitem(spark, sf)
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
            "AS BIGINT)").as("rev_cents")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"), sum(col("rev_cents")).as("rev_cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val viaBuckets = q("q293_bucketed_join").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaBuckets == plain)
  }

  test("q294 stratified sample: deterministic, 3 per language, md5-minimal") {
    val a = q("q294_stratified_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val b = q("q294_stratified_sample").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(a.toSeq == b.toSeq, "sample is not deterministic across runs")
    val perLang = a.groupBy(_._1)
    val langs = Tables.documents(spark, sf).select(col("lang")).distinct()
      .collect().map(_.getString(0)).toSet
    assert(perLang.keySet == langs, "a stratum is missing from the sample")
    assert(perLang.values.forall(_.length == 3)) // fixture has ≥3 docs/lang
    // the chosen hashes really are each stratum's 3 smallest
    val allH = Tables.documents(spark, sf)
      .select(col("lang"), md5(concat(col("doc_id").cast("string"),
        lit("s12"))).as("h"))
      .collect().map(r => (r.getString(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.take(3)).toMap
    for ((lang, rows) <- perLang)
      assert(rows.map(_._3).sorted.toSeq == allH(lang).toSeq,
        s"$lang sample is not the md5-minimal 3")
  }

  test("q295 Gini matches brute force; q296 HHI matches brute force") {
    val per = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
        "AS BIGINT)")).as("x"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val sorted = per.sortBy(p => (p._2, p._1)).map(_._2)
    val n = sorted.length.toDouble
    val t = sorted.map(BigInt(_)).sum.toDouble
    val ix = sorted.zipWithIndex.map { case (x, i) =>
      BigInt(i + 1) * BigInt(x) }.sum.toDouble
    val gini = (2.0 * ix - (n + 1) * t) / (n * t)
    val got = q("q295_gini_revenue").collect().head
    assert(math.abs(got.getAs[Long]("gini_ppm") - math.round(gini * 1e6)) <= 1)
    assert(got.getAs[Long]("gini_ppm") > 0)

    val toks = Tables.documents(spark, sf)
      .select(col("source"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val bySrc = toks.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val tt = bySrc.values.sum
    val shares = bySrc.values.map(x => x * 1000000L / tt)
    val hhi = shares.map(s => s * s).sum / 1000000L
    val g2 = q("q296_source_hhi").collect().head
    assert(g2.getAs[Long]("n_sources") == bySrc.size)
    assert(g2.getAs[Long]("hhi_ppm") == hhi)
    assert(g2.getAs[Long]("top_share_ppm") == shares.max)
  }
}
