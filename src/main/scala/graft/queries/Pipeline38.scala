package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.functions._

/** Round-12 pack, second batch: the storage-layout and sampling /
  * concentration operators a 100 TB corpus owner leans on — bucketed
  * co-located joins (pay the partitioned write once, join shuffle-free
  * forever after), deterministic stratified sampling without per-key
  * single-task sorts, and source-concentration monitoring (Gini, HHI).
  */
object Pipeline38 {

  /** Bucketed tables already written this JVM, keyed by sf dir — the
    * gate pays the one-time layout cost once per dataset, then every
    * re-run (and every other query against the layout) joins with ZERO
    * exchange, which is the point being demonstrated. */
  private val bucketed = new ConcurrentHashMap[String, String]()

  /** Writes orders+lineitem co-bucketed by order key for `d` (8 buckets,
    * sorted) and returns the table-name suffix. Idempotent per JVM. */
  private[queries] def ensureBucketed(
      s: org.apache.spark.sql.SparkSession, d: String): String =
    bucketed.computeIfAbsent(d, { dir =>
      val suf = java.security.MessageDigest.getInstance("MD5")
        .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      // a previous JVM may have left the managed-table LOCATION behind
      // without this session's in-memory catalog knowing the table —
      // saveAsTable then refuses the orphaned dir; drop both halves
      for (t <- Seq(s"graft_bkt_orders_$suf", s"graft_bkt_lineitem_$suf")) {
        s.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new org.apache.hadoop.fs.Path(
          s.conf.get("spark.sql.warehouse.dir") + s"/$t")
        val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(loc)) fs.delete(loc, true)
      }
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable(s"graft_bkt_orders_$suf")
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          expr("CAST(round(l_extendedprice * (1 - l_discount) * 100) " +
            "AS BIGINT)").as("rev_cents"))
        .write.mode("overwrite").format("parquet")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"graft_bkt_lineitem_$suf")
      suf
    })

  def entries: Seq[QEntry] = Seq(

    // Co-located join via bucketed storage: both fact tables are
    // written `bucketBy(8, orderkey).sortBy(orderkey)` ONCE per
    // dataset (the amortized layout investment every serious warehouse
    // makes), after which the orders⋈lineitem join needs NO exchange
    // and NO sort — the SortMergeJoin reads co-bucketed, pre-sorted
    // files directly (Pipeline38Spec pins zero Exchange nodes in the
    // physical plan). At 100 TB this converts the dominant nightly
    // shuffle into a metadata decision; the oracle only checks the
    // ANSWER equals a plain join, which is the other half of the
    // contract (layout must never change results).
    QEntry("q293_bucketed_join",
      (s, d) => {
        val suf = ensureBucketed(s, d)
        s.table(s"graft_bkt_orders_$suf")
          .join(s.table(s"graft_bkt_lineitem_$suf"),
            col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_items"),
            sum(col("rev_cents")).as("rev_cents"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
                CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT)) AS BIGINT) AS rev_cents
              FROM orders JOIN lineitem ON o_orderkey = l_orderkey
              GROUP BY 1 ORDER BY 1""")),

    // Deterministic stratified sample: 3 docs per language, chosen by
    // md5(doc_id ∥ salt) order — reproducible in ANY engine (md5 hex
    // compares bytewise identically), re-runnable (same salt → same
    // sample), and scale-safe: the per-language rank is the
    // groupPercentileRank two-pass (GlobalRank + broadcast offsets),
    // NOT a per-key window, so a language owning half the corpus never
    // funnels through one task. The eval-set carve-out every corpus
    // release needs.
    QEntry("q294_stratified_sample",
      (s, d) => {
        val hashed = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            md5(concat(col("doc_id").cast("string"), lit("s12"))).as("h"))
        graft.pipeline.Curation
          .groupPercentileRank(hashed, "lang", "h", "doc_id")
          .filter(col("rank_in_grp") <= 3)
          .select(col("grp").as("lang"), col("id").as("doc_id"),
            col("score").as("h"), col("rank_in_grp"))
          .orderBy(col("lang"), col("rank_in_grp"))
      },
      Some("""WITH r AS (
                SELECT lang, doc_id,
                  md5(CAST(doc_id AS VARCHAR) || 's12') AS h,
                  row_number() OVER (PARTITION BY lang
                    ORDER BY md5(CAST(doc_id AS VARCHAR) || 's12'), doc_id)
                    AS rank_in_grp
                FROM documents)
              SELECT lang, doc_id, h, rank_in_grp
              FROM r WHERE rank_in_grp <= 3
              ORDER BY lang, rank_in_grp""")),

    // Gini coefficient of per-customer revenue — "how concentrated is
    // spend" (equally: how concentrated a corpus is across domains).
    // The sorted-rank identity G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)
    // with i from the two-pass GlobalRank (ties broken by customer id
    // — deterministic, no corpus sort through one task). The moment
    // sums n/t/ix are exact int64 (doc'd bound: Σ i·xᵢ ≤ n²·max_cents
    // keeps exactness to ~1e6 customers at fixture revenue scales);
    // the final ratio takes the suite's one rounded double (the
    // numerator already reaches ~n·t, so an integer ·1e6 would
    // overflow where the double ratio is still exact to ppm).
    QEntry("q295_gini_revenue",
      (s, d) => {
        val per = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"))
          .agg(sum(expr("CAST(round(l_extendedprice * (1 - l_discount) " +
            "* 100) AS BIGINT)")).as("x"))
        val ranked = graft.operators.GlobalRank.rowNumber(
          per, "i", col("x"), col("o_custkey"))
        ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
            sum(col("i") * col("x")).as("ix"))
          .select(col("n"), col("t"),
            expr("CAST(round((2.0 * ix - (CAST(n AS DOUBLE) + 1) * t) / " +
              "(CAST(n AS DOUBLE) * t) * 1e6) AS BIGINT)").as("gini_ppm"))
      },
      Some("""WITH per AS (
                SELECT o_custkey,
                  sum(CAST(round(l_extendedprice * (1 - l_discount) * 100)
                    AS BIGINT)) AS x
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                GROUP BY 1),
              r AS (
                SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i
                FROM per)
              SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS t,
                CAST(round((2.0 * sum(i * x) -
                  (CAST(count(*) AS DOUBLE) + 1) * sum(x)) /
                  (CAST(count(*) AS DOUBLE) * sum(x)) * 1e6) AS BIGINT)
                  AS gini_ppm
              FROM r""")),

    // Herfindahl–Hirschman concentration of corpus tokens across
    // sources — the one-number "is this corpus a monoculture" alarm
    // that pairs with q295's Gini and the q118/q204 mixture planners.
    // Integer shares in ppm (x·1e6 div T per source), HHI = Σ share²
    // div 1e6 — both divs exact and replayed; the source dimension is
    // tiny, the only corpus pass is the token-count agg.
    QEntry("q296_source_hhi",
      (s, d) => {
        val per = Tables.documents(s, d)
          .select(col("source"),
            size(split(lower(col("text")), "\\s+")).cast("long").as("tok"))
          .groupBy(col("source")).agg(sum(col("tok")).as("x"))
          .localCheckpoint() // feeds total + share terms
        val tot = per.agg(sum(col("x")).as("t"))
        per.crossJoin(broadcast(tot))
          .select(expr("x * 1000000 div t").as("share_ppm"))
          .agg(count(lit(1)).as("n_sources"),
            max(col("share_ppm")).as("top_share_ppm"),
            expr("sum(share_ppm * share_ppm) div 1000000").as("hhi_ppm"))
      },
      Some("""WITH per AS (
                SELECT source,
                  sum(CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT)) AS x
                FROM documents GROUP BY 1),
              tot AS (SELECT sum(x) AS t FROM per),
              sh AS (
                SELECT x * 1000000 // t AS share_ppm FROM per, tot)
              SELECT count(*) AS n_sources,
                CAST(max(share_ppm) AS BIGINT) AS top_share_ppm,
                CAST(sum(share_ppm * share_ppm) // 1000000 AS BIGINT)
                  AS hhi_ppm
              FROM sh"""))
  )
}
