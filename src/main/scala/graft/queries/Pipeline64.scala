package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 pack, twelfth batch — release auditing and two more
  * distribution-shift members: the manifest-diff drill-down (q352's use
  * story), exact 1-D Wasserstein drift, and per-source KL divergence.
  */
object Pipeline64 {

  /** q352's digest→bucket frame, filterable to a release snapshot. */
  private def bucketFolds(s: SparkSession, d: String, cond: String)
      : DataFrame =
    graft.pipeline.Manifest.bucketFolds(
      Tables.documents(s, d).filter(expr(cond))
        .select(col("source"), col("doc_id"), col("text")))

  val entries: Seq[QEntry] = Seq(

    // Release diff: two corpus snapshots (A = doc_id % 10 ≠ 0, the
    // "previous release"; B = everything) compared MANIFEST-first —
    // the q352 contract paying off: equal bucket folds prove equal
    // bucket contents (commutative fold), so only the changed buckets
    // (≤ 256/source, here exactly the ones the 10% delta hashes into)
    // would need a row-level re-audit. Per source: rows in each
    // release, changed-bucket count, and both roots.
    QEntry("q356_release_diff",
      (s, d) => {
        val a = bucketFolds(s, d, "doc_id % 10 != 0")
          .select(col("source"), col("b"), col("n").as("n_a"),
            col("fold").as("fold_a"))
        val b = bucketFolds(s, d, "true")
          .select(col("source"), col("b"), col("n").as("n_b"),
            col("fold").as("fold_b"))
        val j = b.join(a, Seq("source", "b"), "left")
          .select(col("source"), col("b"), col("n_b"), col("fold_b"),
            coalesce(col("n_a"), lit(0L)).as("n_a"),
            coalesce(col("fold_a"), lit(-1L)).as("fold_a"))
          .localCheckpoint() // ≤ 256 rows/source
        def root(foldCol: String): org.apache.spark.sql.Column =
          md5(concat_ws("|", sort_array(collect_list(concat(
            lpad(col("b").cast("string"), 3, "0"), lit(":"),
            col(foldCol).cast("string"))))))
        j.groupBy(col("source"))
          .agg(sum(col("n_a")).as("rows_a"), sum(col("n_b")).as("rows_b"),
            sum(when(col("fold_a") =!= col("fold_b"), 1L).otherwise(0L))
              .as("buckets_changed"),
            count(lit(1)).as("buckets_total"),
            root("fold_a").as("root_a"), root("fold_b").as("root_b"))
          .orderBy(col("source"))
      },
      Some("""WITH r AS (
                SELECT source, doc_id,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || text), 1, 15))::BIGINT AS h
                FROM documents),
              a AS (
                SELECT source, h % 256 AS b, count(*) AS n_a,
                  CAST(sum(CAST(h AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold_a
                FROM r WHERE doc_id % 10 != 0 GROUP BY source, h % 256),
              bb AS (
                SELECT source, h % 256 AS b, count(*) AS n_b,
                  CAST(sum(CAST(h AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold_b
                FROM r GROUP BY source, h % 256),
              j AS (
                SELECT bb.source, bb.b, bb.n_b, bb.fold_b,
                  coalesce(a.n_a, 0) AS n_a,
                  coalesce(a.fold_a, -1) AS fold_a
                FROM bb LEFT JOIN a
                  ON a.source = bb.source AND a.b = bb.b)
              SELECT source, CAST(sum(n_a) AS BIGINT) AS rows_a,
                CAST(sum(n_b) AS BIGINT) AS rows_b,
                CAST(sum(CASE WHEN fold_a <> fold_b THEN 1 ELSE 0 END)
                  AS BIGINT) AS buckets_changed,
                CAST(count(*) AS BIGINT) AS buckets_total,
                md5(string_agg(lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold_a AS VARCHAR), '|'
                  ORDER BY lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold_a AS VARCHAR))) AS root_a,
                md5(string_agg(lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold_b AS VARCHAR), '|'
                  ORDER BY lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold_b AS VARCHAR))) AS root_b
              FROM j GROUP BY source
              ORDER BY source""")),

    // Exact 1-D Wasserstein (earth-mover) distance between the
    // token-length distributions of two corpus slices (even vs odd
    // doc_id) — the EMD member of the shift family (PSI q184 bins, KS
    // q250 max-gap, chi² q292, MMD q346): W1 = Σ_v |CDF_A − CDF_B|
    // over the integer length grid, sensitive to WHERE mass moved,
    // not just that it moved. Lengths cap at 512 so the value
    // dimension stays bounded; CDFs in exact ppm via one window over
    // the ≤513-cell dim. Per-grid-value gaps double as the drift
    // attribution; the total rides on every row.
    QEntry("q357_wasserstein_len",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select((col("doc_id") % 2).as("slice"),
            least(graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long"), lit(512L)).as("v"))
        val cells = base.groupBy(col("v"))
          .agg(sum(when(col("slice") === 0, 1L).otherwise(0L)).as("n_a"),
            sum(when(col("slice") === 1, 1L).otherwise(0L)).as("n_b"))
          .localCheckpoint() // ≤ 513 rows
        val tot = cells.agg(sum(col("n_a")).as("ta"),
          sum(col("n_b")).as("tb"))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("v"))
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        val cdf = cells.crossJoin(broadcast(tot))
          .withColumn("cum_a", sum(col("n_a")).over(w))
          .withColumn("cum_b", sum(col("n_b")).over(w))
          .select(col("v"), col("n_a"), col("n_b"),
            expr("cum_a * 1000000 div greatest(1L, ta)").as("cdf_a_ppm"),
            expr("cum_b * 1000000 div greatest(1L, tb)").as("cdf_b_ppm"))
          .withColumn("gap_ppm",
            abs(col("cdf_a_ppm") - col("cdf_b_ppm")))
          .localCheckpoint()
        val total = cdf.agg(sum(col("gap_ppm")).as("w1_ppm"))
        cdf.crossJoin(broadcast(total))
          .select(col("v"), col("n_a"), col("n_b"), col("cdf_a_ppm"),
            col("cdf_b_ppm"), col("gap_ppm"), col("w1_ppm"))
          .orderBy(col("v"))
      },
      Some("""WITH base AS (
                SELECT doc_id % 2 AS slice,
                  least(CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT), 512) AS v
                FROM documents),
              cells AS (
                SELECT v,
                  sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END) AS n_a,
                  sum(CASE WHEN slice = 1 THEN 1 ELSE 0 END) AS n_b
                FROM base GROUP BY v),
              tot AS (SELECT sum(n_a) AS ta, sum(n_b) AS tb FROM cells),
              cdf AS (
                SELECT v, n_a, n_b,
                  sum(n_a) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    * 1000000 // greatest(1, t.ta) AS cdf_a_ppm,
                  sum(n_b) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                    * 1000000 // greatest(1, t.tb) AS cdf_b_ppm
                FROM cells, tot t),
              g AS (
                SELECT v, n_a, n_b, cdf_a_ppm, cdf_b_ppm,
                  abs(cdf_a_ppm - cdf_b_ppm) AS gap_ppm
                FROM cdf),
              w1 AS (SELECT sum(gap_ppm) AS w1_ppm FROM g)
              SELECT v, CAST(n_a AS BIGINT) AS n_a,
                CAST(n_b AS BIGINT) AS n_b,
                CAST(cdf_a_ppm AS BIGINT) AS cdf_a_ppm,
                CAST(cdf_b_ppm AS BIGINT) AS cdf_b_ppm,
                CAST(gap_ppm AS BIGINT) AS gap_ppm,
                CAST(w1.w1_ppm AS BIGINT) AS w1_ppm
              FROM g, w1
              ORDER BY v""")),

    // Per-source lexical KL divergence KL(P_source ‖ P_corpus) over
    // the word distribution — "how far does each source's language sit
    // from the mixture" (the source-distinctiveness readout behind
    // q317's temperature knob and q349's raking): per-(source, word)
    // ln((c_sw·N)/(N_s·c_w)) rounded to integer micro-nats BEFORE the
    // weighted sum (q92's order-independent discipline), then
    // kl_micro = Σ c_sw·lnr div N_s. One tokenize pass to (source,
    // word) counts; the corpus marginal is a second agg on the word
    // dimension. KL ≥ 0 up to micro-rounding by Gibbs' inequality.
    QEntry("q358_source_kl",
      (s, d) => {
        val sw = Tables.documents(s, d)
          .select(col("source"),
            explode(split(lower(col("text")), "\\s+")).as("w"))
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c_sw"))
          .localCheckpoint() // (source, word) dim, feeds both marginals
        val cw = sw.groupBy(col("w")).agg(sum(col("c_sw")).as("c_w"))
        val ns = sw.groupBy(col("source"))
          .agg(sum(col("c_sw")).as("n_s"),
            countDistinct(col("w")).as("n_words"))
        val nTot = sw.agg(sum(col("c_sw")).as("n"))
        sw.join(cw, Seq("w"))
          .join(broadcast(ns), Seq("source"))
          .crossJoin(broadcast(nTot))
          .select(col("source"), col("n_s"), col("n_words"),
            col("c_sw"),
            expr("CAST(round(ln((CAST(c_sw AS DOUBLE) * n) / " +
              "(CAST(n_s AS DOUBLE) * c_w)) * 1000000.0) AS BIGINT)")
              .as("lnr"))
          .groupBy(col("source"))
          .agg(min(col("n_s")).as("n_tokens"),
            min(col("n_words")).as("n_distinct_words"),
            expr("sum(c_sw * lnr) div min(n_s)").as("kl_micro"))
          .orderBy(col("source"))
      },
      Some("""WITH sw AS (
                SELECT source, w, count(*) AS c_sw FROM (
                  SELECT source,
                    unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
                GROUP BY source, w),
              cw AS (SELECT w, sum(c_sw) AS c_w FROM sw GROUP BY w),
              ns AS (
                SELECT source, sum(c_sw) AS n_s,
                  count(DISTINCT w) AS n_words
                FROM sw GROUP BY source),
              nt AS (SELECT sum(c_sw) AS n FROM sw),
              terms AS (
                SELECT sw.source, ns.n_s, ns.n_words, sw.c_sw,
                  CAST(round(ln((CAST(sw.c_sw AS DOUBLE) * nt.n) /
                    (CAST(ns.n_s AS DOUBLE) * cw.c_w)) * 1000000.0)
                    AS BIGINT) AS lnr
                FROM sw JOIN cw USING (w) JOIN ns USING (source), nt)
              SELECT source, CAST(min(n_s) AS BIGINT) AS n_tokens,
                CAST(min(n_words) AS BIGINT) AS n_distinct_words,
                CAST(sum(c_sw * lnr) // min(n_s) AS BIGINT) AS kl_micro
              FROM terms GROUP BY source
              ORDER BY source"""))
  )
}
