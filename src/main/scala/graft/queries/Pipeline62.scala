package graft.queries

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Round-13 pack, tenth batch — curation selection and release
  * hygiene: greedy max-coverage seed selection (the submodular pick),
  * MAD/modified-z robust outlier census, and the commutative-fold
  * corpus release manifest.
  */
object Pipeline62 {

  val entries: Seq[QEntry] = Seq(

    // Greedy max-coverage seed selection: 5 rounds of "pick the doc
    // whose distinct word 3-grams cover the most still-uncovered
    // grams" (ties → min doc_id) — the classic (1−1/e) submodular
    // approximation behind annotation-seed and eval-set picks. Grams
    // travel as 60-bit md5 prefixes (q306 discipline). Each round is
    // one anti-join + one keyed count over the CHECKPOINTED posting
    // frame; the covered set is the grams of ≤5 docs — broadcast-
    // joinable at any corpus size. Winners stay a DataFrame (no
    // driver collect); the 5-row result joins itself for the
    // cumulative coverage.
    QEntry("q350_coverage_selection",
      (s, d) => {
        // One posting shuffle total: the corpus collapses to doc-grain
        // (doc_id, distinct-gram array) rows ONCE; each greedy round is
        // then a zero-shuffle array_except projection against the
        // broadcast covered set (grams of ≤5 docs) + a TakeOrdered —
        // the posting-grain formulation paid 5 corpus shuffles and ran
        // 53 s at the 100× replica vs 6 s for this shape.
        val docGrams = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 3, distinct = true))
              .as("sh"))
          .select(col("doc_id"),
            conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
              .as("g"))
          .groupBy(col("doc_id")).agg(collect_set(col("g")).as("gs"))
          .localCheckpoint() // doc-grain, scanned once per round
        val total = docGrams
          .select(explode(col("gs")).as("g"))
          .agg(countDistinct(col("g")).as("total_grams"))
        // gain > 0 before the argmax (ADVICE r13): on a degenerate
        // corpus where <5 docs already cover every trigram, the
        // DuckDB oracle's `WHERE g NOT IN covered` yields NO row for
        // the exhausted round — an unguarded Spark argmax would still
        // emit a zero-gain min-doc_id row and diverge. With the
        // filter, an exhausted round contributes nothing on both
        // engines (the union is a no-op and later rounds stay empty).
        def argmax(cov: DataFrame, round: Int): DataFrame =
          docGrams.crossJoin(broadcast(cov))
            .select(col("doc_id"),
              size(array_except(col("gs"), col("cov"))).cast("long")
                .as("gain"))
            .filter(col("gain") > 0)
            .orderBy(col("gain").desc, col("doc_id").asc).limit(1)
            .select(lit(round.toLong).as("round"), col("doc_id"),
              col("gain"))
        val emptyCov = s.range(1)
          .select(array().cast("array<long>").as("cov"))
        var winners = argmax(emptyCov, 1).localCheckpoint()
        for (r <- 2 to 5) {
          val covered = docGrams
            .join(broadcast(winners.select(col("doc_id"))), Seq("doc_id"))
            .agg(array_distinct(flatten(collect_list(col("gs"))))
              .as("cov"))
          winners = winners.union(argmax(covered, r)).localCheckpoint()
        }
        val w = winners
        val cum = w.select(col("round"), col("doc_id"), col("gain"))
          .join(w.select(col("round").as("r2"), col("gain").as("g2")),
            col("r2") <= col("round"))
          .groupBy(col("round"), col("doc_id"), col("gain"))
          .agg(sum(col("g2")).as("cum_covered"))
        cum.crossJoin(broadcast(total))
          .select(col("round"), col("doc_id"), col("gain"),
            col("cum_covered"), col("total_grams"),
            expr("cum_covered * 1000000 div total_grams")
              .as("coverage_ppm"))
          .orderBy(col("round"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
                FROM documents),
              dg AS (
                SELECT DISTINCT doc_id, g FROM (
                  SELECT doc_id,
                    unnest(list_transform(range(1, len(w) - 1),
                      i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1]
                        || ' ' || w[i+2]), 1, 15))::BIGINT)) AS g
                  FROM t WHERE len(w) >= 3)),
              tot AS (SELECT count(DISTINCT g) AS total_grams FROM dg),
              w1 AS (SELECT 1 AS round, doc_id, count(*) AS gain
                     FROM dg GROUP BY doc_id
                     ORDER BY gain DESC, doc_id LIMIT 1),
              c1 AS (SELECT DISTINCT g FROM dg
                     WHERE doc_id IN (SELECT doc_id FROM w1)),
              w2 AS (SELECT 2 AS round, doc_id, count(*) AS gain
                     FROM dg WHERE g NOT IN (SELECT g FROM c1)
                     GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
              c2 AS (SELECT DISTINCT g FROM dg
                     WHERE doc_id IN (SELECT doc_id FROM w1
                       UNION SELECT doc_id FROM w2)),
              w3 AS (SELECT 3 AS round, doc_id, count(*) AS gain
                     FROM dg WHERE g NOT IN (SELECT g FROM c2)
                     GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
              c3 AS (SELECT DISTINCT g FROM dg
                     WHERE doc_id IN (SELECT doc_id FROM w1
                       UNION SELECT doc_id FROM w2
                       UNION SELECT doc_id FROM w3)),
              w4 AS (SELECT 4 AS round, doc_id, count(*) AS gain
                     FROM dg WHERE g NOT IN (SELECT g FROM c3)
                     GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
              c4 AS (SELECT DISTINCT g FROM dg
                     WHERE doc_id IN (SELECT doc_id FROM w1
                       UNION SELECT doc_id FROM w2
                       UNION SELECT doc_id FROM w3
                       UNION SELECT doc_id FROM w4)),
              w5 AS (SELECT 5 AS round, doc_id, count(*) AS gain
                     FROM dg WHERE g NOT IN (SELECT g FROM c4)
                     GROUP BY doc_id ORDER BY gain DESC, doc_id LIMIT 1),
              u AS (SELECT * FROM w1 UNION ALL SELECT * FROM w2
                    UNION ALL SELECT * FROM w3 UNION ALL SELECT * FROM w4
                    UNION ALL SELECT * FROM w5)
              SELECT CAST(a.round AS BIGINT) AS round, a.doc_id,
                CAST(a.gain AS BIGINT) AS gain,
                CAST(sum(b.gain) AS BIGINT) AS cum_covered,
                CAST(tot.total_grams AS BIGINT) AS total_grams,
                CAST(sum(b.gain) * 1000000 // tot.total_grams AS BIGINT)
                  AS coverage_ppm
              FROM u a JOIN u b ON b.round <= a.round, tot
              GROUP BY a.round, a.doc_id, a.gain, tot.total_grams
              ORDER BY a.round""")),

    // MAD / modified-z robust outlier census over per-(type, day)
    // arrival counts: lower median + median-absolute-deviation per
    // type from sorted in-row arrays (the day dimension is bounded —
    // the corpus never reaches this grain), modified z = 0.6745·(x −
    // med)/MAD in milli, flagged at the classic |z| > 3.5. Division
    // runs on |x − med| with the sign reapplied — a style choice, not
    // a cross-engine necessity: BOTH Spark `div` and DuckDB integer
    // `//` truncate toward zero (verified: -7 // 2 = -3 in DuckDB;
    // ADVICE r13 corrected an earlier claim that `//` floors). The
    // robust twin of q240's CUSUM.
    QEntry("q351_mad_outliers",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(col("event_type"),
            expr("ts div 86400000000000").as("day"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // (type, day) dim, feeds both median passes
        val med = daily.groupBy(col("event_type"))
          .agg(sort_array(collect_list(col("cnt"))).as("arr"))
          .select(col("event_type"),
            element_at(col("arr"),
              expr("CAST((size(arr) + 1) div 2 AS INT)")).as("med"))
        val dev = daily.join(broadcast(med), "event_type")
          .withColumn("absdev", abs(col("cnt") - col("med")))
          .localCheckpoint()
        val mad = dev.groupBy(col("event_type"))
          .agg(sort_array(collect_list(col("absdev"))).as("arr"))
          .select(col("event_type"),
            element_at(col("arr"),
              expr("CAST((size(arr) + 1) div 2 AS INT)")).as("mad"))
        dev.join(broadcast(mad), "event_type")
          .select(col("event_type"), col("day"), col("cnt"), col("med"),
            col("mad"),
            (when(col("cnt") >= col("med"), 1L).otherwise(-1L) *
              expr("(6745 * abs(cnt - med)) div " +
                "(10 * greatest(1L, mad))")).as("z_milli"))
          .withColumn("is_outlier",
            (abs(col("z_milli")) > 3500L).cast("boolean"))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""WITH daily AS (
                SELECT event_type,
                  epoch_us(ts) * 1000 // 86400000000000 AS day,
                  count(*) AS cnt
                FROM events GROUP BY 1, 2),
              med AS (
                SELECT event_type,
                  (list(cnt ORDER BY cnt))
                    [CAST((count(*) + 1) // 2 AS BIGINT)] AS med
                FROM daily GROUP BY event_type),
              dev AS (
                SELECT d.event_type, d.day, d.cnt, m.med,
                  abs(d.cnt - m.med) AS absdev
                FROM daily d JOIN med m USING (event_type)),
              mad AS (
                SELECT event_type,
                  (list(absdev ORDER BY absdev))
                    [CAST((count(*) + 1) // 2 AS BIGINT)] AS mad
                FROM dev GROUP BY event_type)
              SELECT d.event_type, d.day, d.cnt, d.med,
                CAST(m.mad AS BIGINT) AS mad,
                CAST((CASE WHEN d.cnt >= d.med THEN 1 ELSE -1 END) *
                  ((6745 * abs(d.cnt - d.med)) //
                   (10 * greatest(1, m.mad))) AS BIGINT) AS z_milli,
                abs((CASE WHEN d.cnt >= d.med THEN 1 ELSE -1 END) *
                  ((6745 * abs(d.cnt - d.med)) //
                   (10 * greatest(1, m.mad)))) > 3500 AS is_outlier
              FROM dev d JOIN mad m USING (event_type)
              ORDER BY d.event_type, d.day""")),

    // Corpus release manifest: an order-independent, mergeable
    // fingerprint per source — row digest (60-bit md5 prefix of
    // doc_id + text) → 256 prefix buckets → commutative bucket fold
    // (decimal(38,0) sum mod 2⁶¹−1: partial-agg/merge-safe and
    // ANSI-overflow-safe at any corpus size) → source root = md5 over
    // the zero-padded (bucket, fold) list. Two releases differing in
    // ONE row differ in their roots; bucket grain localizes which
    // shard to re-audit. The reproducibility stamp a dataset card
    // (q171) links to.
    QEntry("q352_corpus_manifest",
      (s, d) => {
        val m = graft.pipeline.Manifest
        m.roots(m.bucketFolds(Tables.documents(s, d)
            .select(col("source"), col("doc_id"), col("text"))))
          .orderBy(col("source"))
      },
      Some("""WITH r AS (
                SELECT source,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || text), 1, 15))::BIGINT AS h
                FROM documents),
              bk AS (
                SELECT source, h % 256 AS b, count(*) AS n,
                  CAST(sum(CAST(h AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold
                FROM r GROUP BY source, h % 256)
              SELECT source, CAST(sum(n) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_buckets,
                md5(string_agg(lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold AS VARCHAR), '|'
                  ORDER BY lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold AS VARCHAR))) AS root
              FROM bk GROUP BY source
              ORDER BY source"""))
  )
}
