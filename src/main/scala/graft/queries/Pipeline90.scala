package graft.queries

import org.apache.spark.sql.functions._

/** Round-15 pack, eleventh batch — template forensics, source
  * similarity, dup-quality interaction, opt-out compliance.
  */
object Pipeline90 {

  val entries: Seq[QEntry] = Seq(

    // Template-slot detection: a generated-content farm fills slots in
    // one fixed sentence frame — per-position token AGREEMENT exposes
    // it even when every document is byte-distinct (q425's LCP only
    // sees shared prefixes; slots defeat it). Per (source, position):
    // the modal token's share; per source: Σ modal / Σ present over
    // the first 12 positions. Natural prose agrees weakly (~a few
    // hundred bp per position); the template plant (md5 % 5 = 3,
    // fixed frame + two variable slots) agrees near-totally on frame
    // positions. Shape: one positional explode (capped at 12), a
    // (source, pos, token) census, two rollups.
    QEntry("q432_template_slots",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val farm = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long") % 5 === 3
        val corpus = docs.withColumn("text",
          when(farm, concat(lit("status report "), draw % 7,
            lit(" for region "), draw % 9,
            lit(" all systems nominal")))
            .otherwise(col("text")))
        val pos = corpus
          .select(col("source"),
            posexplode(slice(split(lower(col("text")), "\\s+"), 1, 12)))
          .filter(length(col("col")) > 0)
        val pc = pos.groupBy(col("source"), col("pos"), col("col"))
          .agg(count(lit(1)).as("c"))
        pc.groupBy(col("source"), col("pos"))
          .agg(max(col("c")).as("modal"), sum(col("c")).as("present"))
          .groupBy(col("source"))
          .agg(sum(col("modal")).as("modal_tokens"),
            sum(col("present")).as("present_tokens"))
          .withColumn("agreement_bp",
            expr("modal_tokens * 10000 div present_tokens"))
          .withColumn("verdict",
            when(col("agreement_bp") > 6000L, "template_farm")
              .otherwise(lit("organic")))
          .orderBy(col("source"))
      },
      Some("""WITH docs AS (
                SELECT source,
                  CASE WHEN ('0x' || substr(md5(source), 1, 2))::BIGINT
                    % 5 = 3
                  THEN 'status report ' ||
                    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4
                      ))::BIGINT % 7) ||
                    ' for region ' ||
                    (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4
                      ))::BIGINT % 9) ||
                    ' all systems nominal'
                  ELSE text END AS text
                FROM documents),
              pos AS (
                SELECT source, p.p AS pos,
                  string_split_regex(lower(text), '\s+')[p.p + 1] AS w
                FROM docs,
                  (SELECT unnest(generate_series(0, 11)) AS p) p
                WHERE p.p < least(12, len(string_split_regex(
                  lower(text), '\s+')))),
              pc AS (
                SELECT source, pos, w, count(*) AS c
                FROM pos WHERE length(w) > 0 GROUP BY source, pos, w),
              pp AS (
                SELECT source, pos, max(c) AS modal, sum(c) AS present
                FROM pc GROUP BY source, pos),
              g AS (
                SELECT source, sum(modal) AS modal_tokens,
                  sum(present) AS present_tokens
                FROM pp GROUP BY source)
              SELECT source, CAST(modal_tokens AS BIGINT)
                  AS modal_tokens,
                CAST(present_tokens AS BIGINT) AS present_tokens,
                CAST(modal_tokens * 10000 // present_tokens AS BIGINT)
                  AS agreement_bp,
                CASE WHEN modal_tokens * 10000 // present_tokens > 6000
                  THEN 'template_farm' ELSE 'organic' END AS verdict
              FROM g
              ORDER BY source""")),

    // Cross-source unigram cross-entropy map: which source is each
    // source's nearest linguistic neighbor — the redundancy map behind
    // "do we need both feeds". H(A,B) = −Σ p_A(w)·ln q_B(w) with
    // add-1-smoothed q_B; the decomposition ln q_B = ln(c_B+1) −
    // ln(n_B+V) makes absent words contribute ln 1 = 0, so ONE inner
    // type-grain join carries the whole matrix (no dense V×20
    // materialization). Integer micro-nats, per-term rounding (the
    // q92/q127 convention). The fixture draws every source from ONE
    // vocabulary (cross-entropies would tie up to noise), so each
    // source carries a ~5% dialect-marker token mass — the linguistic
    // fingerprint real feeds have — and the q386 mirror topology is
    // the plant: a mirror inherits its original's markers, so
    // mirror_X's nearest neighbor must be X itself.
    QEntry("q433_source_xentropy_map",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            concat(col("text"), lit(" dlc"), col("source"),
              lit(" dlc"), col("source"), lit(" dlc"), col("source"))
              .as("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 5 === 0)
            .select(col("doc_id") + 10000000L,
              concat(lit("mirror_"), col("source")), col("text")))
        val wc = corpus
          .select(col("source"),
            explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // both sides of the matrix join
        val n = wc.groupBy(col("source")).agg(sum(col("c")).as("n"))
        val v = wc.select(col("w")).distinct().count()
        val pairs = wc.select(col("source").as("a"), col("w"),
          col("c").as("ca"))
          .join(wc.select(col("source").as("b"), col("w"),
            (col("c") + 1L).as("cb1")), "w")
          .withColumn("term",
            expr("ca * CAST(round(ln(CAST(cb1 AS DOUBLE)) * 1000000.0)" +
              " AS BIGINT)"))
          .groupBy(col("a"), col("b"))
          .agg(sum(col("term")).as("shared_micro"))
        val ce = pairs
          .join(broadcast(n.select(col("source").as("a"),
            col("n").as("na"))), "a")
          .join(broadcast(n.select(col("source").as("b"),
            col("n").as("nb"))), "b")
          .withColumn("ce_micro",
            expr(s"(na * CAST(round(ln(CAST(nb + $v AS DOUBLE)) * " +
              "1000000.0) AS BIGINT) - shared_micro) div na"))
        val self = ce.filter(col("a") === col("b"))
          .select(col("a").as("source"),
            col("ce_micro").as("ce_self_micro"))
        val nearest = ce.filter(col("a") =!= col("b"))
          .groupBy(col("a"))
          .agg(min(struct(col("ce_micro"), col("b"))).as("m"))
          .select(col("a").as("source"),
            col("m").getField("b").as("nearest_source"),
            col("m").getField("ce_micro").as("ce_nearest_micro"))
        self.join(nearest, "source")
          .withColumn("gap_micro",
            col("ce_nearest_micro") - col("ce_self_micro"))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source,
                  text || ' dlc' || source || ' dlc' || source ||
                    ' dlc' || source AS text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              corpus AS (
                SELECT source, text FROM base
                UNION ALL
                SELECT 'mirror_' || source, text FROM base
                WHERE draw % 5 = 0),
              wc AS (
                SELECT source, w, count(*) AS c FROM (
                  SELECT source,
                    unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM corpus)
                WHERE length(w) > 0 GROUP BY source, w),
              n AS (SELECT source, sum(c) AS n FROM wc GROUP BY source),
              v AS (SELECT count(DISTINCT w) AS v FROM wc),
              pairs AS (
                SELECT a.source AS a, b.source AS b,
                  sum(a.c * CAST(round(ln(CAST(b.c + 1 AS DOUBLE)) *
                    1000000.0) AS BIGINT)) AS shared_micro
                FROM wc a JOIN wc b USING (w)
                GROUP BY a.source, b.source),
              ce AS (
                SELECT p.a, p.b,
                  (na.n * CAST(round(ln(CAST(nb.n + v.v AS DOUBLE)) *
                    1000000.0) AS BIGINT) - p.shared_micro) // na.n
                    AS ce_micro
                FROM pairs p
                JOIN n na ON na.source = p.a
                JOIN n nb ON nb.source = p.b
                CROSS JOIN v),
              slf AS (
                SELECT a AS source, ce_micro AS ce_self_micro
                FROM ce WHERE a = b),
              nst AS (
                SELECT a AS source, b AS nearest_source,
                  ce_micro AS ce_nearest_micro
                FROM ce WHERE a != b
                QUALIFY row_number() OVER (PARTITION BY a
                  ORDER BY ce_micro, b) = 1)
              SELECT s.source,
                CAST(s.ce_self_micro AS BIGINT) AS ce_self_micro,
                t.nearest_source,
                CAST(t.ce_nearest_micro AS BIGINT) AS ce_nearest_micro,
                CAST(t.ce_nearest_micro - s.ce_self_micro AS BIGINT)
                  AS gap_micro
              FROM slf s JOIN nst t USING (source)
              ORDER BY s.source""")),

    // Dup-quality interaction: the standard crawl observation — what
    // gets copied around is disproportionately junk — made auditable:
    // exact-dup cluster size vs the rep's quality score (the q385
    // stopword scorer, milli-scaled mean per size bucket). The plant
    // re-publishes exactly the ZERO-STOPWORD docs twice (a content-
    // conditional draw, not an id draw — duplication must CORRELATE
    // with quality for the census to have signal), so k=3 clusters
    // must read a mean score of 0 while singletons carry the corpus
    // average. One digest-grain collapse (min-id rep, its score
    // rides the same aggregate), one size-bucket rollup.
    QEntry("q434_dup_quality_interaction",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("n_tok",
            size(split(lower(col("text")), "\\s+")).cast("long"))
          .withColumn("score_bp",
            expr("CAST(size(filter(split(lower(text), '\\\\s+'), " +
              "w -> w IN ('the','a','of','and','to','in','is','on'," +
              "'for','with'))) AS BIGINT) * 10000 div " +
              "greatest(1L, n_tok)"))
        val junk = docs.filter(col("score_bp") === 0L)
        val corpus = docs
          .union(junk.withColumn("doc_id", col("doc_id") + 10000000L))
          .union(junk.withColumn("doc_id", col("doc_id") + 20000000L))
        corpus
          .groupBy(md5(col("text")).as("h"))
          .agg(count(lit(1)).as("k"), min(col("score_bp")).as("rep_score"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("n_clusters"),
            expr("sum(rep_score) * 1000 div count(1)")
              .as("mean_rep_score_milli"))
          .orderBy(col("k"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, text,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(text), '\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) * 10000
                    // greatest(1, CAST(len(string_split_regex(
                      lower(text), '\s+')) AS BIGINT)) AS score_bp
                FROM documents),
              corpus AS (
                SELECT doc_id, text, score_bp FROM docs
                UNION ALL
                SELECT doc_id + 10000000, text, score_bp FROM docs
                WHERE score_bp = 0
                UNION ALL
                SELECT doc_id + 20000000, text, score_bp FROM docs
                WHERE score_bp = 0),
              cl AS (
                SELECT md5(text) AS h, count(*) AS k,
                  min(score_bp) AS rep_score
                FROM corpus GROUP BY md5(text)),
              g AS (
                SELECT k, count(*) AS n_clusters,
                  sum(rep_score) * 1000 // count(*)
                    AS mean_rep_score_milli
                FROM cl GROUP BY k)
              SELECT CAST(k AS BIGINT) AS k,
                CAST(n_clusters AS BIGINT) AS n_clusters,
                CAST(mean_rep_score_milli AS BIGINT)
                  AS mean_rep_score_milli
              FROM g
              ORDER BY k""")),

    // Opt-out compliance scan: a source that opted out of training
    // must be absent from the release AT CONTENT GRAIN — dropping its
    // rows is not enough when mirrors re-published the same text under
    // other names (the quiet leak every takedown process misses). The
    // release = all docs of non-opted-out sources (mirrors included);
    // a violation = a release doc whose text digest exists in an
    // opted-out source's corpus. One digest census on the opted-out
    // side, one hash semi-join-style probe (left join + flag) on the
    // release, one source census with the leak attributed.
    QEntry("q435_optout_compliance",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        def optedOut(src: org.apache.spark.sql.Column) =
          conv(substring(md5(src), 1, 2), 16, 10).cast("long") % 11 === 8
        val corpus = base
          .union(base.filter(draw % 5 === 0)
            .select(col("doc_id") + 10000000L,
              concat(lit("mirror_"), col("source")), col("text")))
          .withColumn("h", md5(col("text")))
          .withColumn("opted_out",
            optedOut(when(col("source").startsWith("mirror_"),
              col("source")).otherwise(col("source"))) &&
              !col("source").startsWith("mirror_"))
        val ooDim = corpus.filter(col("opted_out"))
          .select(col("h")).distinct()
          .withColumn("oo", lit(1L))
        val release = corpus.filter(!col("opted_out"))
        release.join(ooDim, Seq("h"), "left")
          .withColumn("violation",
            coalesce(col("oo"), lit(0L)))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("violation")).as("violating_docs"))
          .withColumn("violation_bp",
            expr("violating_docs * 10000 div n_docs"))
          .withColumn("verdict",
            when(col("violating_docs") > 0L, "non_compliant")
              .otherwise(lit("compliant")))
          .orderBy(col("source"))
      },
      Some("""WITH base AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              corpus AS (
                SELECT source, md5(text) AS h,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT % 11 = 8
                    AS opted_out
                FROM base
                UNION ALL
                SELECT 'mirror_' || source, md5(text), FALSE
                FROM base WHERE draw % 5 = 0),
              oo AS (
                SELECT DISTINCT h FROM corpus WHERE opted_out),
              rel AS (
                SELECT source, h FROM corpus WHERE NOT opted_out),
              f AS (
                SELECT r.source,
                  CASE WHEN oo.h IS NOT NULL THEN 1 ELSE 0 END
                    AS violation
                FROM rel r LEFT JOIN oo ON oo.h = r.h),
              g AS (
                SELECT source, count(*) AS n_docs,
                  sum(violation) AS violating_docs
                FROM f GROUP BY source)
              SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(violating_docs AS BIGINT) AS violating_docs,
                CAST(violating_docs * 10000 // n_docs AS BIGINT)
                  AS violation_bp,
                CASE WHEN violating_docs > 0 THEN 'non_compliant'
                  ELSE 'compliant' END AS verdict
              FROM g
              ORDER BY source"""))
  )
}
