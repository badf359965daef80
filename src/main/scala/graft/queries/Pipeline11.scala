package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 continuation pack: eval-set construction and model-eval
  * reporting over the curation surface. Conventions unchanged.
  */
object Pipeline11 {

  private val stopList =
    graft.pipeline.TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  val entries: Seq[QEntry] = Seq(

    // Deterministic per-stratum eval split with EXACT quotas: take
    // min(quota, |stratum|) docs per source in md5(doc_id) order — the
    // "balanced 10k-doc eval set" builder. Complements q87 (rate-based
    // stratified sampling): quotas guarantee per-stratum counts, rates
    // don't. Rank-within-stratum via the groupPercentileRank two-pass
    // (GlobalRank + broadcast offsets — no per-source window funnel);
    // the md5 order makes the pick reproducible on any cluster size
    // and stable across reruns.
    QEntry("q168_eval_split_quota",
      (s, d) => {
        val quota = 25
        graft.pipeline.Curation.groupPercentileRank(
            Tables.documents(s, d)
              .select(col("doc_id"), col("source"),
                md5(col("doc_id").cast("string")).as("ok")),
            "source", "ok", "doc_id")
          .select(col("grp").as("source"), col("id").as("doc_id"),
            col("rank_in_grp"),
            (col("rank_in_grp") <= quota).as("in_eval"))
          .orderBy(col("source"), col("rank_in_grp"))
      },
      Some("""WITH r AS (
                SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                    AS rank_in_grp
                FROM documents)
              SELECT source, doc_id, rank_in_grp,
                rank_in_grp <= 25 AS in_eval
              FROM r ORDER BY source, rank_in_grp""")),

    // Language-ID confusion matrix + per-label accuracy: the q33
    // n-gram classifier evaluated against the fixture labels — every
    // (labeled, predicted) cell with counts and per-label accuracy in
    // basis points. The eval view a langid owner reads before trusting
    // the filter; one corpus projection + one dimension-sized agg.
    QEntry("q169_langid_confusion",
      (s, d) => {
        val ls = graft.pipeline.TextAnalysis.langScores(col("text"))
        Tables.documents(s, d)
          .select(col("lang").as("labeled"), ls.getField("pred").as("pred"))
          .groupBy(col("labeled"), col("pred"))
          .agg(count(lit(1)).as("n"))
          .withColumn("n_labeled",
            sum(col("n")).over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("labeled"))))
          .select(col("labeled"), col("pred"), col("n"),
            floor(col("n") * 10000.0 / col("n_labeled")).cast("long")
              .as("cell_bp"))
          .orderBy(col("labeled"), col("pred"))
      },
      Some {
        def occ(m: String) =
          s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INTEGER)"
        val en = s"${occ(" the ")} + ${occ(" and ")} + ${occ(" with ")}"
        val es = s"${occ(" el ")} + ${occ(" los ")} + ${occ(" con ")}"
        val de = s"${occ(" der ")} + ${occ(" und ")} + ${occ(" mit ")}"
        val fr = s"${occ(" le ")} + ${occ(" les ")} + ${occ(" avec ")}"
        s"""WITH padded AS (
              SELECT doc_id, lang, concat(' ', lower(text), ' ') AS p
              FROM documents),
            pr AS (
              SELECT lang AS labeled,
                CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
                     WHEN $es >= $de AND $es >= $fr THEN 'es'
                     WHEN $de >= $fr THEN 'de'
                     ELSE 'fr' END AS pred
              FROM padded),
            cm AS (
              SELECT labeled, pred, count(*) AS n
              FROM pr GROUP BY 1, 2),
            tot AS (
              SELECT labeled, sum(n) AS n_labeled FROM cm GROUP BY 1)
            SELECT cm.labeled, cm.pred, cm.n,
              CAST(floor(cm.n * 10000.0 / tot.n_labeled) AS BIGINT)
                AS cell_bp
            FROM cm JOIN tot USING (labeled)
            ORDER BY labeled, pred"""
      }),

    // Tokenizer fertility per language: subwords-per-word under the
    // trained BPE (q137's 4-merge tokenizer applied via q141's shared
    // segmentation) weighted by each language's actual word usage —
    // the tokenizer-equity metric (a language with higher fertility
    // pays proportionally more sequence length per word). Per-(lang,
    // word) counts join the corpus-distinct segmented vocabulary on
    // the word key; the oracle replays the ENTIRE train+apply chain
    // and the weighted rollup.
    QEntry("q170_bpe_fertility",
      (s, d) => {
        val seg = graft.pipeline.TextAnalysis.bpeSegment(
            Tables.documents(s, d), "text", nMerges = 4)
          .select(col("wd"), col("n_syms"))
        val lwc = Tables.documents(s, d)
          .select(col("lang"), explode(split(lower(col("text")), "\\s+")).as("wd"))
          .groupBy(col("lang"), col("wd")).agg(count(lit(1)).as("c"))
        lwc.join(seg, "wd")
          .groupBy(col("lang"))
          .agg(sum(col("c")).as("n_tokens"),
            sum(col("c") * col("n_syms")).as("n_subwords"))
          .select(col("lang"), col("n_tokens"), col("n_subwords"),
            expr("(n_subwords * 10000) div n_tokens").as("fertility_bp"))
          .orderBy(col("lang"))
      },
      Some(Pipeline9.bpeChainSql(4,
        """SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(sum(c * n_syms) AS BIGINT) AS n_subwords,
             CAST((sum(c * n_syms) * 10000) // sum(c) AS BIGINT)
               AS fertility_bp
           FROM (
             SELECT lang, wd, count(*) AS c FROM (
               SELECT lang,
                 unnest(string_split_regex(lower(text), '\s+')) AS wd
               FROM documents)
             GROUP BY 1, 2) lwc
           JOIN (
             SELECT wd, CAST(count(*) AS BIGINT) AS n_syms
             FROM s4 GROUP BY wd) ws USING (wd)
           GROUP BY lang ORDER BY lang"""))),

    // Dataset card: the one-row corpus summary a release ships with —
    // doc/token/char totals, language and source cardinalities, exact-
    // duplicate mass (docs minus distinct texts), and the quality-gate
    // pass share (q89 rules) in basis points. One corpus scan with
    // in-row token counts feeding a single global aggregate; the
    // distinct-text count is the q30 digest agg folded in via
    // count_distinct on the md5.
    QEntry("q171_dataset_card",
      (s, d) => {
        val q = graft.pipeline.Curation.qualityFlags(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"),
            col("n_chars"),
            size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok"),
            md5(col("text")).as("digest"),
            q.getField("keep").as("keep"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("n_tokens"),
            sum(col("n_chars")).as("n_chars"),
            count_distinct(col("lang")).as("n_langs"),
            count_distinct(col("source")).as("n_sources"),
            (count(lit(1)) - count_distinct(col("digest"))).as("n_exact_dups"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_quality_pass"))
          .select(col("n_docs"), col("n_tokens"), col("n_chars"),
            col("n_langs"), col("n_sources"), col("n_exact_dups"),
            col("n_quality_pass"),
            expr("(n_quality_pass * 10000) div n_docs").as("quality_pass_bp"))
      },
      Some(s"""WITH t AS (
                SELECT doc_id, lang, source, n_chars, md5(text) AS digest,
                  CAST(len(string_split_regex(lower(text), '\\s+')) AS BIGINT)
                    AS n_tok,
                  string_split_regex(lower(text), '\\s+') AS toks
                FROM documents),
              f AS (
                SELECT *,
                  CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS sum_tok_len,
                  CAST(len(list_filter(toks, x -> x IN ($stopList)))
                    AS BIGINT) AS n_stop,
                  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                FROM t),
              k AS (
                SELECT *,
                  (n_tok >= 10 AND n_tok <= 90
                   AND sum_tok_len >= n_tok * 3 AND sum_tok_len <= n_tok * 10
                   AND n_stop * 100 >= n_tok
                   AND n_distinct * 10 >= n_tok * 4) AS keep
                FROM f)
              SELECT
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                CAST(sum(n_chars) AS BIGINT) AS n_chars,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
                CAST(count(*) - count(DISTINCT digest) AS BIGINT)
                  AS n_exact_dups,
                CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_quality_pass,
                CAST((sum(CASE WHEN keep THEN 1 ELSE 0 END) * 10000)
                  // count(*) AS BIGINT) AS quality_pass_bp
              FROM k"""))
  )
}