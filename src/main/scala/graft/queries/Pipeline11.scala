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
              FROM k""")),

    // Dedup-collapsed mutual k-NN graph — the q152 collapse applied to
    // the q159 graph: distinct quantized vectors collapse to min-id
    // representatives FIRST (bucket occupancy = distinct vectors; the
    // sf~1 replica measured plain q159 at 32× for 10× data because
    // byte-identical duplicates square inside buckets), the mutual
    // graph builds over reps only, and every member inherits its rep's
    // degree with the dup-group membership reported alongside (the
    // q152 edge-set contract: member×member pairs never expand).
    QEntry("q172_knn_graph_deduped",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(col("vec_id"),
            graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
              .as("qe"))
          .withColumn("k", md5(concat_ws(",", col("qe").cast("array<string>"))))
        val reps = q.groupBy(col("k"))
          .agg(min(struct(col("vec_id"), col("qe"))).as("r"))
          .select(col("k"), col("r.vec_id").as("vec_id"), col("r.qe").as("qe"))
          .localCheckpoint() // feeds member join + both ANN sides
        val knn = graft.pipeline.Similarity.cosineTopKBucketedQ(
            reps.select(col("vec_id").as("q_id"), col("qe")),
            reps.select(col("vec_id"), col("qe")), nBits = 4, k = 4,
            knownQueryCount = Some(Long.MaxValue))
          .filter(col("q_id") =!= col("vec_id"))
          .select(col("q_id").as("a"), col("vec_id").as("b"))
          .localCheckpoint() // both sides of the mutual join
        val mutual = knn
          .join(knn.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"))
          .filter(col("a") < col("b"))
        val deg = mutual
          .select(explode(array(col("a"), col("b"))).as("rep_id"))
          .groupBy(col("rep_id")).agg(count(lit(1)).as("mutual_degree"))
        q.select(col("k"), col("vec_id"))
          .join(reps.select(col("k"), col("vec_id").as("rep_id")), "k")
          .join(deg, Seq("rep_id"), "left")
          .select(col("vec_id"), col("rep_id"),
            coalesce(col("mutual_degree"), lit(0L)).as("mutual_degree"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH qz AS (
                SELECT vec_id, list_transform(embedding,
                  v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              qk AS (
                SELECT vec_id, qe,
                  md5(list_aggregate(list_transform(qe,
                    x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS k
                FROM qz),
              reps AS (
                SELECT k, min(vec_id) AS rep_id FROM qk GROUP BY k),
              rv AS (
                SELECT reps.k, reps.rep_id AS vec_id, qk.qe
                FROM reps JOIN qk
                  ON qk.k = reps.k AND qk.vec_id = reps.rep_id),
              bk AS (SELECT vec_id, qe, ${Pipeline2.duckBucketBits(4)} AS bucket
                     FROM rv),
              cand AS (
                SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                    i -> q.qe[i+1] * c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM bk q JOIN bk c ON q.bucket = c.bucket),
              ranked AS (
                SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM cand),
              knn AS (
                SELECT q_id AS a, vec_id AS b FROM ranked
                WHERE rn <= 4 AND q_id <> vec_id),
              mutual AS (
                SELECT k1.a, k1.b FROM knn k1
                JOIN knn k2 ON k1.a = k2.b AND k1.b = k2.a
                WHERE k1.a < k1.b),
              ends AS (
                SELECT a AS rep_id FROM mutual
                UNION ALL SELECT b FROM mutual),
              deg AS (
                SELECT rep_id, CAST(count(*) AS BIGINT) AS mutual_degree
                FROM ends GROUP BY rep_id)
              SELECT qk.vec_id, reps.rep_id,
                coalesce(deg.mutual_degree, 0) AS mutual_degree
              FROM qk JOIN reps ON reps.k = qk.k
              LEFT JOIN deg ON deg.rep_id = reps.rep_id
              ORDER BY qk.vec_id""")),

    // Crawl-policy enforcement — the composition a frontier applies
    // before a page enters the corpus: canonical domain (q160's
    // normalization chain) → domain blocklist anti-join (a tiny
    // broadcast dim: the opt-out/robots list) → per-domain cap
    // (keep the first `cap` docs per domain in doc_id order — q58's
    // keep-first-k, domain-keyed window). Output = survivors with
    // their domain and in-domain rank, plus the drop reason for the
    // capped (blocked docs vanish via the anti-join, exactly like a
    // robots opt-out).
    QEntry("q173_crawl_policy",
      (s, d) => {
        import s.implicits._
        val cap = 60
        val canon = regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(lower(col("url_raw")), "^[a-z]+://", ""),
          "[?#].*$", ""), "^www\\.", ""), "/$", "")
        val raw = concat(
          when(col("doc_id") % 2 === 0, "https://").otherwise("HTTP://"),
          when(col("doc_id") % 3 === 0, "www.").otherwise(""),
          col("source"), lit(".Example.COM"),
          lit("/p/"), (col("doc_id") % 50).cast("string"))
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), raw.as("url_raw"))
          .select(col("doc_id"),
            regexp_replace(canon, "/.*$", "").as("domain"))
        val blocklist = Seq("src1.example.com").toDF("domain")
        docs.join(broadcast(blocklist), Seq("domain"), "left_anti")
          .withColumn("rank_in_domain",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("domain")).orderBy(col("doc_id"))))
          .filter(col("rank_in_domain") <= cap)
          .orderBy(col("domain"), col("rank_in_domain"))
      },
      Some("""WITH r AS (
                SELECT doc_id,
                  (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'HTTP://' END)
                  || (CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END)
                  || source || '.Example.COM'
                  || '/p/' || CAST(doc_id % 50 AS VARCHAR) AS url_raw
                FROM documents),
              c AS (
                SELECT doc_id,
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(lower(url_raw), '^[a-z]+://', ''),
                          '[?#].*$', ''),
                        '^www\.', ''),
                      '/$', ''),
                    '/.*$', '') AS domain
                FROM r),
              keep AS (
                SELECT doc_id, domain,
                  row_number() OVER (PARTITION BY domain ORDER BY doc_id)
                    AS rank_in_domain
                FROM c WHERE domain <> 'src1.example.com')
              SELECT domain, doc_id, rank_in_domain
              FROM keep WHERE rank_in_domain <= 60
              ORDER BY domain, rank_in_domain""")),

    // URL-keyed keep-latest upsert across crawl snapshots: two derived
    // crawls of the same canonical URL space (crawl 0 = the %3 != 2
    // slice, crawl 1 = the %2 == 0 slice re-fetched later), collapsed
    // to one row per URL by LATEST (crawl, doc_id) — the CDC-merge
    // semantic a crawl store applies on ingest (q131's snapshot diff
    // tells you WHAT changed; this materializes the merged table). One
    // hash agg on the URL key via max_by over the (crawl, doc_id)
    // struct — no window, no join.
    QEntry("q174_url_upsert",
      (s, d) => {
        val url = concat(col("source"), lit(".example.com/p/"),
          (col("doc_id") % 97).cast("string"))
        val docs = Tables.documents(s, d)
        val c0 = docs.filter(col("doc_id") % 3 =!= 2)
          .select(url.as("url"), lit(0).as("crawl"), col("doc_id"),
            col("n_chars"))
        val c1 = docs.filter(col("doc_id") % 2 === 0)
          .select(url.as("url"), lit(1).as("crawl"), col("doc_id"),
            col("n_chars"))
        c0.union(c1)
          .groupBy(col("url"))
          .agg(count(lit(1)).as("n_versions"),
            max_by(struct(col("crawl"), col("doc_id"), col("n_chars")),
              col("crawl") * lit(10000000000L) + col("doc_id")).as("w"))
          .select(col("url"), col("n_versions"),
            col("w.crawl").as("crawl"), col("w.doc_id").as("doc_id"),
            col("w.n_chars").as("n_chars"))
          .orderBy(col("url"))
      },
      Some("""WITH u AS (
                SELECT source || '.example.com/p/' ||
                  CAST(doc_id % 97 AS VARCHAR) AS url,
                  0 AS crawl, doc_id, n_chars
                FROM documents WHERE doc_id % 3 <> 2
                UNION ALL
                SELECT source || '.example.com/p/' ||
                  CAST(doc_id % 97 AS VARCHAR) AS url,
                  1 AS crawl, doc_id, n_chars
                FROM documents WHERE doc_id % 2 = 0)
              SELECT url,
                CAST(count(*) AS BIGINT) AS n_versions,
                CAST(max_by(crawl, crawl * 10000000000 + doc_id) AS INT)
                  AS crawl,
                max_by(doc_id, crawl * 10000000000 + doc_id) AS doc_id,
                max_by(n_chars, crawl * 10000000000 + doc_id) AS n_chars
              FROM u GROUP BY url ORDER BY url""")),

    // Vocabulary pruning with <unk> remap: tokens below the corpus
    // frequency cutoff (count >= 5, the q99 vocab discipline) are
    // replaced in-place — the closed-vocab preprocessing step. The
    // rewrite is ZERO-SHUFFLE on the corpus side: the kept vocab
    // collapses to ONE row holding its sorted xxhash64 set (millions
    // of terms = a few MB of longs), broadcasts, and each token is a
    // binary search inside the row (the q84 count_in_sorted trick) —
    // the rare-term long tail never materializes as a join dim. The
    // oracle replays membership on the raw STRINGS, so the gate also
    // proves the hash compression semantically invisible.
    QEntry("q175_vocab_prune",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
        val vocabRow = docs
          .select(explode(col("tk")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("c"))
          .filter(col("c") >= 5)
          .agg(sort_array(collect_set(xxhash64(col("term")))).as("vh"))
        val inVocab = (t: org.apache.spark.sql.Column) =>
          graft.expressions.functions.count_in_sorted(
            array(xxhash64(t)), col("vh")) > 0
        docs.crossJoin(broadcast(vocabRow))
          .select(col("doc_id"),
            size(col("tk")).cast("long").as("n_tok"),
            size(filter(col("tk"), t => !inVocab(t))).cast("long").as("n_unk"),
            array_join(transform(col("tk"),
              t => when(inVocab(t), t).otherwise(lit("<unk>"))), " ")
              .as("pruned_text"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk
                FROM documents),
              uc AS (
                SELECT term, count(*) AS c
                FROM (SELECT unnest(tk) AS term FROM t) GROUP BY 1),
              c AS (
                SELECT doc_id, tk,
                  (SELECT list(term) FROM uc WHERE c >= 5) AS vl
                FROM t)
              SELECT doc_id,
                CAST(len(tk) AS BIGINT) AS n_tok,
                CAST(len(list_filter(tk, x -> NOT list_contains(vl, x)))
                  AS BIGINT) AS n_unk,
                list_aggregate(list_transform(tk,
                  x -> CASE WHEN list_contains(vl, x) THEN x
                       ELSE '<unk>' END), 'string_agg', ' ') AS pruned_text
              FROM c ORDER BY doc_id""")),

    // Heaps-law vocabulary growth: distinct-vocabulary size after the
    // first N docs, at doubling prefix cuts — the curve that predicts
    // vocab (and embedding-table) size at 100 TB from small prefixes.
    // One insight makes it one pass: vocab_at(N) = #terms whose FIRST
    // document id < N — so a single per-term min(doc_id) aggregate
    // feeds every cut as a conditional sum; no per-prefix rescans.
    QEntry("q176_heaps_curve",
      (s, d) => {
        val cuts = Seq(62L, 125L, 250L, 500L)
        val firstDoc = Tables.documents(s, d)
          .select(explode(array_distinct(split(lower(col("text")), "\\s+")))
            .as("term"), col("doc_id"))
          .groupBy(col("term")).agg(min(col("doc_id")).as("first_doc"))
        firstDoc.agg(
          count(lit(1)).as("n_terms_total"),
          cuts.map(t => sum(when(col("first_doc") < t, 1L).otherwise(0L))
            .as(s"vocab_at_$t")): _*)
      },
      Some("""WITH fd AS (
                SELECT term, min(doc_id) AS first_doc FROM (
                  SELECT doc_id,
                    unnest(list_distinct(
                      string_split_regex(lower(text), '\s+'))) AS term
                  FROM documents)
                GROUP BY term)
              SELECT
                CAST(count(*) AS BIGINT) AS n_terms_total,
                CAST(sum(CASE WHEN first_doc < 62 THEN 1 ELSE 0 END)
                  AS BIGINT) AS vocab_at_62,
                CAST(sum(CASE WHEN first_doc < 125 THEN 1 ELSE 0 END)
                  AS BIGINT) AS vocab_at_125,
                CAST(sum(CASE WHEN first_doc < 250 THEN 1 ELSE 0 END)
                  AS BIGINT) AS vocab_at_250,
                CAST(sum(CASE WHEN first_doc < 500 THEN 1 ELSE 0 END)
                  AS BIGINT) AS vocab_at_500
              FROM fd""")),

    // Packing-efficiency report: the q88 packer audited — per (source,
    // bin): token fill vs budget; rolled up per source to bin count,
    // min/avg/max fill in bp (start-offset binning lets a boundary-
    // spanning doc overflow its bin — the report SHOWS that instead of
    // hiding it) and the total padding a trainer would burn. The
    // "how much compute is padding" view every packing choice owes.
    QEntry("q177_pack_efficiency",
      (s, d) => {
        val budget = 256
        val packed = graft.pipeline.Curation.packSequences(
          Tables.documents(s, d)
            .select(col("doc_id"), col("source"),
              size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok")),
          "doc_id", "source", "n_tok", budget)
        packed.groupBy(col("source"), col("bin_id"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("bin_tok"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_bins"),
            sum(col("bin_tok")).as("tokens"),
            min(expr(s"(bin_tok * 10000) div $budget")).as("min_fill_bp"),
            expr(s"(sum(bin_tok) * 10000) div (count(1) * $budget)")
              .as("avg_fill_bp"),
            max(expr(s"(bin_tok * 10000) div $budget")).as("max_fill_bp"),
            sum(greatest(lit(0L), lit(budget.toLong) - col("bin_tok")))
              .as("padding_tokens"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
                SELECT doc_id, source,
                  CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
                    AS n_tok
                FROM documents),
              p AS (
                SELECT source, n_tok,
                  CAST(floor((sum(n_tok) OVER (PARTITION BY source
                      ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    - n_tok) / 256.0) AS BIGINT) AS bin_id
                FROM t),
              b AS (
                SELECT source, bin_id, count(*) AS n_docs,
                  sum(n_tok) AS bin_tok
                FROM p GROUP BY 1, 2)
              SELECT source,
                CAST(count(*) AS BIGINT) AS n_bins,
                CAST(sum(bin_tok) AS BIGINT) AS tokens,
                CAST(min((bin_tok * 10000) // 256) AS BIGINT) AS min_fill_bp,
                CAST((sum(bin_tok) * 10000) // (count(*) * 256) AS BIGINT)
                  AS avg_fill_bp,
                CAST(max((bin_tok * 10000) // 256) AS BIGINT) AS max_fill_bp,
                CAST(sum(greatest(0, 256 - bin_tok)) AS BIGINT)
                  AS padding_tokens
              FROM b GROUP BY source ORDER BY source""")),

    // Integer-exact PageRank, 3 iterations, over a derived link graph
    // (three deterministic link rules per page — quadratic residues
    // give varied in-degrees; self-links dropped, so out-degrees vary
    // too). Per-edge floored contributions make every round
    // order-independent and SQL-replayable (operators/PageRank
    // scaladoc); the oracle chains the three rounds as CTEs.
    QEntry("q178_pagerank",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
          .localCheckpoint() // nodes: counted for N + joined every round
        val n = docs.count()
        // reduce doc_id mod n BEFORE squaring: (d·d) mod n ==
        // ((d mod n)·(d mod n)) mod n, so the oracle's d*d form is
        // value-identical while this side survives replica-scale ids
        // (1e10² overflows int64 under ANSI — hit at the sf≈10 run)
        val m = pmod(col("doc_id"), lit(n))
        val edges = docs.select(col("doc_id").as("src"),
            ((m * 7 + 1) % n).as("dst"))
          .union(docs.select(col("doc_id"), (m * m) % n))
          .union(docs.select(col("doc_id"), expr("doc_id div 2")))
        graft.operators.PageRank.run(
            edges, docs.select(col("doc_id").as("id")), iters = 3)
          .select(col("id").as("doc_id"), col("pr").as("pr_micro"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH nn AS (SELECT count(*) AS n FROM documents),
              e0 AS (
                SELECT doc_id AS src,
                  (doc_id * 7 + 1) % (SELECT n FROM nn) AS dst
                FROM documents
                UNION
                SELECT doc_id,
                  (doc_id * doc_id) % (SELECT n FROM nn)
                FROM documents
                UNION
                SELECT doc_id, doc_id // 2 FROM documents),
              e AS (SELECT src, dst FROM e0 WHERE src <> dst),
              od AS (SELECT src, count(*) AS od FROM e GROUP BY src),
              p0 AS (
                SELECT doc_id AS id,
                  1000000000000 // (SELECT n FROM nn) AS pr
                FROM documents),
              c1 AS (
                SELECT e.dst, sum((p0.pr * 85) // (100 * od.od)) AS cs
                FROM e JOIN od USING (src) JOIN p0 ON p0.id = e.src
                GROUP BY e.dst),
              p1 AS (
                SELECT d.doc_id AS id,
                  (1000000000000 * 15) // (100 * (SELECT n FROM nn))
                    + coalesce(c1.cs, 0) AS pr
                FROM documents d LEFT JOIN c1 ON c1.dst = d.doc_id),
              c2 AS (
                SELECT e.dst, sum((p1.pr * 85) // (100 * od.od)) AS cs
                FROM e JOIN od USING (src) JOIN p1 ON p1.id = e.src
                GROUP BY e.dst),
              p2 AS (
                SELECT d.doc_id AS id,
                  (1000000000000 * 15) // (100 * (SELECT n FROM nn))
                    + coalesce(c2.cs, 0) AS pr
                FROM documents d LEFT JOIN c2 ON c2.dst = d.doc_id),
              c3 AS (
                SELECT e.dst, sum((p2.pr * 85) // (100 * od.od)) AS cs
                FROM e JOIN od USING (src) JOIN p2 ON p2.id = e.src
                GROUP BY e.dst),
              p3 AS (
                SELECT d.doc_id AS id,
                  (1000000000000 * 15) // (100 * (SELECT n FROM nn))
                    + coalesce(c3.cs, 0) AS pr
                FROM documents d LEFT JOIN c3 ON c3.dst = d.doc_id)
              SELECT id AS doc_id, CAST(pr AS BIGINT) AS pr_micro
              FROM p3 ORDER BY doc_id""")),

    // Contrastive-batch construction with an in-batch-negative
    // constraint: batches where no two examples share a source, so
    // in-batch negatives are never same-source near-positives (the
    // CLIP-style batch hygiene rule). Construction IS the constraint:
    // batch b = the b-th doc of every source in md5 order — rank-in-
    // source via the groupPercentileRank two-pass, position-in-batch
    // via a batch-keyed window over the (≤ #sources)-row batches.
    // Deterministic on any cluster size.
    QEntry("q179_contrastive_batches",
      (s, d) => {
        val ranked = graft.pipeline.Curation.groupPercentileRank(
            Tables.documents(s, d)
              .select(col("doc_id"), col("source"),
                md5(concat(lit("cb:"), col("doc_id").cast("string"))).as("ok")),
            "source", "ok", "doc_id")
          .select(col("grp").as("source"), col("id").as("doc_id"),
            col("rank_in_grp").as("batch_id"))
        ranked.withColumn("pos_in_batch",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("batch_id")).orderBy(col("source"))))
          .orderBy(col("batch_id"), col("pos_in_batch"))
      },
      Some("""WITH r AS (
                SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5('cb:' || doc_id), doc_id) AS batch_id
                FROM documents)
              SELECT source, doc_id, batch_id,
                row_number() OVER (PARTITION BY batch_id ORDER BY source)
                  AS pos_in_batch
              FROM r ORDER BY batch_id, pos_in_batch""")),

    // Per-user EWMA of event values (alpha = 0.2 as the exact integer
    // recurrence e_t = (2·x_t + 8·e_{t-1}) div 10, seeded with the
    // first observation) — the smoothed-activity signal ops dashboards
    // track per entity. The fold is SEQUENTIAL by nature, so it runs
    // INSIDE the row over the per-user ordered array (bounded by
    // per-user event counts — the q42 sessionize bound), one user-
    // keyed agg total; cents are positive so div == floor-div
    // cross-engine. Oracle replays via list_reduce over the same
    // ordered list.
    QEntry("q180_user_ewma",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
        ev.groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sort_array(collect_list(struct(col("ts"), col("event_id"),
              col("cents")))).as("xs"))
          .select(col("user_id"), col("n_events"),
            transform(col("xs"), x => x.getField("cents")).as("cs"))
          .select(col("user_id"), col("n_events"),
            element_at(col("cs"), -1).as("last_cents"),
            aggregate(
              slice(col("cs"), lit(2), greatest(size(col("cs")) - 1, lit(0))),
              element_at(col("cs"), 1),
              (acc, x) => floor((x * 2 + acc * 8) / lit(10)).cast("long"))
              .as("ewma_cents"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (
                SELECT user_id, epoch_us(ts) AS us, event_id,
                  CAST(round(value * 100) AS BIGINT) AS cents
                FROM events),
              l AS (
                SELECT user_id, count(*) AS n_events,
                  list(cents ORDER BY us, event_id) AS cs
                FROM e GROUP BY user_id)
              SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
                cs[len(cs)] AS last_cents,
                CAST(list_reduce(cs, (acc, x) -> (2*x + 8*acc) // 10)
                  AS BIGINT) AS ewma_cents
              FROM l ORDER BY user_id""")),

    // KMV (k-minimum-values) distinct sketch, k = 64, over per-source
    // 3-gram shingle sets — the MERGEABLE distinct-count sketch
    // (union sketches = merge min-sets), here with a DETERMINISTIC
    // md5-derived hash so, unlike HLL (q65's accuracy contract), the
    // whole sketch AND its estimate replay bit-for-bit in the oracle:
    // est = (k−1)·2³² div h_k when the set has >= k values, else the
    // exact count. Per source: estimate vs exact distinct with the
    // signed error in bp. Scale shape: distinct (source, h) → source-
    // keyed rank window → the k-row-per-source sketch; the full
    // distinct set never collects anywhere.
    QEntry("q181_kmv_sketch",
      (s, d) => {
        val k = 64
        val sh = Tables.documents(s, d)
          .select(col("source"), explode(
            graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 3, distinct = true)).as("g"))
          .distinct()
          .select(col("source"),
            expr("CAST(conv(substring(md5(g), 1, 8), 16, 10) AS BIGINT)")
              .as("h"))
          .distinct() // 32-bit prefix collisions: one h per (source, h)
          .localCheckpoint() // feeds the sketch ranks AND the exact counts
        val kth = sh.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("source")).orderBy(col("h"))))
          .filter(col("rn") <= k)
          .groupBy(col("source"))
          .agg(max(col("h")).as("hk"), count(lit(1)).as("nk"))
        val exact = sh.groupBy(col("source"))
          .agg(count(lit(1)).as("n_exact"))
        kth.join(exact, "source")
          .select(col("source"), col("n_exact"),
            when(col("nk") < k, col("nk"))
              .otherwise(expr(s"(${k - 1} * 4294967296) div hk"))
              .as("n_est"))
          .select(col("source"), col("n_exact"), col("n_est"),
            // err can be NEGATIVE: floor of the double quotient, not an
            // integer div (Spark div truncates toward zero, DuckDB //
            // floors — they disagree below zero)
            floor((col("n_est") - col("n_exact")).cast("double") * 10000
              / col("n_exact")).cast("long").as("err_bp"))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
                SELECT source, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              g AS (
                SELECT DISTINCT source,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS g
                FROM t WHERE len(toks) >= 3),
              h AS (
                SELECT DISTINCT source,
                  ('0x' || substr(md5(g), 1, 8))::BIGINT AS h
                FROM g),
              r AS (
                SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h) AS rn
                FROM h),
              kth AS (
                SELECT source, max(h) AS hk, count(*) AS nk
                FROM r WHERE rn <= 64 GROUP BY source),
              ex AS (
                SELECT source, CAST(count(*) AS BIGINT) AS n_exact
                FROM h GROUP BY source),
              est AS (
                SELECT kth.source, ex.n_exact,
                  CASE WHEN kth.nk < 64 THEN kth.nk
                       ELSE (63 * 4294967296) // kth.hk END AS n_est
                FROM kth JOIN ex USING (source))
              SELECT source, n_exact, CAST(n_est AS BIGINT) AS n_est,
                CAST(floor((n_est - n_exact) * 10000.0 / n_exact) AS BIGINT)
                  AS err_bp
              FROM est ORDER BY source""")),

    // Hard-negative mining: per query vector, the highest-cosine
    // OTHER-label neighbor (the hard negative a contrastive trainer
    // wants) and the highest-cosine same-label neighbor (the positive)
    // — one corpus scan against the broadcast query slice, two
    // label-conditioned q_id-keyed rank windows. Integer dots; the
    // cosine ordering is the IEEE-deterministic q36 convention, so the
    // oracle replays both rankings exactly.
    QEntry("q182_hard_negatives",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
              .as("qe"))
          .withColumn("n2",
            graft.expressions.functions.dot_long(col("qe"), col("qe")))
        val queries = emb.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("qe").as("qq"), col("n2").as("nq"))
        val scored = emb.crossJoin(broadcast(queries))
          .withColumn("dot",
            graft.expressions.functions.dot_long(col("qq"), col("qe")))
          .withColumn("cos",
            col("dot") / (sqrt(col("nq")) * sqrt(col("n2"))))
        val neg = scored.filter(col("label") =!= col("q_label"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("q_id"), col("q_label"),
            col("vec_id").as("neg_id"), col("label").as("neg_label"),
            col("dot").as("neg_dot"))
        val pos = scored.filter(col("label") === col("q_label") &&
            col("vec_id") =!= col("q_id"))
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("q_id"), col("vec_id").as("pos_id"),
            col("dot").as("pos_dot"))
        neg.join(pos, "q_id").orderBy(col("q_id"))
      },
      Some("""WITH qz AS (
                SELECT vec_id, label, list_transform(embedding,
                  v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              n2 AS (
                SELECT vec_id, label, qe,
                  CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS n2
                FROM qz),
              q AS (
                SELECT vec_id AS q_id, label AS q_label, qe AS qq, n2 AS nq
                FROM n2 WHERE vec_id % 50 = 0),
              sc AS (
                SELECT q.q_id, q.q_label, c.vec_id, c.label,
                  CAST(list_sum(list_transform(range(len(q.qq)),
                    i -> q.qq[i+1] * c.qe[i+1])) AS BIGINT) AS dot,
                  q.nq, c.n2
                FROM q, n2 c),
              neg AS (
                SELECT q_id, q_label, vec_id AS neg_id, label AS neg_label,
                  dot AS neg_dot,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(nq) * sqrt(n2)) DESC, vec_id) AS rn
                FROM sc WHERE label <> q_label),
              pos AS (
                SELECT q_id, vec_id AS pos_id, dot AS pos_dot,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(nq) * sqrt(n2)) DESC, vec_id) AS rn
                FROM sc WHERE label = q_label AND vec_id <> q_id)
              SELECT n.q_id, n.q_label, n.neg_id, n.neg_label, n.neg_dot,
                p.pos_id, p.pos_dot
              FROM neg n JOIN pos p ON p.q_id = n.q_id AND p.rn = 1
              WHERE n.rn = 1 ORDER BY n.q_id""")),

    // Z-order (Morton) values over (user bucket, hour bucket) — the
    // multi-column data-skipping layout key (sources/ZOrder scaladoc;
    // ZOrderSpec proves the file-level min/max pruning property on
    // real parquet). This row pins the interleave math cross-engine
    // and the z-curve ordering rank the writer sorts by.
    QEntry("q183_zorder_values",
      (s, d) => {
        val a = pmod(col("user_id"), lit(64L))
        val b = pmod(expr("(ts div 1000) div 3600000000"), lit(64L))
        Tables.events(s, d)
          .select(col("event_id"), a.as("a"), b.as("b"))
          .select(col("event_id"), col("a"), col("b"),
            graft.sources.ZOrder.zValue(col("a"), col("b"), 6).as("zv"))
          .orderBy(col("event_id"))
      },
      Some {
        val terms = (0 until 6).map { i =>
          s"(((a >> $i) & 1) << ${2 * i}) | (((b >> $i) & 1) << ${2 * i + 1})"
        }.mkString(" | ")
        s"""WITH t AS (
              SELECT event_id,
                user_id % 64 AS a,
                (epoch_us(ts) // 3600000000) % 64 AS b
              FROM events)
            SELECT event_id, a, b,
              CAST($terms AS BIGINT) AS zv
            FROM t ORDER BY event_id"""
      })
  )
}