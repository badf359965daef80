package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3 pack: generation-eval metrics (ROUGE/BLEU in the
  * suite's integer-bp discipline), RAG chunk preparation, intra-document
  * cleanup, KMV set algebra, and two more graph analytics (HITS, k-core).
  * Conventions unchanged: md5-derived determinism, integer ratios via
  * `div`/floor, total output orders, corpus-sized shuffles only on keyed
  * aggregates.
  */
object Pipeline13 {

  /** The rare-shingle link graph shared by q198/q199 (q178's derivation):
    * doc—doc edges via shared shingles with document frequency in [2, 4].
    * `symmetric = false` orients low→high (a DAG, for HITS); `true` keeps
    * both directions (for degree-based peeling). */
  private[graft] def linkEdges(s: org.apache.spark.sql.SparkSession,
      d: String, symmetric: Boolean): org.apache.spark.sql.DataFrame = {
    val sh = Tables.documents(s, d)
      .select(col("doc_id"), explode(
        graft.expressions.functions.ngram_shingles(
          split(lower(col("text")), "\\s+"), 3, distinct = true)).as("g"))
      .distinct()
    val rare = sh.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, 4)).select(col("g"))
    val keyed = sh.join(rare, "g")
    keyed.join(keyed.select(col("g"), col("doc_id").as("dst")), "g")
      .filter(if (symmetric) col("doc_id") =!= col("dst")
              else col("doc_id") < col("dst"))
      .select(col("doc_id").as("src"), col("dst")).distinct()
      .localCheckpoint() // every caller re-scans the edge frame
  }

  /** k-core peel over the fixture link graph — the generic operator
    * ([[graft.operators.GraphOps.kcorePeel]]) on [[linkEdges]] (q199
    * runs 4 rounds; the spec runs 5 and asserts the extra peel removes
    * nobody; ScaleBench drives the same operator on a 10M-edge synthetic
    * graph). */
  private[graft] def kcore(s: org.apache.spark.sql.SparkSession,
      d: String, rounds: Int, kk: Int = 2): org.apache.spark.sql.DataFrame =
    graft.operators.GraphOps
      .kcorePeel(linkEdges(s, d, symmetric = true), kk, rounds)
      .select(col("id").as("doc_id"), col("core_deg"))
      .orderBy(col("doc_id"))

  /** Positional n-gram array (multiset — duplicates kept, unlike the
    * dedup family's distinct shingles: ROUGE/BLEU clip on COUNTS). */
  private[graft] def grams(c: String, n: Int) =
    expr(s"transform(sequence(1, size($c) - ${n - 1}), " +
      s"i -> array_join(slice($c, i, $n), ' '))")

  /** The deterministic lossy "candidate": the doc with every 3rd token
    * dropped — a generation stand-in the oracle derives identically. */
  private[graft] val candidate =
    expr("filter(transform(toks, (t, i) -> struct(t AS t, i AS i)), " +
      "s -> (s.i + 1) % 3 != 0).t")

  val entries: Seq[QEntry] = Seq(

    // ROUGE-style n-gram overlap eval between a deterministic
    // "candidate" (the doc with every 3rd token dropped — a lossy
    // generation stand-in) and its reference (the full doc). Clipped
    // multiset matching: each n-gram counts min(cand_count, ref_count)
    // times — the ROUGE/BLEU clipping rule, NOT distinct-set overlap.
    // F1 = 2m/(c+r) in basis points (P = m/c and R = m/r share the
    // match count, so F1 reduces to one integer div — no double
    // round-trip). Scale shape: one corpus scan, one explode, one
    // (doc, n, gram)-keyed count agg, two doc-keyed re-aggs; every
    // shuffle is keyed, nothing is pairwise.
    QEntry("q193_rouge_eval",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 4)
          .withColumn("cand", candidate)
        // Round 18 (guide §2.3 + §4): the clipped match count is a pure
        // per-row function of (cand, toks) — the old shape exploded every
        // uni/bigram of the corpus into a (doc, n, gram)-keyed count
        // aggregate and re-aggregated twice (two corpus-sized token-
        // stream shuffles) to compute it. One fused kernel call per
        // (doc, n) now; c/r are just the positional gram counts
        // (size - n + 1; every doc here has >= 4 tokens so both exist,
        // matching the old coalesce paths). Bit-identical per doc
        // (VecSimSpec differential) and the q193 oracle re-verified.
        val mi = graft.expressions.functions.clipped_ngram_overlap _
        toks.select(col("doc_id"),
            mi(col("cand"), col("toks"), 1).as("m1"),
            size(col("cand")).cast("long").as("c1"),
            size(col("toks")).cast("long").as("r1"),
            mi(col("cand"), col("toks"), 2).as("m2"),
            (size(col("cand")) - 1).cast("long").as("c2"),
            (size(col("toks")) - 1).cast("long").as("r2"))
          .select(col("doc_id"), col("m1"), col("c1"), col("r1"),
            expr("(2 * m1 * 10000) div (c1 + r1)").as("f1_bp"),
            col("m2"), col("c2"), col("r2"),
            expr("(2 * m2 * 10000) div (c2 + r2)").as("f2_bp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents
                WHERE len(string_split_regex(lower(text), '\s+')) >= 4),
              c AS (
                SELECT doc_id, toks,
                  [toks[i] FOR i IN range(1, len(toks) + 1) IF i % 3 != 0]
                    AS cand
                FROM t),
              e AS (
                SELECT doc_id, 1 AS n, 'c' AS side, unnest(cand) AS g FROM c
                UNION ALL
                SELECT doc_id, 1, 'r', unnest(toks) FROM c
                UNION ALL
                SELECT doc_id, 2, 'c',
                  unnest(list_transform(range(1, len(cand)),
                    i -> cand[i] || ' ' || cand[i+1]))
                FROM c
                UNION ALL
                SELECT doc_id, 2, 'r',
                  unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1]))
                FROM c),
              cnt AS (
                SELECT doc_id, n, g,
                  sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc,
                  sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS rc
                FROM e GROUP BY 1, 2, 3),
              agg AS (
                SELECT doc_id, n, sum(least(cc, rc)) AS m,
                  sum(cc) AS c, sum(rc) AS r
                FROM cnt GROUP BY 1, 2),
              wide AS (
                SELECT doc_id,
                  max(CASE WHEN n = 1 THEN m END) AS m1,
                  max(CASE WHEN n = 1 THEN c END) AS c1,
                  max(CASE WHEN n = 1 THEN r END) AS r1,
                  max(CASE WHEN n = 2 THEN m END) AS m2,
                  max(CASE WHEN n = 2 THEN c END) AS c2,
                  max(CASE WHEN n = 2 THEN r END) AS r2
                FROM agg GROUP BY doc_id)
              SELECT doc_id, CAST(m1 AS BIGINT) AS m1,
                CAST(c1 AS BIGINT) AS c1, CAST(r1 AS BIGINT) AS r1,
                CAST((2 * m1 * 10000) // (c1 + r1) AS BIGINT) AS f1_bp,
                CAST(coalesce(m2, 0) AS BIGINT) AS m2,
                CAST(coalesce(c2, 0) AS BIGINT) AS c2,
                CAST(coalesce(r2, 0) AS BIGINT) AS r2,
                CAST(coalesce((2 * m2 * 10000) // (c2 + r2), 0) AS BIGINT)
                  AS f2_bp
              FROM wide ORDER BY doc_id""")),

    // Corpus-level BLEU components per language: modified (clipped)
    // unigram and bigram precision aggregated over the whole corpus —
    // Σ_docs m_n / Σ_docs c_n, the micro-average BLEU actually uses,
    // NOT a mean of per-doc ratios — plus the brevity ratio
    // Σ|cand| / Σ|ref| in bp. The exp() brevity penalty is left to the
    // caller: every reported component is integer-exact, so the oracle
    // replays bit-for-bit and the engine stays in integer discipline.
    // Scale shape: q193's keyed aggregates coarsened one level; the
    // per-lang final frame is dimension-sized. Clipping is still per
    // doc (the BLEU definition) BEFORE the corpus sum.
    QEntry("q194_bleu_corpus",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("lang"), col("doc_id"),
            split(lower(col("text")), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 4)
          .withColumn("cand", candidate)
        // Round 18 (guide §2.3 + §4, the q193 rewrite coarsened to lang
        // grain): per-doc clipped counts via ONE fused kernel call per
        // (doc, n) — the corpus-sized double gram explode and the
        // (lang, doc, n, gram)-keyed count shuffle are gone; the only
        // shuffle left is the dimension-sized map-side-combined
        // groupBy(lang). Clipping stays per doc BEFORE the corpus sum
        // (the BLEU definition), exactly as before.
        val mi = graft.expressions.functions.clipped_ngram_overlap _
        toks.select(col("lang"),
            mi(col("cand"), col("toks"), 1).as("m1d"),
            size(col("cand")).cast("long").as("c1d"),
            mi(col("cand"), col("toks"), 2).as("m2d"),
            (size(col("cand")) - 1).cast("long").as("c2d"),
            size(col("toks")).cast("long").as("refd"))
          .groupBy(col("lang"))
          .agg(sum(col("m1d")).as("m1"), sum(col("c1d")).as("c1"),
            sum(col("m2d")).as("m2"), sum(col("c2d")).as("c2"),
            sum(col("c1d")).as("cand_len"), sum(col("refd")).as("ref_len"))
          .select(col("lang"),
            expr("(m1 * 10000) div c1").as("p1_bp"),
            expr("(m2 * 10000) div c2").as("p2_bp"),
            col("cand_len"), col("ref_len"),
            expr("(cand_len * 10000) div ref_len").as("brevity_bp"))
          .orderBy(col("lang"))
      },
      Some("""WITH t AS (
                SELECT lang, doc_id,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM documents
                WHERE len(string_split_regex(lower(text), '\s+')) >= 4),
              c AS (
                SELECT lang, doc_id, toks,
                  [toks[i] FOR i IN range(1, len(toks) + 1) IF i % 3 != 0]
                    AS cand
                FROM t),
              e AS (
                SELECT lang, doc_id, 1 AS n, 'c' AS side, unnest(cand) AS g
                FROM c
                UNION ALL SELECT lang, doc_id, 1, 'r', unnest(toks) FROM c
                UNION ALL
                SELECT lang, doc_id, 2, 'c',
                  unnest(list_transform(range(1, len(cand)),
                    i -> cand[i] || ' ' || cand[i+1]))
                FROM c
                UNION ALL
                SELECT lang, doc_id, 2, 'r',
                  unnest(list_transform(range(1, len(toks)),
                    i -> toks[i] || ' ' || toks[i+1]))
                FROM c),
              cnt AS (
                SELECT lang, doc_id, n, g,
                  sum(CASE WHEN side = 'c' THEN 1 ELSE 0 END) AS cc,
                  sum(CASE WHEN side = 'r' THEN 1 ELSE 0 END) AS rc
                FROM e GROUP BY 1, 2, 3, 4),
              agg AS (
                SELECT lang, n, sum(least(cc, rc)) AS m, sum(cc) AS c
                FROM cnt GROUP BY 1, 2),
              lens AS (
                SELECT lang, sum(len(cand)) AS cand_len,
                  sum(len(toks)) AS ref_len
                FROM c GROUP BY lang),
              wide AS (
                SELECT lang,
                  max(CASE WHEN n = 1 THEN m END) AS m1,
                  max(CASE WHEN n = 1 THEN c END) AS c1,
                  max(CASE WHEN n = 2 THEN m END) AS m2,
                  max(CASE WHEN n = 2 THEN c END) AS c2
                FROM agg GROUP BY lang)
              SELECT w.lang,
                CAST((m1 * 10000) // c1 AS BIGINT) AS p1_bp,
                CAST((m2 * 10000) // c2 AS BIGINT) AS p2_bp,
                CAST(cand_len AS BIGINT) AS cand_len,
                CAST(ref_len AS BIGINT) AS ref_len,
                CAST((cand_len * 10000) // ref_len AS BIGINT) AS brevity_bp
              FROM wide w JOIN lens l ON l.lang = w.lang
              ORDER BY w.lang""")),

    // RAG chunk preparation: sliding token windows of width 16 at
    // stride 12 (25% overlap — the retrieval-chunking default shape),
    // each chunk carrying its token count, exact CHARACTER offsets into
    // the (lowercased, space-joined) text, and an md5 digest — the
    // downstream embed/store key. Offsets come from the join-length of
    // the token prefix; the digest pins the chunk text itself, so the
    // oracle certifies the slicing, not just the counts. Scale shape:
    // one corpus scan, one explode of ~n/stride chunk starts per doc;
    // zero joins, zero windows — embarrassingly parallel, the ideal
    // 100 TB preprocessing shape.
    QEntry("q195_rag_chunks",
      (s, d) => {
        val w = 16
        val st = 12
        Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 1)
          .select(col("doc_id"), col("toks"),
            explode(expr(s"sequence(0, size(toks) - 1, $st)")).as("lo"))
          .select(col("doc_id"), expr(s"lo div $st").cast("long")
              .as("chunk_idx"),
            expr(s"array_join(slice(toks, lo + 1, $w), ' ')").as("chunk"),
            least(size(col("toks")) - col("lo"), lit(w)).cast("long")
              .as("n_toks"),
            (length(expr("array_join(slice(toks, 1, lo), ' ')")) +
              when(col("lo") > 0, 1).otherwise(0)).cast("long").as("char_lo"))
          .select(col("doc_id"), col("chunk_idx"), col("n_toks"),
            col("char_lo"),
            (col("char_lo") + length(col("chunk"))).as("char_hi"),
            md5(col("chunk")).as("chunk_digest"))
          .orderBy(col("doc_id"), col("chunk_idx"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents
                WHERE len(string_split_regex(lower(text), '\s+')) >= 1),
              st AS (
                SELECT doc_id, toks, unnest(range(0, len(toks), 12)) AS lo
                FROM t),
              ch AS (
                SELECT doc_id, lo // 12 AS chunk_idx,
                  array_to_string(toks[lo + 1 : lo + 16], ' ') AS chunk,
                  least(len(toks) - lo, 16) AS n_toks,
                  -- array_to_string([]) is NULL in DuckDB, not '' — lo = 0
                  -- (the prefix-less first chunk) needs the explicit 0
                  CASE WHEN lo = 0 THEN 0
                    ELSE length(array_to_string(toks[1 : lo], ' ')) + 1
                  END AS char_lo
                FROM st)
              SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
                CAST(n_toks AS BIGINT) AS n_toks,
                CAST(char_lo AS BIGINT) AS char_lo,
                CAST(char_lo + length(chunk) AS BIGINT) AS char_hi,
                md5(chunk) AS chunk_digest
              FROM ch ORDER BY doc_id, chunk_idx""")),

    // Intra-document cleanup: collapse runs of consecutively repeated
    // tokens ("batch batch batch" → "batch") — the crawl-text stutter
    // fix that Gopher's repetition FILTERS only detect; this operator
    // repairs. Per doc: original/kept token counts, tokens removed,
    // the longest run (from kept-start index gaps — no second scan),
    // and the cleaned text's digest (pins the reconstruction, not just
    // the counts). Pure per-row HOF chain — one corpus scan, no
    // shuffle but the output sort.
    QEntry("q196_run_collapse",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 1)
          .withColumn("kept",
            expr("filter(transform(toks, (t, i) -> struct(t AS t, i AS i))," +
              " s -> s.i = 0 OR toks[s.i - 1] != s.t).t"))
          .withColumn("starts",
            expr("filter(transform(toks, (t, i) -> struct(t AS t, i AS i))," +
              " s -> s.i = 0 OR toks[s.i - 1] != s.t).i"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_toks"),
            size(col("kept")).cast("long").as("n_kept"),
            (size(col("toks")) - size(col("kept"))).cast("long")
              .as("n_removed"),
            // run length at kept-start i = next kept-start − i, with the
            // token count as the final sentinel
            expr("array_max(zip_with(starts, " +
              "concat(slice(starts, 2, size(starts)), " +
              "array(size(toks))), (a, b) -> b - a))").cast("long")
              .as("max_run"),
            md5(expr("array_join(kept, ' ')")).as("clean_digest"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents
                WHERE len(string_split_regex(lower(text), '\s+')) >= 1),
              k AS (
                SELECT doc_id, toks,
                  [toks[i] FOR i IN range(1, len(toks) + 1)
                    IF i = 1 OR toks[i - 1] != toks[i]] AS kept,
                  [i FOR i IN range(1, len(toks) + 1)
                    IF i = 1 OR toks[i - 1] != toks[i]] AS starts
                FROM t)
              SELECT doc_id,
                CAST(len(toks) AS BIGINT) AS n_toks,
                CAST(len(kept) AS BIGINT) AS n_kept,
                CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
                CAST(list_max(list_transform(range(1, len(starts) + 1),
                  j -> (CASE WHEN j = len(starts) THEN len(toks) + 1
                        ELSE starts[j + 1] END) - starts[j])) AS BIGINT)
                  AS max_run,
                md5(array_to_string(kept, ' ')) AS clean_digest
              FROM k ORDER BY doc_id""")),

    // KMV set algebra: per-source k-minimum-values sketches (q181's
    // construction) merged pairwise — union distinct estimated from the
    // k-th smallest of the merged sketch, Jaccard estimated as the
    // shared fraction of the merged top-k (the Beyer et al. 2007 KMV
    // estimator family). Everything derives from the same 32-bit md5
    // prefix hash, so DuckDB replays the sketch bit-for-bit. Scale
    // shape: the corpus is touched ONCE to build the per-source
    // sketches (≤ k rows each); the pairwise merge works on those
    // dimension-sized frames only — the synopsis pattern that makes
    // source-overlap questions answerable without re-scanning 100 TB.
    QEntry("q197_kmv_setops",
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
          .distinct()
        val sk = sh.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("source")).orderBy(col("h"))))
          .filter(col("rn") <= k).select(col("source"), col("h"))
          .localCheckpoint() // dimension-sized: ≤ k rows per source
        val srcs = sk.select(col("source")).distinct()
        // merged multiset per ordered pair: every sketch element of A
        // and of B tagged 0, matched elements tagged 1; max(both) per
        // (pair, h) de-dups — exactly the merged KMV sketch
        val m = sk.join(srcs.select(col("source").as("src_b")),
            col("source") < col("src_b"))
          .select(col("source").as("src_a"), col("src_b"), col("h"),
            lit(0L).as("both"))
          .union(sk.join(srcs.select(col("source").as("src_a")),
            col("src_a") < col("source"))
            .select(col("src_a"), col("source").as("src_b"), col("h"),
              lit(0L).as("both")))
          .union(sk.select(col("source").as("src_a"), col("h"))
            .join(sk.select(col("source").as("src_b"),
              col("h").as("hb")),
              col("src_a") < col("src_b") && col("h") === col("hb"))
            .select(col("src_a"), col("src_b"), col("h"), lit(1L).as("both")))
          .groupBy(col("src_a"), col("src_b"), col("h"))
          .agg(max(col("both")).as("both"))
        m.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))))
          .filter(col("rn") <= k)
          .groupBy(col("src_a"), col("src_b"))
          .agg(max(col("h")).as("hk"), count(lit(1)).as("nk"),
            sum(col("both")).as("shared"))
          .select(col("src_a"), col("src_b"), col("nk"), col("shared"),
            when(col("nk") < k, col("nk"))
              .otherwise(expr(s"(${k - 1} * 4294967296) div hk"))
              .as("union_est"),
            expr("(shared * 10000) div nk").as("jaccard_bp"))
          .orderBy(col("src_a"), col("src_b"))
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
              sk AS (SELECT source, h FROM r WHERE rn <= 64),
              srcs AS (SELECT DISTINCT source FROM sk),
              mm AS (
                SELECT src_a, src_b, h, max(inb) AS inb
                FROM (
                  SELECT a.source AS src_a, b.source AS src_b, a.h, 0 AS inb
                  FROM sk a JOIN srcs b ON a.source < b.source
                  UNION ALL
                  SELECT a.source, b.source, b.h, 0
                  FROM sk b JOIN srcs a ON a.source < b.source
                  UNION ALL
                  SELECT a.source, b.source, a.h, 1
                  FROM sk a JOIN sk b
                    ON a.source < b.source AND a.h = b.h)
                GROUP BY 1, 2, 3),
              rr AS (
                SELECT src_a, src_b, h, inb,
                  row_number() OVER (PARTITION BY src_a, src_b ORDER BY h)
                    AS rn
                FROM mm),
              topk AS (
                SELECT src_a, src_b, max(h) AS hk, count(*) AS nk,
                  sum(inb) AS shared
                FROM rr WHERE rn <= 64 GROUP BY 1, 2)
              SELECT src_a, src_b, CAST(nk AS BIGINT) AS nk,
                CAST(shared AS BIGINT) AS shared,
                CAST(CASE WHEN nk < 64 THEN nk
                     ELSE (63 * 4294967296) // hk END AS BIGINT)
                  AS union_est,
                CAST((shared * 10000) // nk AS BIGINT) AS jaccard_bp
              FROM topk ORDER BY src_a, src_b""")),

    // HITS hubs & authorities over the q178-style link graph (doc
    // links via shared rare shingles, oriented low→high), two mutual-
    // reinforcement iterations in scaled-integer discipline: each
    // half-step sums neighbor scores over the edge list then rescales
    // to Σ = 1e6 by integer div — deterministic, order-independent,
    // replayed exactly by the oracle. Scale shape: each half-step is
    // one keyed join + one keyed agg on the edge frame; no vertex ever
    // materializes its neighborhood, and the renorm total is a 1-row
    // broadcast.
    QEntry("q198_hits",
      (s, d) => graft.operators.GraphOps
        // low→high orientation: a DAG; the operator runs the a¹→h¹→a²
        // half-steps with 1-row broadcast renorms (ScaleBench drives the
        // same operator on a 10M-edge synthetic graph)
        .hits(linkEdges(s, d, symmetric = false))
        .select(col("id").as("doc_id"), col("authority_ppm"),
          col("hub_ppm"))
        .filter(col("authority_ppm") > 0 || col("hub_ppm") > 0)
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              sh AS (
                SELECT DISTINCT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS g
                FROM t WHERE len(toks) >= 3),
              rare AS (
                SELECT g FROM sh GROUP BY g
                HAVING count(*) BETWEEN 2 AND 4),
              edges AS (
                SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                FROM sh a JOIN rare USING (g)
                JOIN sh b ON b.g = a.g AND a.doc_id < b.doc_id),
              verts AS (
                SELECT src AS id FROM edges
                UNION SELECT dst FROM edges),
              a1r AS (
                SELECT v.id,
                  coalesce((SELECT count(*) * 1000000 FROM edges e
                            WHERE e.dst = v.id), 0) AS a
                FROM verts v),
              a1 AS (
                SELECT id, (a * 1000000) // (SELECT sum(a) FROM a1r) AS a
                FROM a1r),
              h1r AS (
                SELECT v.id,
                  coalesce((SELECT sum(a1.a) FROM edges e
                            JOIN a1 ON a1.id = e.dst
                            WHERE e.src = v.id), 0) AS h
                FROM verts v),
              h1 AS (
                SELECT id, (h * 1000000) // (SELECT sum(h) FROM h1r) AS h
                FROM h1r),
              a2r AS (
                SELECT v.id,
                  coalesce((SELECT sum(h1.h) FROM edges e
                            JOIN h1 ON h1.id = e.src
                            WHERE e.dst = v.id), 0) AS a
                FROM verts v),
              a2 AS (
                SELECT id, (a * 1000000) // (SELECT sum(a) FROM a2r) AS a
                FROM a2r)
              SELECT a2.id AS doc_id, CAST(a2.a AS BIGINT) AS authority_ppm,
                CAST(h1.h AS BIGINT) AS hub_ppm
              FROM a2 JOIN h1 ON h1.id = a2.id
              WHERE a2.a > 0 OR h1.h > 0
              ORDER BY doc_id""")),

    // k-core decomposition (k = 2, 4 peel rounds) over the SYMMETRIZED
    // rare-shingle link graph: iteratively drop vertices with degree
    // < k. Survivors report their degree in the peeled subgraph — the
    // "dense part of the near-dup graph" diagnostic a curation run
    // reads before canonical selection. Four unrolled rounds converge
    // on the fixture (KCoreSpec asserts a 5th peel removes nobody);
    // each round is one keyed agg + two semi-joins on the edge frame,
    // with a checkpoint barrier so the lineage stays flat — the
    // components-operator discipline (Dedup.components) reused.
    QEntry("q199_kcore",
      (s, d) => kcore(s, d, rounds = 4),
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              sh AS (
                SELECT DISTINCT doc_id,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS g
                FROM t WHERE len(toks) >= 3),
              rare AS (
                SELECT g FROM sh GROUP BY g
                HAVING count(*) BETWEEN 2 AND 4),
              e0 AS (
                SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
                FROM sh a JOIN rare USING (g)
                JOIN sh b ON b.g = a.g AND a.doc_id <> b.doc_id),
              k1 AS (SELECT src FROM e0 GROUP BY src HAVING count(*) >= 2),
              e1 AS (
                SELECT e.src, e.dst FROM e0 e
                JOIN k1 a ON a.src = e.src JOIN k1 b ON b.src = e.dst),
              k2 AS (SELECT src FROM e1 GROUP BY src HAVING count(*) >= 2),
              e2 AS (
                SELECT e.src, e.dst FROM e1 e
                JOIN k2 a ON a.src = e.src JOIN k2 b ON b.src = e.dst),
              k3 AS (SELECT src FROM e2 GROUP BY src HAVING count(*) >= 2),
              e3 AS (
                SELECT e.src, e.dst FROM e2 e
                JOIN k3 a ON a.src = e.src JOIN k3 b ON b.src = e.dst),
              k4 AS (SELECT src FROM e3 GROUP BY src HAVING count(*) >= 2),
              e4 AS (
                SELECT e.src, e.dst FROM e3 e
                JOIN k4 a ON a.src = e.src JOIN k4 b ON b.src = e.dst)
              SELECT src AS doc_id, count(*) AS core_deg
              FROM e4 GROUP BY src ORDER BY doc_id"""))
  )
}
