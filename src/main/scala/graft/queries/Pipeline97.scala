package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-17 pack, session 2 — the composed PRETRAINING-CORPUS release
  * gate (the q449/q453 pattern, THIRD instantiation, at DOC grain) and
  * the gate-regression DIFF that makes a knob change reviewable.
  *
  * q449 gates SFT conversations, q453 gates preference pairs; the
  * pretraining corpus is the third release artifact with its own
  * piecewise-audited failure modes (q33 langid, q89 Gopher quality,
  * q30 exact dup, q37 near-dup, q397 n-gram eval contamination, q452
  * contact blocks). q456 chains them at doc grain with cross-stage
  * rescoping — dedup only among quality survivors, contamination only
  * among dedup survivors — one keep/drop/hold manifest row per doc and
  * ONE oracle replaying the entire chain.
  *
  * What is NEW versus q449/q453: the gate has a HOLDOUT grain (eval
  * docs are neither kept nor dropped — they are the contamination
  * reference set), and q457 runs the SAME chain at two knob settings
  * and diffs the manifests — the review artifact a data team actually
  * reads before loosening a threshold on a 100 TB corpus (which docs
  * flip, and at which stage each run now convicts them).
  */
object Pipeline97 {

  // ---- shared fixture: decorated corpus with planted failure modes ----

  /** Base documents decorated with q452's contact appendages (risky
    * sources only), plus four plant families: exact re-publications
    * (ids +20M), near-dup re-publications with a one-token suffix edit
    * (ids +40M, 3 replicas — exact-collapse-immune, band-collide with
    * their seed, J≈0.97), crawl mirrors of EVAL docs (ids +60M — the
    * contamination plant: every eval 6-gram survives the 'mirror post'
    * prefix), and 3/4-token truncations (ids +80M, the q451 graded
    * plant: distinct-token J spreads around ~0.75, so the tau knob's
    * two settings in q457 disagree about them — the knife-edge docs a
    * threshold review exists for). All text is content-derived, so
    * both engines synthesize the identical corpus. */
  private[queries] def gateCorpus(s: SparkSession, d: String): DataFrame = {
    val draw = conv(substring(md5(col("doc_id").cast("string")), 1, 4),
      16, 10).cast("long")
    val risky = conv(substring(md5(col("source")), 1, 2), 16, 10)
      .cast("long") % 14 === 6
    val dec = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        concat(col("text"),
          when(risky && draw % 7 === 0,
            lit(" contact: jane.doe@example.com +1-212-555-0147"))
            .otherwise(lit("")),
          when(risky && draw % 7 === 1,
            lit(" reach me at john@example.org")).otherwise(lit("")),
          when(risky && draw % 7 === 2,
            lit(" call +1-415-555-0199")).otherwise(lit("")))
          .as("text"))
    val exact = dec.filter(col("doc_id") % 53 === 7)
      .select((col("doc_id") + 20000000L).as("doc_id"),
        lit("mirror_exact").as("source"), col("text"))
    val near = dec.filter(col("doc_id") % 89 === 2)
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1), lit(3))).as("i"))
      .select((col("doc_id") * 1000L + col("i") + 40000000L).as("doc_id"),
        lit("mirror_near").as("source"),
        concat(col("text"), lit(" rep "), col("i")).as("text"))
    val contam = dec.filter(col("doc_id") % 41 === 3)
      .select((col("doc_id") + 60000000L).as("doc_id"),
        lit("crawl_mirror").as("source"),
        concat(lit("mirror post "), col("text")).as("text"))
    def trimTo(num: Int, den: Int, offset: Long, residue: Int) =
      dec.filter(draw % 31 === residue)
        .select((col("doc_id") + offset).as("doc_id"),
          lit("trim_mirror").as("source"),
          array_join(slice(split(col("text"), "\\s+"), lit(1),
            greatest(lit(1), expr(
              s"CAST(size(split(text, '\\\\s+')) * $num div $den AS INT)"))),
            " ").as("text"))
    // two graded families: 3/4 trims spread J around ~0.75 (the 0.8 vs
    // 0.7 knife edge), 7/8 trims around ~0.85 (the 0.8 vs 0.9 edge)
    val trim = trimTo(3, 4, 80000000L, 9)
      .union(trimTo(7, 8, 90000000L, 22))
    dec.union(exact).union(near).union(contam).union(trim)
  }

  /** Eval-holdout membership: base-id docs in the benchmark slice.
    * Plants (ids >= 10M) are never eval, whatever their residue. */
  private def isEval: Column =
    col("doc_id") % 41 === 3 && col("doc_id") < 10000000L

  // ---- the gate chain, knob-parameterized for q457 ----

  /** Round 18 (guide §1.2/§2.3): the knob-independent per-doc features,
    * computed in ONE text pass over the whole corpus — the two-knob q457
    * used to run the full lang/quality tokenize pass per chain, md5 the
    * text twice more inside each chain's dedup stage, and tokenize the
    * corpus yet again for each manifest's n_tok. Every chain stage is
    * now a cheap comparison over this persisted spine. Quantities are
    * the exact ingestDropStage/Gopher integers (same expressions —
    * toks/langScores/stopwordCount/distinctTokenCount), so the staged
    * verdicts are bit-identical and the q456/q457/q458 oracles stay
    * green (re-verified at sf0.001 and sf0.01). Repartitioned by doc_id
    * first (guide §2.5, the q192 pattern): measured BOTH ways at 32c —
    * with the slim (doc_id…text) exchange the two-chain q457 runs
    * 10.1 s vs 12.3 s without it (the spine build and both chains'
    * stage frames otherwise inherit the derived-union's 6 partitions
    * and the driver gap grows as every downstream job serializes over
    * few fat tasks); the task-count overhead it adds is micro-task
    * fixed cost that amortizes away above toy scale. */
  private[queries] def gateFeats(corpus: DataFrame): DataFrame = {
    val t = col("text")
    val ls = graft.pipeline.TextAnalysis.langScores(t)
    val toks = graft.pipeline.TextAnalysis.toks(t)
    corpus
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism,
        col("doc_id"))
      .select(col("doc_id"), col("source"), t, isEval.as("is_eval"),
        (ls.getField("pred") === "en" && ls.getField("en") >= 1)
          .as("lang_ok"),
        size(toks).cast("long").as("n_tok"),
        aggregate(toks, lit(0L), (acc, x) => acc + length(x)).as("sum_len"),
        graft.pipeline.TextAnalysis.stopwordCount(t).cast("long")
          .as("n_stop"),
        graft.pipeline.TextAnalysis.distinctTokenCount(t).cast("long")
          .as("n_dist"),
        md5(t).as("h"))
  }

  /** Stage-1/2 verdict over a [[gateFeats]] row — the same when-cascade
    * as [[graft.pipeline.Curation.ingestDropStage]] (q458's streaming
    * arm keeps calling that directly), on the precomputed quantities. */
  private def stage12Col(maxLen: Int, repTenths: Int): Column =
    when(!col("lang_ok"), "non_english")
      .when(!(col("n_tok") >= 10 && col("n_tok") <= maxLen), "quality_len")
      .when(!(col("sum_len") >= col("n_tok") * 3 &&
        col("sum_len") <= col("n_tok") * 10), "quality_word_len")
      .when(!(col("n_stop") * 100 >= col("n_tok")), "quality_stopword")
      .when(!(col("n_dist") * 10 >= col("n_tok") * repTenths),
        "quality_repetition")

  /** The shared per-doc substrate both q457 chains (and q456's single
    * chain) read: the feature spine, the 16-perm md5-twin MinHash
    * signatures and the distinct-token arrays — each computed ONCE over
    * the union of every knob setting's stage-1/2 survivors (the minimal
    * superset of any chain's dedup population; a doc only in the other
    * chain's survivor set costs one wasted signature, nothing else).
    * sigs/dtoks persist because each chain consumes them from several
    * joins (the old per-chain tokenArrays frame was built twice per
    * chain — once per verify side). */
  private[queries] final case class GateSpine(
      feats: DataFrame, sigs: DataFrame, dtoks: DataFrame)

  private[queries] def gateSpine(corpus: DataFrame,
      knobs: Seq[(Int, Int)]): GateSpine = {
    val feats = gateFeats(corpus)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val passAny = knobs.map { case (ml, rt) => stage12Col(ml, rt).isNull }
      .reduce(_ || _)
    val superset = feats.filter(!col("is_eval") && passAny)
    val sigs = Pipeline.minhashSigsOver(
        superset.select(col("doc_id"), col("text")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val dtoks = graft.pipeline.Dedup.tokenArrays(superset, "doc_id", "text")
      .persist(StorageLevel.MEMORY_AND_DISK)
    GateSpine(feats, sigs, dtoks)
  }

  /** One manifest row per corpus doc: verdict keep/drop/hold, the ONE
    * stage that decided it, and its token count (the yield ledger).
    * Stages, each rescoped to the prior stage's survivors:
    *   1 non_english        — content-derived langid (q33 detector:
    *                          pred must be 'en' AND at least one
    *                          English marker), never the label column;
    *   2 quality_*          — Gopher gates (q89 thresholds; max-length
    *                          knob parameterized), first failing rule;
    *   3 exact_dup          — md5 group over survivors, min-id kept;
    *   4 near_dup           — the q37 production index (md5 16-perm
    *                          minhash, 4x4 bands, capped buckets) +
    *                          exact token-Jaccard verify at tau, min-id
    *                          kept (any verified smaller-id neighbor
    *                          convicts);
    *   5 eval_contaminated  — shares any distinct gramN-gram with the
    *                          eval holdout (grams broadcast: eval sets
    *                          are fixed-size however big the corpus);
    *   6 contact_block      — q452's email+phone co-occurrence.
    * Scale shape: the corpus is scanned once into a persisted spine;
    * every stage output is a slim (doc_id, stage) projection; the only
    * wide shuffles are the digest group-by and the banded candidate
    * join, both keyed and capped; nothing driver-sided. */
  private[queries] def gateManifest(spine: GateSpine, maxLen: Int,
      repTenths: Int, tauNum: Int, tauDen: Int, gramN: Int): DataFrame = {
    val train = spine.feats.filter(!col("is_eval"))
    // stages 1-2: the stateless lang + quality gates — the same
    // ingestDropStage cascade, evaluated over the precomputed spine
    val t1 = train.withColumn("__stage12", stage12Col(maxLen, repTenths))
    val d12 = t1.filter(col("__stage12").isNotNull)
      .select(col("doc_id"), col("__stage12").as("stage"))
    val g2 = t1.filter(col("__stage12").isNull)
      .select(col("doc_id"), col("source"), col("text"), col("h"))
    // stage 3: exact dedup (min-id representative); the digest is the
    // spine's h — the old shape md5'd the text twice per chain here
    val grp = g2.groupBy(col("h").as("__k"))
      .agg(min(col("doc_id")).as("rep_id"))
    val withRep = g2.withColumn("__k", col("h")).join(grp, "__k")
    val d3 = withRep.filter(col("doc_id") =!= col("rep_id"))
      .select(col("doc_id"), lit("exact_dup").as("stage"))
    val g3 = withRep.filter(col("doc_id") === col("rep_id"))
      .select(col("doc_id"), col("source"), col("text"))
      .persist(StorageLevel.MEMORY_AND_DISK) // bands + anti-join + grams
    // stage 4: near-dup (banded candidates, exact verify, min-id kept)
    // over the SHARED signature/token-array spine (round 18): only the
    // banding, capping and verify joins are per-chain now
    val ver = graft.pipeline.Dedup.verifyJaccard(
        Pipeline.minhashCandidatesFromBuckets(
          Pipeline.bandsFromSigs(
            g3.select(col("doc_id")).join(spine.sigs, "doc_id"))),
        spine.dtoks, 0.0)
      .filter(col("inter") * tauDen >= col("uni") * tauNum)
    val nd = ver.select(col("b_id").as("doc_id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // drop label + anti-join
    val d4 = nd.select(col("doc_id"), lit("near_dup").as("stage"))
    val g4 = g3.join(nd, Seq("doc_id"), "left_anti")
    // stage 5: eval contamination (distinct n-gram overlap, broadcast).
    // Round 18 (guide §4/§2.3): gram identity via the fused
    // ngram_shingle_hashes (xxhash64 of the same space-joined shingle,
    // hashed as it is formed) instead of ngram_shingles + md5-per-gram —
    // membership semantics unchanged (both digests are collision-free
    // on these sets, and the oracle replays its md5 twin and stays
    // green), the broadcast set carries 8-byte longs instead of 32-hex
    // strings, and the gram strings never leave the expression.
    def grams(df: DataFrame): DataFrame = df.select(col("doc_id"),
      explode(graft.expressions.functions.ngram_shingle_hashes(
        split(lower(col("text")), "\\s+"), gramN, distinct = true))
        .as("gh"))
    val evg = grams(spine.feats.filter(col("is_eval")))
      .select(col("gh")).distinct()
    val contaminated = grams(g4)
      .join(broadcast(evg), Seq("gh"), "left_semi")
      .select(col("doc_id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK) // drop label + anti-join
    val d5 = contaminated
      .select(col("doc_id"), lit("eval_contaminated").as("stage"))
    val g5 = g4.join(contaminated, Seq("doc_id"), "left_anti")
    // stage 6: contact-block scan (q452 regexes)
    val d6 = g5.filter(
        col("text").rlike("[a-z0-9.]+@[a-z0-9.]+\\.[a-z][a-z]+") &&
        col("text").rlike("\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}"))
      .select(col("doc_id"), lit("contact_block").as("stage"))
    // manifest: every doc, exactly one stage; n_tok from the spine (the
    // same size(split(lower(text))) integer, tokenized once)
    val drops = d12.union(d3).union(d4).union(d5).union(d6)
    spine.feats.select(col("doc_id"), col("source"), col("n_tok"),
        col("is_eval").as("__eval"))
      .join(drops, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        when(col("__eval"), "hold")
          .when(col("stage").isNull, "keep").otherwise("drop")
          .as("verdict"),
        when(col("__eval"), "eval_holdout")
          .otherwise(coalesce(col("stage"), lit("kept"))).as("stage"),
        col("n_tok"))
  }

  // ---- oracle SQL generators (shared corpus CTEs + prefixed chain) ----

  private val stopList =
    graft.pipeline.TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** Corpus + eval-gram CTE block (knob-independent, emitted once). */
  private def corpusSql: String =
    """base AS (
        SELECT doc_id, source, draw,
          text ||
          CASE WHEN risky AND draw % 7 = 0
            THEN ' contact: jane.doe@example.com +1-212-555-0147'
            ELSE '' END ||
          CASE WHEN risky AND draw % 7 = 1
            THEN ' reach me at john@example.org' ELSE '' END ||
          CASE WHEN risky AND draw % 7 = 2
            THEN ' call +1-415-555-0199' ELSE '' END AS text
        FROM (SELECT doc_id, source, text,
            ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
              AS draw,
            ('0x' || substr(md5(source), 1, 2))::BIGINT % 14 = 6 AS risky
          FROM documents)),
      corpus AS (
        SELECT doc_id, source, text FROM base
        UNION ALL
        SELECT doc_id + 20000000, 'mirror_exact', text
        FROM base WHERE doc_id % 53 = 7
        UNION ALL
        SELECT doc_id * 1000 + i + 40000000, 'mirror_near',
          text || ' rep ' || i
        FROM base, (SELECT unnest(generate_series(1, 3)) AS i) i
        WHERE doc_id % 89 = 2
        UNION ALL
        SELECT doc_id + 60000000, 'crawl_mirror', 'mirror post ' || text
        FROM base WHERE doc_id % 41 = 3
        UNION ALL
        SELECT doc_id + 80000000, 'trim_mirror',
          array_to_string(tk[1:greatest(1,
            CAST(len(tk) * 3 // 4 AS INT))], ' ')
        FROM (SELECT doc_id, text,
            string_split_regex(text, '\s+') AS tk
          FROM base WHERE draw % 31 = 9)
        UNION ALL
        SELECT doc_id + 90000000, 'trim_mirror',
          array_to_string(tk[1:greatest(1,
            CAST(len(tk) * 7 // 8 AS INT))], ' ')
        FROM (SELECT doc_id, text,
            string_split_regex(text, '\s+') AS tk
          FROM base WHERE draw % 31 = 22)),
      ev AS (
        SELECT * FROM corpus
        WHERE doc_id % 41 = 3 AND doc_id < 10000000),
      tr AS (
        SELECT * FROM corpus
        WHERE NOT (doc_id % 41 = 3 AND doc_id < 10000000))"""

  /** The chain CTE block at one knob setting, all names prefixed so two
    * settings coexist in one statement (q457). Ends in {p}manifest. */
  private def chainSql(p: String, maxLen: Int, repTenths: Int,
      tauNum: Int, tauDen: Int, gramN: Int): String = {
    def occ(m: String) =
      s"CAST((length(pd) - length(replace(pd, '$m', ''))) / ${m.length} AS INTEGER)"
    val en = s"${occ(" the ")} + ${occ(" and ")} + ${occ(" with ")}"
    val es = s"${occ(" el ")} + ${occ(" los ")} + ${occ(" con ")}"
    val de = s"${occ(" der ")} + ${occ(" und ")} + ${occ(" mit ")}"
    val fr = s"${occ(" le ")} + ${occ(" les ")} + ${occ(" avec ")}"
    val P = 4294967311L
    val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
      s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
    }.mkString("[", ",\n                  ", "]")
    s"""${p}l AS (
        SELECT doc_id, source, text,
          ($en >= $es AND $en >= $de AND $en >= $fr AND $en >= 1)
            AS en_ok
        FROM (SELECT *, concat(' ', lower(text), ' ') AS pd FROM tr)),
      ${p}d1 AS (
        SELECT doc_id, 'non_english' AS stage FROM ${p}l WHERE NOT en_ok),
      ${p}q AS (
        SELECT doc_id, source, text,
          CASE WHEN NOT (n_tok >= 10 AND n_tok <= $maxLen)
              THEN 'quality_len'
            WHEN NOT (sum_tok_len >= n_tok * 3
              AND sum_tok_len <= n_tok * 10) THEN 'quality_word_len'
            WHEN NOT (n_stop * 100 >= n_tok) THEN 'quality_stopword'
            WHEN NOT (n_distinct * 10 >= n_tok * $repTenths)
              THEN 'quality_repetition'
            ELSE '' END AS qreason
        FROM (SELECT doc_id, source, text,
            CAST(len(toks) AS BIGINT) AS n_tok,
            CAST(list_sum(list_transform(toks, t -> length(t)))
              AS BIGINT) AS sum_tok_len,
            CAST(len(list_filter(toks, t -> t IN ($stopList)))
              AS BIGINT) AS n_stop,
            CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
          FROM (SELECT doc_id, source, text,
              string_split_regex(lower(text), '\\s+') AS toks
            FROM ${p}l WHERE en_ok))),
      ${p}d2 AS (
        SELECT doc_id, qreason AS stage FROM ${p}q WHERE qreason != ''),
      ${p}g2 AS (
        SELECT doc_id, source, text FROM ${p}q WHERE qreason = ''),
      ${p}grp AS (
        SELECT md5(text) AS k, min(doc_id) AS rep_id
        FROM ${p}g2 GROUP BY 1),
      ${p}d3 AS (
        SELECT g.doc_id, 'exact_dup' AS stage
        FROM ${p}g2 g JOIN ${p}grp r ON r.k = md5(g.text)
        WHERE g.doc_id != r.rep_id),
      ${p}g3 AS (
        SELECT g.doc_id, g.source, g.text
        FROM ${p}g2 g JOIN ${p}grp r ON r.k = md5(g.text)
        WHERE g.doc_id = r.rep_id),
      ${p}sh AS (
        SELECT doc_id, list_distinct(list_transform(
          range(1, len(toks) - 1),
          i -> array_to_string(toks[i:i+2], ' '))) AS shingles
        FROM (SELECT doc_id,
            string_split_regex(lower(text), '\\s+') AS toks
          FROM ${p}g3)),
      ${p}h AS (
        SELECT doc_id, list_transform(shingles,
          s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
        FROM ${p}sh WHERE len(shingles) > 0),
      ${p}sig AS (SELECT doc_id, $sigList AS sig FROM ${p}h),
      ${p}bands AS (
        SELECT doc_id, band,
          array_to_string(list_transform(sig[band*4+1:band*4+4],
            x -> CAST(x AS VARCHAR)), ',') AS bkey
        FROM ${p}sig
        CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
      ${p}ok AS (
        SELECT band, bkey FROM ${p}bands
        GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
      ${p}cand AS (
        SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
        FROM ${p}bands a
        JOIN ${p}bands b ON b.band = a.band AND b.bkey = a.bkey
                        AND b.doc_id > a.doc_id
        JOIN ${p}ok ok ON ok.band = a.band AND ok.bkey = a.bkey),
      ${p}dtok AS (
        SELECT doc_id, unnest(list_distinct(
          string_split_regex(lower(text), '\\s+'))) AS tok
        FROM ${p}g3),
      ${p}sz AS (
        SELECT doc_id, count(*) AS ntok FROM ${p}dtok GROUP BY doc_id),
      ${p}iv AS (
        SELECT c.a_id, c.b_id, count(*) AS inter
        FROM ${p}cand c
        JOIN ${p}dtok a ON a.doc_id = c.a_id
        JOIN ${p}dtok b ON b.doc_id = c.b_id AND b.tok = a.tok
        GROUP BY c.a_id, c.b_id),
      ${p}nd AS (
        SELECT DISTINCT i.b_id AS doc_id FROM ${p}iv i
        JOIN ${p}sz sa ON sa.doc_id = i.a_id
        JOIN ${p}sz sb ON sb.doc_id = i.b_id
        WHERE i.inter * $tauDen >= (sa.ntok + sb.ntok - i.inter)
          * $tauNum),
      ${p}d4 AS (SELECT doc_id, 'near_dup' AS stage FROM ${p}nd),
      ${p}g4 AS (
        SELECT * FROM ${p}g3
        WHERE doc_id NOT IN (SELECT doc_id FROM ${p}nd)),
      ${p}evg AS (
        SELECT DISTINCT gh FROM (
          SELECT unnest(list_transform(
            range(1, len(toks) - ${gramN - 2}),
            i -> md5(array_to_string(toks[i:i+${gramN - 1}], ' '))))
            AS gh
          FROM (SELECT string_split_regex(lower(text), '\\s+') AS toks
                FROM ev))),
      ${p}ct AS (
        SELECT DISTINCT t.doc_id FROM (
          SELECT doc_id, unnest(list_transform(
            range(1, len(toks) - ${gramN - 2}),
            i -> md5(array_to_string(toks[i:i+${gramN - 1}], ' '))))
            AS gh
          FROM (SELECT doc_id,
              string_split_regex(lower(text), '\\s+') AS toks
            FROM ${p}g4)) t
        JOIN ${p}evg USING (gh)),
      ${p}d5 AS (
        SELECT doc_id, 'eval_contaminated' AS stage FROM ${p}ct),
      ${p}g5 AS (
        SELECT * FROM ${p}g4
        WHERE doc_id NOT IN (SELECT doc_id FROM ${p}ct)),
      ${p}d6 AS (
        SELECT doc_id, 'contact_block' AS stage FROM ${p}g5
        WHERE regexp_matches(text,
            '[a-z0-9.]+@[a-z0-9.]+\\.[a-z][a-z]+')
          AND regexp_matches(text,
            '\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}')),
      ${p}drops AS (
        SELECT * FROM ${p}d1 UNION ALL SELECT * FROM ${p}d2
        UNION ALL SELECT * FROM ${p}d3 UNION ALL SELECT * FROM ${p}d4
        UNION ALL SELECT * FROM ${p}d5 UNION ALL SELECT * FROM ${p}d6),
      ${p}manifest AS (
        SELECT c.doc_id, c.source,
          CASE WHEN c.doc_id % 41 = 3 AND c.doc_id < 10000000
              THEN 'hold'
            WHEN d.stage IS NULL THEN 'keep' ELSE 'drop' END AS verdict,
          CASE WHEN c.doc_id % 41 = 3 AND c.doc_id < 10000000
              THEN 'eval_holdout'
            ELSE coalesce(d.stage, 'kept') END AS stage,
          CAST(len(string_split_regex(lower(c.text), '\\s+'))
            AS BIGINT) AS n_tok
        FROM corpus c LEFT JOIN ${p}drops d USING (doc_id))"""
  }

  /** q458 fixture: base docs in 3 waves ((doc_id div 7) % 3) plus
    * re-publications one wave later (+50M — the +1 wrap can land the
    * re-publication in an EARLIER wave, which the first-passing-wave
    * rule resolves without any arrival-order assumption) and same-wave
    * duplicates (+70M). Shared by the QEntry and the stream≡batch
    * replay spec. */
  private[queries] def ingestArrivals(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), col("text"))
    val draw = conv(substring(md5(col("doc_id").cast("string")),
      1, 4), 16, 10).cast("long")
    base
      .select(col("doc_id"), col("source"), col("text"),
        expr("(doc_id div 7) % 3").as("wave"))
      .union(base.filter(draw % 6 === 1)
        .select(col("doc_id") + 50000000L, lit("republish"),
          col("text"), expr("((doc_id div 7) + 1) % 3")))
      .union(base.filter(draw % 6 === 2)
        .select(col("doc_id") + 70000000L, lit("same_batch_dup"),
          col("text"), expr("(doc_id div 7) % 3")))
  }

  val entries: Seq[QEntry] = Seq(

    QEntry("q456_pretraining_release_gate",
      (s, d) => {
        // round 18: the raw corpus union is consumed exactly once (by
        // the gateFeats pass) — the persisted spine replaces the old
        // corpus persist, and every stage reads precomputed features
        val spine = gateSpine(gateCorpus(s, d), Seq((90, 4)))
        gateManifest(spine, 90, 4, 4, 5, 6).orderBy(col("doc_id"))
      },
      Some(s"""WITH $corpusSql,
              ${chainSql("a_", 90, 4, 4, 5, 6)}
              SELECT doc_id, source, verdict, stage, n_tok
              FROM a_manifest ORDER BY doc_id""")),

    // The knob-change review artifact: run A = the shipped q456 gate
    // (maxLen 90, distinct-ratio 0.4, tau 0.8, 6-gram decontamination);
    // run B = the proposed revision — looser quality (maxLen 150,
    // ratio 0.3), looser near-dup (tau 0.9), STRICTER decontamination
    // (4-grams). The diff is doc-grain: which docs changed fate, and
    // the (stage_a, stage_b) pair that attributes each flip to the
    // stage that now decides it. All three flip kinds occur by
    // construction: 'loosened' from quality survivors and the 7/8-trim
    // family (J in [.8,.9) — near_dup in A only), 'tightened' from
    // 4-gram contamination hits A's 6-grams missed, 'reclassified'
    // from docs convicted at different stages (e.g. A quality_len vs
    // B quality_repetition, or A near_dup vs B eval_contaminated).
    // ONE corpus synthesis feeds both chains.
    QEntry("q457_gate_regression_diff",
      (s, d) => {
        // round 18 (guide §1.2, VERDICT r17 item 4): ONE feature/
        // signature/token-array spine feeds BOTH knob chains — the old
        // shape ran the full lang/quality/digest text pass, the 16-perm
        // signature build and two token-array builds per chain (and the
        // corpus tokenize a 5th time per manifest). Only the banding,
        // bucket caps, verify joins and gram explodes are per-knob.
        val spine = gateSpine(gateCorpus(s, d), Seq((90, 4), (150, 3)))
        val a = gateManifest(spine, 90, 4, 4, 5, 6)
          .select(col("doc_id"), col("source"),
            col("verdict").as("verdict_a"), col("stage").as("stage_a"))
        val b = gateManifest(spine, 150, 3, 9, 10, 4)
          .select(col("doc_id"), col("verdict").as("verdict_b"),
            col("stage").as("stage_b"))
        a.join(b, "doc_id")
          .filter(col("stage_a") =!= col("stage_b"))
          .select(col("doc_id"), col("source"), col("stage_a"),
            col("stage_b"),
            when(col("verdict_a") === "keep" && col("verdict_b") === "drop",
              "tightened")
              .when(col("verdict_a") === "drop" &&
                col("verdict_b") === "keep", "loosened")
              .otherwise("reclassified").as("flip"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $corpusSql,
              ${chainSql("a_", 90, 4, 4, 5, 6)},
              ${chainSql("b_", 150, 3, 9, 10, 4)}
              SELECT a.doc_id, a.source, a.stage AS stage_a,
                b.stage AS stage_b,
                CASE WHEN a.verdict = 'keep' AND b.verdict = 'drop'
                    THEN 'tightened'
                  WHEN a.verdict = 'drop' AND b.verdict = 'keep'
                    THEN 'loosened'
                  ELSE 'reclassified' END AS flip
              FROM a_manifest a JOIN b_manifest b USING (doc_id)
              WHERE a.stage != b.stage
              ORDER BY a.doc_id""")),

    // Streaming arm of the q456 gate (admission control at the corpus
    // door): three real foreachBatch micro-batches; per arriving doc,
    // the stateless lang+quality stages, then exact dedup against the
    // ACCEPTED-digest state (Curation.StreamingIngestGate — tiered
    // state, q450 discipline). Plants: draw%6=1 docs re-published
    // (+50M) one wave later -> 'dup_vs_state' for whichever arrival is
    // in the later wave (the +1 wrap can put the re-publication FIRST;
    // the first-passing-wave rule decides, not arrival id); draw%6=2
    // docs duplicated (+70M) in their own wave -> the larger id drops
    // 'dup_in_batch'. batch_id is derived from the batch's own rows
    // (constant per wave file), so the oracle's closed-prefix replay is
    // order-independent (ADVICE r16 convention). Scale shape: stateless
    // stages are a projection; the only stateful op is a digest
    // semi/anti join against O(log n) checkpointed tiers.
    QEntry("q458_stream_ingest_gate",
      (s, d) => {
        val arrivals = ingestArrivals(s, d)
        val inDir = Scratch.dir(s, "q458_wave")
        for (b <- 0 until 3) {
          arrivals.filter(col("wave") === b)
            .coalesce(1).write.mode("overwrite").parquet(s"$inDir/b$b")
          // explicit strictly-increasing mtimes pin source order even
          // on coarse-timestamp filesystems (q450 convention)
          val dir = java.nio.file.Paths.get(
            inDir.stripPrefix("file:"), s"b$b")
          val t = java.nio.file.attribute.FileTime.fromMillis(
            1700000000000L + b * 2000L)
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toList
            .foreach(p => java.nio.file.Files.setLastModifiedTime(p, t))
        }
        val emitted = scala.collection.mutable.ArrayBuffer
          .empty[org.apache.spark.sql.DataFrame]
        val gate = new graft.pipeline.Curation.StreamingIngestGate(
          90, df => emitted.synchronized { emitted += df },
          batchLabel = Some(col("wave")))
        val stream = s.readStream.schema(arrivals.schema)
          .option("maxFilesPerTrigger", 1)
          .parquet(s"$inDir/b*")
        val q = gate.start(stream)
        q.awaitTermination()
        emitted.reduce(_ union _).orderBy(col("doc_id"))
      },
      Some("""WITH b0 AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw
                FROM documents),
              arr AS (
                SELECT doc_id, source, text,
                  (doc_id // 7) % 3 AS wave
                FROM b0
                UNION ALL
                SELECT doc_id + 50000000, 'republish', text,
                  ((doc_id // 7) + 1) % 3
                FROM b0 WHERE draw % 6 = 1
                UNION ALL
                SELECT doc_id + 70000000, 'same_batch_dup', text,
                  (doc_id // 7) % 3
                FROM b0 WHERE draw % 6 = 2),
              f AS (
                SELECT doc_id, source, wave, md5(text) AS h,
                  CASE WHEN NOT (en_sc >= es_sc AND en_sc >= de_sc
                      AND en_sc >= fr_sc AND en_sc >= 1)
                      THEN 'non_english'
                    WHEN NOT (n_tok >= 10 AND n_tok <= 90)
                      THEN 'quality_len'
                    WHEN NOT (sum_tok_len >= n_tok * 3
                      AND sum_tok_len <= n_tok * 10)
                      THEN 'quality_word_len'
                    WHEN NOT (n_stop * 100 >= n_tok)
                      THEN 'quality_stopword'
                    WHEN NOT (n_distinct * 10 >= n_tok * 4)
                      THEN 'quality_repetition'
                    END AS stage0
                FROM (SELECT doc_id, source, text, wave,
                    CAST((length(pd) - length(replace(pd, ' the ', '')))
                      / 5 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' and ', '')))
                      / 5 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' with ', '')))
                      / 6 AS INTEGER) AS en_sc,
                    CAST((length(pd) - length(replace(pd, ' el ', '')))
                      / 4 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' los ', '')))
                      / 5 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' con ', '')))
                      / 5 AS INTEGER) AS es_sc,
                    CAST((length(pd) - length(replace(pd, ' der ', '')))
                      / 5 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' und ', '')))
                      / 5 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' mit ', '')))
                      / 5 AS INTEGER) AS de_sc,
                    CAST((length(pd) - length(replace(pd, ' le ', '')))
                      / 4 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' les ', '')))
                      / 5 AS INTEGER)
                    + CAST((length(pd) - length(replace(pd, ' avec ', '')))
                      / 6 AS INTEGER) AS fr_sc,
                    CAST(len(toks) AS BIGINT) AS n_tok,
                    CAST(list_sum(list_transform(toks, t -> length(t)))
                      AS BIGINT) AS sum_tok_len,
                    CAST(len(list_filter(toks, t -> t IN ('the','a','of',
                      'and','to','in','is','on','for','with')))
                      AS BIGINT) AS n_stop,
                    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                  FROM (SELECT *, concat(' ', lower(text), ' ') AS pd,
                      string_split_regex(lower(text), '\s+') AS toks
                    FROM arr))),
              fp AS (
                SELECT h, min(wave) AS fw
                FROM f WHERE stage0 IS NULL GROUP BY h),
              fk AS (
                SELECT f.h, min(f.doc_id) AS keep_id
                FROM f JOIN fp ON fp.h = f.h AND fp.fw = f.wave
                WHERE f.stage0 IS NULL GROUP BY f.h),
              sel AS (
                SELECT f.wave, f.doc_id, f.source,
                  CASE WHEN f.stage0 IS NOT NULL THEN f.stage0
                    WHEN f.wave > fp.fw THEN 'dup_vs_state'
                    WHEN f.doc_id != fk.keep_id THEN 'dup_in_batch'
                    ELSE 'kept' END AS stage
                FROM f
                LEFT JOIN fp ON fp.h = f.h
                LEFT JOIN fk ON fk.h = f.h)
              SELECT CAST(wave AS BIGINT) AS batch_id, doc_id, source,
                CASE WHEN stage = 'kept' THEN 'keep' ELSE 'drop' END
                  AS verdict,
                stage
              FROM sel ORDER BY doc_id"""))
  )
}
