package graft.queries

import org.apache.spark.sql.functions._

/** Round-9 pack: the composed end-to-end curation pipeline, multi-step
  * BPE training, the trained-vs-untrained ANN recall eval, and the
  * winnow span report — the four VERDICT r7 "next round" rows that
  * remained after round 8. Same conventions as the rest of the suite:
  * integer-exact comparisons, total ordering on a unique key, chained
  * CTEs replaying iterative training (the q107/q110 pattern).
  */
object Pipeline9 {

  private val stopList =
    graft.pipeline.TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** Chained-CTE oracle core shared by q137 (per-step merge records)
    * and q141 (final segmentation): one block per merge step — pair
    * counts via lead(), top-1 pick, greedy application via the
    * gaps-and-islands windows (grp constant within each run of
    * consecutive matches; keep = even offsets), drop consumed
    * positions, renumber. range(64) bounds char positions (max fixture
    * word is 8 chars — the q126 convention). */
  private[queries] def bpeChainSql(nMerges: Int, finalSelect: String): String = {
    val stepBlocks = (1 to nMerges).map { t =>
      val p = t - 1
      s"""pc$t AS (
        SELECT sym || ' ' || nxt AS pr, sum(n) AS c FROM (
          SELECT n, sym, lead(sym) OVER (PARTITION BY wd ORDER BY i) AS nxt
          FROM s$p)
        WHERE nxt IS NOT NULL GROUP BY 1),
      top$t AS (
        SELECT pr, string_split(pr, ' ')[1] AS pa,
          string_split(pr, ' ')[2] AS pb,
          replace(pr, ' ', '') AS ms, c
        FROM pc$t ORDER BY c DESC, pr LIMIT 1),
      m$t AS (
        SELECT s.wd, s.n, s.i, s.sym, t.ms,
          coalesce(s.sym = t.pa AND
            lead(s.sym) OVER (PARTITION BY s.wd ORDER BY s.i) = t.pb,
            FALSE) AS mm
        FROM s$p s CROSS JOIN top$t t),
      g$t AS (
        SELECT *, i - sum(CASE WHEN mm THEN 1 ELSE 0 END)
          OVER (PARTITION BY wd ORDER BY i) AS grp
        FROM m$t),
      k$t AS (
        SELECT *, coalesce(mm AND (i - min(CASE WHEN mm THEN i END)
          OVER (PARTITION BY wd, grp)) % 2 = 0, FALSE) AS keep
        FROM g$t),
      s$t AS (
        SELECT wd, n, row_number() OVER (PARTITION BY wd ORDER BY i) AS i,
          CASE WHEN keep THEN ms ELSE sym END AS sym
        FROM (SELECT *, coalesce(lag(keep) OVER (PARTITION BY wd ORDER BY i),
                FALSE) AS consumed FROM k$t)
        WHERE NOT consumed),
      r$t AS (
        SELECT $t AS step, t.pr AS pair, t.ms AS merged,
          CAST(t.c AS BIGINT) AS cnt,
          (SELECT CAST(count(DISTINCT sym) AS BIGINT) FROM s$t)
            AS vocab_size
        FROM top$t t)"""
    }.mkString(",\n      ")
    s"""WITH wc AS (
        SELECT w AS wd, count(*) AS n FROM (
          SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
          FROM documents)
        WHERE length(w) > 0 GROUP BY w),
      s0 AS (
        SELECT wd, n, i + 1 AS i, substr(wd, CAST(i + 1 AS INT), 1) AS sym
        FROM wc CROSS JOIN range(64) r(i)
        WHERE i < length(wd)),
      $stepBlocks
      $finalSelect"""
  }

  private def bpeTrainSql(nMerges: Int): String = {
    val union = (1 to nMerges).map(t => s"SELECT * FROM r$t")
      .mkString(" UNION ALL ")
    bpeChainSql(nMerges,
      s"""SELECT CAST(step AS BIGINT) AS step, pair, merged, cnt, vocab_size
          FROM ($union) ORDER BY step""")
  }

  private def bpeSegmentSql(nMerges: Int): String =
    bpeChainSql(nMerges,
      s"""SELECT wd, CAST(n AS BIGINT) AS n,
            CAST(count(*) AS BIGINT) AS n_syms,
            string_agg(sym, ' ' ORDER BY i) AS seg
          FROM s$nMerges GROUP BY wd, n ORDER BY wd""")

  /** Shared oracle CTE chain: the q136 fixture derivation through the
    * QUALITY SURVIVORS (`qs`) — batch-pipeline stages 1–4 (snapshot
    * diff → exact dedup → exact n-gram-Jaccard components keep-best →
    * quality gates). q136 continues the chain through decontaminate/
    * sample/pack/shard; q147 reads `qs` directly — the set the
    * incremental curation loop must reproduce. */
  private def q136ChainToQs: String = s"""WITH RECURSIVE olds AS (
                SELECT doc_id AS id, text FROM documents
                WHERE doc_id % 3 = 1 AND doc_id % 10 != 0),
              news0 AS (
                SELECT doc_id AS id,
                  CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                       ELSE text END AS text,
                  source
                FROM documents WHERE doc_id % 10 != 0 AND doc_id % 17 != 3),
              news AS (
                SELECT id, text, source FROM news0
                UNION ALL
                SELECT id + 10000000, text, source FROM news0
                WHERE id % 50 = 7),
              batch AS (
                SELECT n.id, n.text, n.source
                FROM news n LEFT JOIN olds o ON o.id = n.id
                WHERE o.id IS NULL OR md5(o.text) != md5(n.text)),
              exk AS (SELECT min(id) AS id FROM batch GROUP BY md5(text)),
              ex AS (SELECT b.id, b.text, b.source
                     FROM batch b JOIN exk USING (id)),
              t3 AS (
                SELECT id, string_split_regex(lower(text), '\\s+') AS toks
                FROM ex),
              g3 AS (
                SELECT id, list_distinct(list_transform(range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
                FROM t3 WHERE len(toks) >= 3),
              e3 AS (SELECT id, unnest(gs) AS tok FROM g3),
              sz3 AS (SELECT id, len(gs) AS ntok FROM g3),
              inter3 AS (
                SELECT a.id AS a_id, b.id AS b_id, count(*) AS inter
                FROM e3 a JOIN e3 b ON a.tok = b.tok AND a.id < b.id
                GROUP BY 1, 2),
              prs AS (
                SELECT i.a_id, i.b_id FROM inter3 i
                JOIN sz3 sa ON sa.id = i.a_id
                JOIN sz3 sb ON sb.id = i.b_id
                WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
              edges AS (
                SELECT a_id AS src, b_id AS dst FROM prs
                UNION ALL SELECT b_id, a_id FROM prs),
              comp(id, lbl) AS (
                SELECT id, id FROM ex
                UNION
                SELECT edges.dst, comp.lbl
                FROM comp JOIN edges ON edges.src = comp.id),
              cmin AS (SELECT id, min(lbl) AS component FROM comp GROUP BY id),
              surv AS (
                SELECT ex.id, ex.text, ex.source FROM ex
                JOIN cmin ON cmin.id = ex.id AND cmin.component = ex.id),
              tq AS (
                SELECT id, string_split_regex(lower(text), '\\s+') AS toks
                FROM surv),
              qf AS (
                SELECT id,
                  CAST(len(toks) AS BIGINT) AS n_tok,
                  CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS sum_tok_len,
                  CAST(len(list_filter(toks, x -> x IN ($stopList)))
                    AS BIGINT) AS n_stop,
                  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                FROM tq),
              qg AS (
                SELECT id,
                  (n_tok >= 10 AND n_tok <= 90) AS ok_len,
                  (sum_tok_len >= n_tok * 3 AND sum_tok_len <= n_tok * 10)
                    AS ok_wl,
                  (n_stop * 100 >= n_tok) AS ok_stop,
                  (n_distinct * 10 >= n_tok * 4) AS ok_rep
                FROM qf),
              qgr AS (
                SELECT id, nn.n,
                  list_aggregate(toks[i+1 : i+nn.n], 'string_agg', ' ') AS grm
                FROM tq
                CROSS JOIN (VALUES (2), (3)) nn(n)
                CROSS JOIN range(4096) r(i)
                WHERE i + nn.n <= len(toks)),
              qpc AS (
                SELECT id, n, grm, count(*) AS c
                FROM qgr GROUP BY id, n, grm),
              qst AS (
                SELECT id, n, sum(c) AS ng, count(*) AS nd, max(c) AS top
                FROM qpc GROUP BY id, n),
              qw AS (
                SELECT s.id,
                  coalesce(max(CASE WHEN qst.n = 2 THEN qst.ng END), 0) AS n2,
                  coalesce(max(CASE WHEN qst.n = 2 THEN qst.nd END), 0) AS nd2,
                  coalesce(max(CASE WHEN qst.n = 2 THEN qst.top END), 0) AS top2,
                  coalesce(max(CASE WHEN qst.n = 3 THEN qst.ng END), 0) AS n3,
                  coalesce(max(CASE WHEN qst.n = 3 THEN qst.nd END), 0) AS nd3
                FROM surv s LEFT JOIN qst ON s.id = qst.id
                GROUP BY s.id),
              qb AS (
                SELECT id,
                  CASE WHEN n2 > 0
                    THEN CAST(floor((n2 - nd2) * 10000 / n2) AS BIGINT)
                    ELSE 0 END AS dup2_bp,
                  CASE WHEN n2 > 0
                    THEN CAST(floor(top2 * 10000 / n2) AS BIGINT)
                    ELSE 0 END AS top2_bp,
                  CASE WHEN n3 > 0
                    THEN CAST(floor((n3 - nd3) * 10000 / n3) AS BIGINT)
                    ELSE 0 END AS dup3_bp
                FROM qw),
              qs AS (
                SELECT surv.id, surv.text, surv.source
                FROM surv
                JOIN qg USING (id) JOIN qb USING (id)
                WHERE qg.ok_len AND qg.ok_wl AND qg.ok_stop AND qg.ok_rep
                  AND qb.dup2_bp <= 1000 AND qb.top2_bp <= 1500
                  AND qb.dup3_bp <= 100)"""

  /** The q136 run, parameterized on the barrier flavor so the plan-shape
    * spec can pin the RELIABLE-checkpoint path to the same result the
    * gate hashes (VERDICT r9 item 2). Inputs derived from `documents`:
    * old crawl = the %3==1 slice; new crawl = all non-benchmark docs
    * minus %17==3 removals, %11==0 texts mutated, plus %50==7 docs
    * re-crawled as exact-text URL aliases under id+1e7; benchmark =
    * the %10==0 slice's 8-gram shingle set. */
  /** The full q136 oracle: [[q136ChainToQs]] + decontaminate/sample/
    * pack/shard tail — shared by q136 (batch) and q153 (incremental
    * loop + emission; same output contract, same hash). */
  private def q136FullSql: String = s"""$q136ChainToQs,
              tk AS (
                SELECT id, string_split_regex(lower(text), '\\s+') AS toks
                FROM qs),
              shq AS (
                SELECT id, CAST(r.i AS BIGINT) AS s,
                  toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                  toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                  toks[i+6] || ' ' || toks[i+7] AS g
                FROM tk CROSS JOIN range(1, 4096) r(i)
                WHERE i + 7 <= len(toks)),
              bsh AS (
                SELECT bt.toks[i] || ' ' || bt.toks[i+1] || ' ' ||
                  bt.toks[i+2] || ' ' || bt.toks[i+3] || ' ' ||
                  bt.toks[i+4] || ' ' || bt.toks[i+5] || ' ' ||
                  bt.toks[i+6] || ' ' || bt.toks[i+7] AS g
                FROM (SELECT string_split_regex(lower(text), '\\s+') AS toks
                      FROM documents WHERE doc_id % 10 = 0) bt
                CROSS JOIN range(1, 4096) r(i)
                WHERE i + 7 <= len(bt.toks)),
              benchg AS (SELECT DISTINCT g FROM bsh),
              fs AS (SELECT shq.id, shq.s FROM shq JOIN benchg USING (g)),
              fa AS (SELECT id, list(s ORDER BY s) AS ss FROM fs GROUP BY id),
              basek AS (
                SELECT t.id, t.toks, COALESCE(fa.ss, []) AS ss
                FROM tk t LEFT JOIN fa USING (id)),
              keptpos AS (
                SELECT id,
                  list_filter(range(1, len(toks) + 1),
                    p -> len(list_filter(ss, s -> s <= p AND s + 7 >= p)) = 0)
                    AS kp
                FROM basek),
              wgt AS (SELECT id, CAST(len(kp) AS BIGINT) AS w FROM keptpos),
              pri AS (
                SELECT id AS key, w,
                  (w * 4294967296)
                    // (('0x' || substr(md5(CAST(id AS VARCHAR) || ':q136'),
                        1, 8))::BIGINT + 1) AS priority
                FROM wgt),
              samp AS (
                SELECT key, w FROM pri
                ORDER BY priority DESC, key LIMIT 50),
              ss2 AS (
                SELECT s.key, s.w, q.source
                FROM samp s JOIN qs q ON q.id = s.key),
              c2 AS (
                SELECT source, key, w,
                  sum(w) OVER (PARTITION BY source ORDER BY key
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum_tok
                FROM ss2),
              packed AS (
                SELECT source, key, w,
                  CAST(cum_tok AS BIGINT) AS cum_tok,
                  CAST(floor((cum_tok - w) / 256.0) AS BIGINT) AS bin_id
                FROM c2),
              shr AS (
                SELECT key,
                  CAST(row_number() OVER (ORDER BY w DESC, key) AS INT) AS rn
                FROM samp)
              SELECT p.key AS id, p.source, p.w, p.cum_tok, p.bin_id,
                s.rn, CAST((s.rn - 1) % 4 AS INT) AS shard
              FROM packed p JOIN shr s USING (key)
              ORDER BY id"""

  /** The q136 input construction (old crawl, new crawl, benchmark
    * shingle set) — shared by the batch pipeline (q136) and the
    * incremental loop (q147, IncrementalCurationSpec). */
  private[graft] def q136Inputs(s: org.apache.spark.sql.SparkSession, d: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
         org.apache.spark.sql.DataFrame) = {
    val docs = Tables.documents(s, d)
    val oldS = docs.filter(col("doc_id") % 3 === 1 &&
      col("doc_id") % 10 =!= 0)
    val base = docs.filter(col("doc_id") % 10 =!= 0 &&
        col("doc_id") % 17 =!= 3)
      .select(col("doc_id"),
        when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")).as("text"),
        col("source"))
    val newS = base.union(
      base.filter(col("doc_id") % 50 === 7)
        .select((col("doc_id") + 10000000).as("doc_id"),
          col("text"), col("source")))
    val bench = graft.pipeline.TextAnalysis.benchShingleHashSet(
      docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
    (oldS, newS, bench)
  }

  private[graft] def q136Run(s: org.apache.spark.sql.SparkSession, d: String,
      checkpointDir: Option[String]): org.apache.spark.sql.DataFrame = {
    val (oldS, newS, bench) = q136Inputs(s, d)
    graft.pipeline.Curation.curationPipeline(oldS, newS, bench,
      "doc_id", "text", "source",
      jacN = 3, jacTNum = 4, jacTDen = 5,
      dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100,
      decontN = 8, sampleK = 50, salt = "q136",
      packBudget = 256, nShards = 4, checkpointDir = checkpointDir)
      .orderBy(col("id"))
  }

  /** The q147 run: the SAME new crawl, replayed through
    * [[graft.pipeline.Curation.IncrementalCuration]] as `nBatches`
    * id-range micro-batches (id-monotonic, the crawl regime — alias ids
    * at +1e7 land in the last batch, after their base texts). The
    * survivor table must equal the batch pipeline's quality-survivor
    * stage regardless of the batch count. */
  private[graft] def q147Run(s: org.apache.spark.sql.SparkSession, d: String,
      nBatches: Int): org.apache.spark.sql.DataFrame =
    q147Loop(s, d, nBatches).survivors().orderBy(col("id"))

  /** Builds the incremental loop and replays the q136 new crawl through
    * it as `nBatches` id-monotonic micro-batches; q147 reads its
    * survivors, q153 its full emission. */
  private def q147Loop(s: org.apache.spark.sql.SparkSession, d: String,
      nBatches: Int): graft.pipeline.Curation.IncrementalCuration = {
    val (oldS, newS, _) = q136Inputs(s, d)
    val inc = new graft.pipeline.Curation.IncrementalCuration(
      oldS, "doc_id", "text", "source",
      jacN = 3, jacTNum = 4, jacTDen = 5,
      dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100)
    // id-range slices: real ids split into nBatches-1 near-equal ranges
    // (fractions of the max real id, so the slicing works at any SF);
    // alias ids (>= 1e7) arrive in the final batch, after their base
    // texts. max() reads a 1-row agg of the id column.
    val aliasLo = 10000000L
    val maxReal = newS.filter(col("doc_id") < aliasLo)
      .agg(max(col("doc_id"))).head.getLong(0) + 1
    val nReal = nBatches - 1
    val slices = (0 until nReal).map { i =>
      val hi = if (i == nReal - 1) aliasLo else maxReal * (i + 1) / nReal
      (maxReal * i / nReal, hi)
    } :+ ((aliasLo, Long.MaxValue))
    slices.zipWithIndex.foreach { case ((lo, hi), i) =>
      inc.processBatch(
        newS.filter(col("doc_id") >= lo && col("doc_id") < hi), i.toLong)
    }
    inc
  }

  val entries: Seq[QEntry] = Seq(

    // Multi-step BPE training: q126's one-step contract iterated 4
    // times on the symbol-ARRAY representation (string replace is
    // ambiguous once multichar symbols exist — and the Sennrich
    // lookbehind-regex trick is Java-only, RE2 engines can't replay
    // it). Each step's merge DECISION (pair, count) and its
    // APPLICATION (post-merge corpus-wide vocab size) are both pinned,
    // so a wrong greedy overlap at step t would cascade into every
    // later step's counts.
    QEntry("q137_bpe_train",
      (s, d) => graft.pipeline.TextAnalysis.bpeTrain(
        Tables.documents(s, d), "text", nMerges = 4)
        .orderBy(col("step")),
      Some(bpeTrainSql(4))),

    // The ENCODE side of the tokenizer loop: the distinct-word
    // vocabulary segmented by the 4 trained merges — every word's
    // final symbol sequence as a string, so a wrong greedy application
    // anywhere in the chain shows up as a hash mismatch on the word it
    // corrupted (q137 pins the per-step decisions; this pins the full
    // final state). Shared application code with bpeTrain.
    QEntry("q141_bpe_segment",
      (s, d) => graft.pipeline.TextAnalysis.bpeSegment(
        Tables.documents(s, d), "text", nMerges = 4)
        .orderBy(col("wd")),
      Some(bpeSegmentSql(4))),

    // The composed end-to-end curation pipeline as ONE dataflow:
    // snapshotDiff (derived crawls: old = the %3==1 slice, new = all
    // non-benchmark docs minus %17==3 removals, %11==0 texts mutated,
    // plus %50==7 docs re-crawled as exact-text URL aliases under
    // id+1e7, far past every real doc_id so aliases can't collide with
    // the base crawl — added/changed/removed AND exact dups all live)
    // → exact dedup keep-best (q30) → exact n-gram-Jaccard near-dup +
    // components keep-best (q61+q55, 8-9 live pairs) → quality stack
    // (q133 thresholds) → benchmark decontamination (q115, post-edit
    // token count = weight) → priority sample (q111, k=50) →
    // per-source packing (q88, budget 256) → balanced shards (q130,
    // S=4). The oracle replays the ENTIRE chain — every stage's
    // individual oracle composed with its doc set rescoped to the
    // previous stage's survivors.
    QEntry("q136_curation_pipeline",
      (s, d) => q136Run(s, d, checkpointDir = None),
      Some(q136FullSql)),


    // Recall@k over the TRAINED index family — closing the loop q116
    // opened: the SAME eval (intersection with the exact top-5, integer
    // basis points) scored for BOTH the seed-centroid IVF (q47) and the
    // exact-trained-centroid IVF (q108), per query in one row. The
    // oracle replays the exact search, both IVF searches (including the
    // full Lloyd training chain) and both evals — so the index-quality
    // COMPARISON itself is hash-pinned, not just its ingredients.
    QEntry("q138_recall_trained_vs_seed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        // one exact search, checkpointed — it feeds both evals
        val exact = graft.pipeline.Similarity.cosineTopK(queries, emb, 5)
          .localCheckpoint()
        val untrained = graft.pipeline.Similarity.cosineTopKIvf(
          queries, emb, k = 5, nList = 16, nProbe = 4)
        val cent = graft.pipeline.Similarity
          .ivfCentroidsTrainedExact(emb, nList = 16, dim = 64, iters = 1)
        val trained = graft.pipeline.Similarity.cosineTopKIvf(
          queries, emb, k = 5, nList = 16, nProbe = 4,
          centroids = Some(cent))
        val ru = graft.pipeline.Similarity.annRecallAtK(untrained, exact, 5)
          .select(col("q_id"), col("recall_bp").as("untrained_bp"))
        val rt = graft.pipeline.Similarity.annRecallAtK(trained, exact, 5)
          .select(col("q_id"), col("recall_bp").as("trained_bp"))
        ru.join(rt, Seq("q_id")).orderBy(col("q_id"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              escored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       i -> q.qe[i+1]*c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM qz q CROSS JOIN qz c
                WHERE q.vec_id % 100 = 0),
              exactk AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                  FROM escored) WHERE rn <= 5),
              u_cent AS (
                SELECT cs.vec_id AS cid, qz.qe AS cente,
                  CAST(list_sum(list_transform(qz.qe, x -> x*x)) AS BIGINT) AS nc
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16) cs
                JOIN qz ON qz.vec_id = cs.vec_id),
              u_cfit AS (
                SELECT qz.vec_id, u_cent.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       i -> qz.qe[i+1]*u_cent.cente[i+1])) AS BIGINT)
                    / sqrt(u_cent.nc) AS cscore
                FROM qz CROSS JOIN u_cent),
              u_assigned AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS arn
                  FROM u_cfit) WHERE arn = 1),
              u_probes AS (
                SELECT vec_id AS q_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS prn
                  FROM u_cfit WHERE vec_id % 100 = 0) WHERE prn <= 4),
              u_scored AS (
                SELECT p.q_id, a.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       i -> q.qe[i+1]*c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM u_probes p
                JOIN u_assigned a ON a.cluster = p.cluster
                JOIN qz q ON q.vec_id = p.q_id
                JOIN qz c ON c.vec_id = a.vec_id),
              u_annk AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                  FROM u_scored) WHERE rn <= 5),
              seeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
              cb0 AS (
                SELECT seeds.cid, qz.qe AS cv FROM seeds JOIN qz USING (vec_id)),
              tdots AS (
                SELECT qz.vec_id, cb0.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1] * cb0.cv[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb0.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM qz CROSS JOIN cb0),
              tassign AS (
                SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM tdots) WHERE arn = 1),
              tmeans AS (
                SELECT a.cid, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor((2*sum(qz.qe[t.i+1]) + count(*))
                       / (2.0*count(*))) AS BIGINT) AS mv
                FROM tassign a
                JOIN qz ON qz.vec_id = a.vec_id
                CROSS JOIN range(64) t(i)
                GROUP BY a.cid, t.i),
              seedc AS (
                SELECT cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM cb0 CROSS JOIN range(64) t(i)),
              tcent AS (
                SELECT sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cente
                FROM seedc sc
                LEFT JOIN tmeans m ON m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.cid),
              tcentn AS (
                SELECT cid, cente,
                  CAST(list_sum(list_transform(cente, x -> x*x)) AS BIGINT) AS nc
                FROM tcent),
              t_cfit AS (
                SELECT qz.vec_id, tcentn.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1]*tcentn.cente[j+1])) AS BIGINT)
                    / sqrt(tcentn.nc) AS cscore
                FROM qz CROSS JOIN tcentn),
              t_assigned AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS arn
                  FROM t_cfit) WHERE arn = 1),
              t_probes AS (
                SELECT vec_id AS q_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS prn
                  FROM t_cfit WHERE vec_id % 100 = 0) WHERE prn <= 4),
              t_scored AS (
                SELECT p.q_id, a.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       j -> q.qe[j+1]*c.qe[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM t_probes p
                JOIN t_assigned a ON a.cluster = p.cluster
                JOIN qz q ON q.vec_id = p.q_id
                JOIN qz c ON c.vec_id = a.vec_id),
              t_annk AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                  FROM t_scored) WHERE rn <= 5),
              u_hits AS (
                SELECT q_id, count(*) AS n_hits
                FROM u_annk JOIN exactk USING (q_id, vec_id) GROUP BY q_id),
              t_hits AS (
                SELECT q_id, count(*) AS n_hits
                FROM t_annk JOIN exactk USING (q_id, vec_id) GROUP BY q_id)
              SELECT e.q_id,
                coalesce(u.n_hits, 0) * 10000 // 5 AS untrained_bp,
                coalesce(t.n_hits, 0) * 10000 // 5 AS trained_bp
              FROM (SELECT DISTINCT q_id FROM exactk) e
              LEFT JOIN u_hits u USING (q_id)
              LEFT JOIN t_hits t USING (q_id)
              ORDER BY e.q_id""")),

    // The benchmark-side leak report — q84's audit flipped to the view
    // an EVAL owner reads: per benchmark doc, how many corpus docs
    // share an 8-gram with it and the total hit count; zero rows kept
    // (a clean eval item is the result you want to see). Hashed-long
    // join in Spark, raw-string join in the oracle (the q84
    // losslessness convention).
    QEntry("q146_bench_leak_report",
      (s, d) => graft.pipeline.TextAnalysis.benchLeakReport(
        Tables.documents(s, d), "doc_id", "text",
        isBench = col("doc_id") % 10 === 0, n = 8)
        .orderBy(col("bench_id")),
      Some("""WITH sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, len(toks) - 6),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                       toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                       toks[i+6] || ' ' || toks[i+7]))) AS g
                FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                      FROM documents)
                WHERE len(toks) >= 8),
              bench AS (SELECT doc_id AS bench_id, g FROM sh WHERE doc_id % 10 = 0),
              corp AS (SELECT doc_id, g FROM sh WHERE doc_id % 10 <> 0),
              hits AS (
                SELECT b.bench_id,
                  count(DISTINCT c.doc_id) AS n_corpus_docs,
                  count(*) AS n_hits
                FROM corp c JOIN bench b USING (g)
                GROUP BY b.bench_id)
              SELECT d.doc_id AS bench_id,
                CAST(coalesce(h.n_corpus_docs, 0) AS BIGINT) AS n_corpus_docs,
                CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
              FROM documents d LEFT JOIN hits h ON h.bench_id = d.doc_id
              WHERE d.doc_id % 10 = 0
              ORDER BY bench_id""")),

    // Dedup-index quality eval — the near-dup analogue of the q116/q138
    // ANN recall rows: does the banded MinHash index (q37's md5 twin,
    // 16 perms / 4 bands over word-3-gram sets) find every pair the
    // EXACT PPJoin (q61's 3-gram Jaccard at 4/5) proves exists? BOTH
    // arms measure the SAME similarity — candidates are verified
    // against the 3-gram sets the signature indexes (the theoretical
    // band-collision probability at J=0.8 with r=4,b=4 is ~87%, so a
    // fixture recall far below that would flag a broken signature).
    // One summary row: pair counts, the verified-LSH ⊆ exact subset
    // check, and recall in integer basis points. The oracle
    // brute-forces the 3-gram overlap frame once and derives BOTH arms
    // from it (ground truth by definition; candidate verification by
    // restriction).
    QEntry("q145_dedup_recall",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val grams3 = docs.select(col("doc_id"),
          graft.expressions.functions.ngram_shingles(
            split(lower(col("text")), "\\s+"), 3, distinct = true)
            .as("toks"))
        val lsh = graft.pipeline.Dedup.verifyJaccard(
            Pipeline.minhashCandidatesMd5(s, d), grams3, 0.0)
          .filter(col("inter") * 5 >= col("uni") * 4)
          .select(col("a_id"), col("b_id")).localCheckpoint()
        // collapseExact = false: this is a pair-set RECALL comparison
        // (LSH candidates vs the exact join), so both sides must speak
        // raw pairs — the collapsed contract's rep edges would need
        // expansion before they compare.
        val exact = graft.pipeline.Dedup.ngramJaccardPairs(
            docs, "doc_id", "text", n = 3, tNum = 4, tDen = 5,
            collapseExact = false)
          .select(col("a_id"), col("b_id")).localCheckpoint()
        val nL = lsh.agg(count(lit(1)).as("n_lsh"))
        val nE = exact.agg(count(lit(1)).as("n_exact"))
        val nC = lsh.join(exact, Seq("a_id", "b_id"))
          .agg(count(lit(1)).as("n_common"))
        nE.crossJoin(nL).crossJoin(nC)
          .select(col("n_exact"), col("n_lsh"), col("n_common"),
            when(col("n_exact") > 0,
              floor(col("n_common") * 10000 / col("n_exact")).cast("long"))
              .otherwise(10000L).as("recall_bp"),
            (col("n_common") === col("n_lsh")).as("lsh_subset_ok"))
      },
      Some {
        val P = 4294967311L
        val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
        }.mkString("[", ",\n                  ", "]")
        s"""WITH t AS (
              SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
              FROM documents),
            sh AS (
              SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                i -> array_to_string(toks[i:i+2], ' '))) AS shingles
              FROM t),
            h AS (
              SELECT doc_id, list_transform(shingles,
                s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM sh WHERE len(shingles) > 0),
            sig AS (
              SELECT doc_id, $sigList AS sig
              FROM h),
            bands AS (
              SELECT doc_id, band,
                array_to_string(list_transform(sig[band*4+1:band*4+4],
                  x -> CAST(x AS VARCHAR)), ',') AS bkey
              FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
            ok AS (
              SELECT band, bkey FROM bands
              GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
            cand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM bands a
              JOIN bands b ON b.band = a.band AND b.bkey = a.bkey
                          AND b.doc_id > a.doc_id
              JOIN ok ON ok.band = a.band AND ok.bkey = a.bkey),
            e3 AS (
              SELECT doc_id, unnest(shingles) AS tok FROM sh
              WHERE len(shingles) > 0),
            sizes AS (SELECT doc_id, count(*) AS ntok FROM e3 GROUP BY doc_id),
            binter AS (
              SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
              FROM e3 a JOIN e3 b ON a.tok = b.tok AND a.doc_id < b.doc_id
              GROUP BY 1, 2),
            exactp AS (
              SELECT i.a_id, i.b_id FROM binter i
              JOIN sizes sa ON sa.doc_id = i.a_id
              JOIN sizes sb ON sb.doc_id = i.b_id
              WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
            lshp AS (
              SELECT c.a_id, c.b_id FROM cand c
              JOIN binter i ON i.a_id = c.a_id AND i.b_id = c.b_id
              JOIN sizes sa ON sa.doc_id = c.a_id
              JOIN sizes sb ON sb.doc_id = c.b_id
              WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
            cm AS (
              SELECT count(*) AS n_common
              FROM lshp JOIN exactp USING (a_id, b_id))
            SELECT
              CAST((SELECT count(*) FROM exactp) AS BIGINT) AS n_exact,
              CAST((SELECT count(*) FROM lshp) AS BIGINT) AS n_lsh,
              CAST(cm.n_common AS BIGINT) AS n_common,
              CASE WHEN (SELECT count(*) FROM exactp) > 0
                THEN cm.n_common * 10000 // (SELECT count(*) FROM exactp)
                ELSE 10000 END AS recall_bp,
              cm.n_common = (SELECT count(*) FROM lshp) AS lsh_subset_ok
            FROM cm"""
      }),

    // The streaming ingest pre-filter as one projection: composed
    // quality decision (q133) + language-ID (q33) + PII scrub (q129)
    // in a single zero-shuffle pass over the q129 PII-augmented corpus
    // — the stage a pipeline runs INSIDE the ingestion stream before
    // anything corpus-wide. Streaming == batch is spec-pinned; this
    // row hash-anchors the batch twin.
    QEntry("q144_stream_ingest",
      (s, d) => {
        val aug = Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" u"), col("doc_id"),
              lit("@ex.com 555-123-4567 999-88-7777")))
            .otherwise(col("text")).as("text"))
        graft.pipeline.Curation.streamIngest(aug, "doc_id", "text",
          dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100)
          .orderBy(col("doc_id"))
      },
      Some {
        def occ(m: String) =
          s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INTEGER)"
        val en = s"${occ(" the ")} + ${occ(" and ")} + ${occ(" with ")}"
        val es = s"${occ(" el ")} + ${occ(" los ")} + ${occ(" con ")}"
        val de = s"${occ(" der ")} + ${occ(" und ")} + ${occ(" mit ")}"
        val fr = s"${occ(" le ")} + ${occ(" les ")} + ${occ(" avec ")}"
        s"""WITH aug AS (
                SELECT doc_id, CASE WHEN doc_id % 5 = 0
                  THEN text || ' u' || CAST(doc_id AS VARCHAR) ||
                       '@ex.com 555-123-4567 999-88-7777'
                  ELSE text END AS text
                FROM documents),
              t AS (
                SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                FROM aug),
              f AS (
                SELECT doc_id,
                  CAST(len(toks) AS BIGINT) AS n_tok,
                  CAST(list_sum(list_transform(toks, x -> length(x)))
                    AS BIGINT) AS sum_tok_len,
                  CAST(len(list_filter(toks, x -> x IN ($stopList)))
                    AS BIGINT) AS n_stop,
                  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                FROM t),
              g AS (
                SELECT doc_id,
                  (n_tok >= 10 AND n_tok <= 90) AS ok_len,
                  (sum_tok_len >= n_tok * 3 AND sum_tok_len <= n_tok * 10)
                    AS ok_wl,
                  (n_stop * 100 >= n_tok) AS ok_stop,
                  (n_distinct * 10 >= n_tok * 4) AS ok_rep
                FROM f),
              gr AS (
                SELECT doc_id, nn.n,
                  list_aggregate(toks[i+1 : i+nn.n], 'string_agg', ' ') AS grm
                FROM t
                CROSS JOIN (VALUES (2), (3)) nn(n)
                CROSS JOIN range(4096) r(i)
                WHERE i + nn.n <= len(toks)),
              pc AS (
                SELECT doc_id, n, grm, count(*) AS c
                FROM gr GROUP BY doc_id, n, grm),
              st AS (
                SELECT doc_id, n, sum(c) AS ng, count(*) AS nd, max(c) AS top
                FROM pc GROUP BY doc_id, n),
              w AS (
                SELECT d.doc_id,
                  coalesce(max(CASE WHEN st.n = 2 THEN st.ng END), 0) AS n2,
                  coalesce(max(CASE WHEN st.n = 2 THEN st.nd END), 0) AS nd2,
                  coalesce(max(CASE WHEN st.n = 2 THEN st.top END), 0) AS top2,
                  coalesce(max(CASE WHEN st.n = 3 THEN st.ng END), 0) AS n3,
                  coalesce(max(CASE WHEN st.n = 3 THEN st.nd END), 0) AS nd3
                FROM aug d LEFT JOIN st ON d.doc_id = st.doc_id
                GROUP BY d.doc_id),
              b AS (
                SELECT doc_id,
                  CASE WHEN n2 > 0
                    THEN CAST(floor((n2 - nd2) * 10000 / n2) AS BIGINT)
                    ELSE 0 END AS dup2_bp,
                  CASE WHEN n2 > 0
                    THEN CAST(floor(top2 * 10000 / n2) AS BIGINT)
                    ELSE 0 END AS top2_bp,
                  CASE WHEN n3 > 0
                    THEN CAST(floor((n3 - nd3) * 10000 / n3) AS BIGINT)
                    ELSE 0 END AS dup3_bp
                FROM w),
              lang AS (
                SELECT doc_id,
                  CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
                       WHEN $es >= $de AND $es >= $fr THEN 'es'
                       WHEN $de >= $fr THEN 'de'
                       ELSE 'fr' END AS pred_lang
                FROM (SELECT doc_id, concat(' ', lower(text), ' ') AS p
                      FROM aug)),
              pii AS (
                SELECT doc_id,
                  CAST(len(regexp_extract_all(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))
                    AS BIGINT) AS n_emails,
                  CAST(len(regexp_extract_all(text,
                    '\\b\\d{3}-\\d{2}-\\d{4}\\b')) AS BIGINT) AS n_ids,
                  CAST(len(regexp_extract_all(text,
                    '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b')) AS BIGINT) AS n_phones,
                  regexp_replace(regexp_replace(regexp_replace(text,
                    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                    '<EMAIL>', 'g'),
                    '\\b\\d{3}-\\d{2}-\\d{4}\\b', '<ID>', 'g'),
                    '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b', '<PHONE>', 'g')
                    AS redacted
                FROM aug)
              SELECT b.doc_id, lang.pred_lang,
                b.dup2_bp, b.top2_bp, b.dup3_bp,
                (g.ok_len AND g.ok_wl AND g.ok_stop AND g.ok_rep
                  AND b.dup2_bp <= 1000 AND b.top2_bp <= 1500
                  AND b.dup3_bp <= 100) AS keep,
                CASE WHEN NOT g.ok_len THEN 'len'
                     WHEN NOT g.ok_wl THEN 'word_len'
                     WHEN NOT g.ok_stop THEN 'stopword'
                     WHEN NOT g.ok_rep THEN 'repetition'
                     WHEN b.dup2_bp > 1000 THEN 'dup_2gram'
                     WHEN b.top2_bp > 1500 THEN 'top_2gram'
                     WHEN b.dup3_bp > 100 THEN 'dup_3gram'
                     ELSE '' END AS reason,
                pii.n_emails, pii.n_ids, pii.n_phones, pii.redacted
              FROM b JOIN g USING (doc_id)
              JOIN lang USING (doc_id) JOIN pii USING (doc_id)
              ORDER BY b.doc_id"""
      }),

    // CCNet perplexity-tercile filtering, composed from two pinned
    // operators: the q117 Stupid-Backoff mean log-prob scores the
    // held-out split, then q114's per-source percentile rank buckets
    // head/middle/tail at 6667/3333 bp. The oracle replays the whole
    // LM chain (counts, all three backoff branches, rollup), the
    // source join, the window rank and the bucket CASE.
    QEntry("q142_lm_quality_buckets",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val scored = graft.pipeline.Retrieval.stupidBackoffScore(
            docs.filter(col("doc_id") % 10 === 0),
            docs.filter(col("doc_id") % 10 =!= 0), "doc_id", "text")
          .select(col("doc_id"), col("mean_sb_micro").as("score"))
        graft.pipeline.Curation.lmQualityBuckets(scored,
          docs.select(col("doc_id"), col("source")),
          headBp = 6667, midBp = 3333)
          .orderBy(col("doc_id"))
      },
      Some("""WITH tt AS (
                SELECT string_split_regex(lower(text), '\s+') AS toks
                FROM documents WHERE doc_id % 10 <> 0),
              tu AS (SELECT unnest(toks) AS term FROM tt),
              uc AS (SELECT term, count(*) AS c1 FROM tu GROUP BY term),
              n AS (SELECT sum(c1) AS n_toks FROM uc),
              tb AS (
                SELECT toks[i] AS prev, toks[i+1] AS cur
                FROM tt CROSS JOIN range(1, 4096) r(i)
                WHERE i + 1 <= len(toks)),
              bc AS (SELECT prev, cur, count(*) AS c2 FROM tb GROUP BY prev, cur),
              hit AS (
                SELECT bc.prev, bc.cur,
                  CAST(round(ln(CAST(bc.c2 AS DOUBLE) / uc.c1) * 1000000.0)
                    AS BIGINT) AS s_hit
                FROM bc JOIN uc ON uc.term = bc.prev),
              back AS (
                SELECT uc.term AS cur,
                  CAST(round(ln(0.4 * uc.c1 / n.n_toks) * 1000000.0)
                    AS BIGINT) AS s_back
                FROM uc CROSS JOIN n),
              te AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents WHERE doc_id % 10 = 0),
              eb AS (
                SELECT doc_id, toks[i] AS prev, toks[i+1] AS cur
                FROM te CROSS JOIN range(1, 4096) r(i)
                WHERE i + 1 <= len(toks)),
              epc AS (
                SELECT doc_id, prev, cur, count(*) AS tf2
                FROM eb GROUP BY doc_id, prev, cur),
              sp AS (
                SELECT e.doc_id, e.tf2,
                  COALESCE(h.s_hit, b.s_back,
                    CAST(round(ln(0.4 * 1 / n.n_toks) * 1000000.0) AS BIGINT))
                    AS s
                FROM epc e
                LEFT JOIN hit h ON h.prev = e.prev AND h.cur = e.cur
                LEFT JOIN back b ON b.cur = e.cur
                CROSS JOIN n),
              agg AS (
                SELECT doc_id, sum(tf2) AS n_scored, sum(tf2 * s) AS sb
                FROM sp GROUP BY doc_id),
              sc AS (
                SELECT d.doc_id,
                  CASE WHEN coalesce(a.n_scored, 0) > 0
                    THEN CAST(floor(a.sb / a.n_scored) AS BIGINT)
                    ELSE 0 END AS score
                FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
                LEFT JOIN agg a USING (doc_id)),
              j AS (
                SELECT sc.doc_id, sc.score, doc.source
                FROM sc JOIN documents doc USING (doc_id)),
              r AS (
                SELECT source, doc_id, score,
                  row_number() OVER (PARTITION BY source
                    ORDER BY score, doc_id) AS rk,
                  count(*) OVER (PARTITION BY source) AS n_grp
                FROM j),
              p AS (
                SELECT source, doc_id, score,
                  CASE WHEN n_grp > 1
                    THEN CAST(floor((rk - 1) * 10000 / (n_grp - 1)) AS BIGINT)
                    ELSE 0 END AS pct_bp
                FROM r)
              SELECT source, doc_id, score, pct_bp,
                CASE WHEN pct_bp >= 6667 THEN 'head'
                     WHEN pct_bp >= 3333 THEN 'middle'
                     ELSE 'tail' END AS bucket
              FROM p ORDER BY doc_id""")),

    // The last cell of the index-eval matrix (q116: seed IVF; q138:
    // seed vs trained IVF): recall@k of the TRAINED IVF (q108 config,
    // nList=16/nProbe=4) against the TRAINED IVFADC (q110 config,
    // nList=4/m=4/ksub=4/nProbe=2) — the residual-quantization
    // fidelity cost of the ADC index as shipped, per query,
    // hash-pinned. Configurations differ deliberately: these are the
    // two trained indexes exactly as their gate rows run them. The
    // oracle replays the exact search, the full-vector Lloyd IVF
    // chain, the complete IVFADC chain (coarse assign → residuals →
    // codebook seed → Lloyd → re-encode → probes → ADC scores) and
    // both evals.
    QEntry("q140_recall_ivf_vs_adc",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        val exact = graft.pipeline.Similarity.cosineTopK(queries, emb, 5)
          .localCheckpoint()
        val cent = graft.pipeline.Similarity
          .ivfCentroidsTrainedExact(emb, nList = 16, dim = 64, iters = 1)
        val ivf = graft.pipeline.Similarity.cosineTopKIvf(
          queries, emb, k = 5, nList = 16, nProbe = 4,
          centroids = Some(cent))
        val adc = graft.pipeline.Similarity.ivfPqTopKDot(queries, emb,
          nList = 4, m = 4, ksub = 4, dim = 64, k = 5, nProbe = 2,
          trainIters = 1)
        val ri = graft.pipeline.Similarity.annRecallAtK(ivf, exact, 5)
          .select(col("q_id"), col("recall_bp").as("ivf_bp"))
        val ra = graft.pipeline.Similarity.annRecallAtK(adc, exact, 5)
          .select(col("q_id"), col("recall_bp").as("adc_bp"))
        ri.join(ra, Seq("q_id")).orderBy(col("q_id"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              escored AS (
                SELECT q.vec_id AS q_id, c.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       i -> q.qe[i+1]*c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM qz q CROSS JOIN qz c
                WHERE q.vec_id % 100 = 0),
              exactk AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                  FROM escored) WHERE rn <= 5),
              seeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
              fcb0 AS (
                SELECT seeds.cid, qz.qe AS cv FROM seeds JOIN qz USING (vec_id)),
              ftdots AS (
                SELECT qz.vec_id, fcb0.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1] * fcb0.cv[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(fcb0.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM qz CROSS JOIN fcb0),
              ftassign AS (
                SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM ftdots) WHERE arn = 1),
              ftmeans AS (
                SELECT a.cid, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor((2*sum(qz.qe[t.i+1]) + count(*))
                       / (2.0*count(*))) AS BIGINT) AS mv
                FROM ftassign a
                JOIN qz ON qz.vec_id = a.vec_id
                CROSS JOIN range(64) t(i)
                GROUP BY a.cid, t.i),
              fseedc AS (
                SELECT cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM fcb0 CROSS JOIN range(64) t(i)),
              tcent AS (
                SELECT sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cente
                FROM fseedc sc
                LEFT JOIN ftmeans m ON m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.cid),
              tcentn AS (
                SELECT cid, cente,
                  CAST(list_sum(list_transform(cente, x -> x*x)) AS BIGINT) AS nc
                FROM tcent),
              f_cfit AS (
                SELECT qz.vec_id, tcentn.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1]*tcentn.cente[j+1])) AS BIGINT)
                    / sqrt(tcentn.nc) AS cscore
                FROM qz CROSS JOIN tcentn),
              f_assigned AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS arn
                  FROM f_cfit) WHERE arn = 1),
              f_probes AS (
                SELECT vec_id AS q_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS prn
                  FROM f_cfit WHERE vec_id % 100 = 0) WHERE prn <= 4),
              f_scored AS (
                SELECT p.q_id, a.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       j -> q.qe[j+1]*c.qe[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM f_probes p
                JOIN f_assigned a ON a.cluster = p.cluster
                JOIN qz q ON q.vec_id = p.q_id
                JOIN qz c ON c.vec_id = a.vec_id),
              f_annk AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                  FROM f_scored) WHERE rn <= 5),
              cseeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
              cent AS (
                SELECT cs.cid, qz.qe AS cente FROM cseeds cs JOIN qz USING (vec_id)),
              afit AS (
                SELECT qz.vec_id, cent.cid,
                  CAST(2*list_sum(list_transform(range(len(qz.qe)),
                         i -> qz.qe[i+1]*cent.cente[i+1]))
                     - list_sum(list_transform(cent.cente, x -> x*x)) AS BIGINT) AS fit
                FROM qz CROSS JOIN cent),
              assign AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id ORDER BY fit DESC, cid) AS arn
                  FROM afit) WHERE arn = 1),
              resid AS (
                SELECT a.vec_id, a.cluster,
                  list_transform(range(len(qz.qe)),
                    i -> qz.qe[i+1] - cent.cente[i+1]) AS re
                FROM assign a
                JOIN qz ON qz.vec_id = a.vec_id
                JOIN cent ON cent.cid = a.cluster),
              sub AS (
                SELECT vec_id, cluster, sg.s, re[sg.s*16+1 : sg.s*16+16] AS sv
                FROM resid CROSS JOIN (SELECT unnest([0,1,2,3]) AS s) sg),
              pseeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4 OFFSET 4)),
              cb0 AS (
                SELECT sub.s, pseeds.cid, sub.sv AS cv
                FROM sub JOIN pseeds USING (vec_id)),
              tdots0 AS (
                SELECT sub.vec_id, sub.s, cb0.cid,
                  CAST(list_sum(list_transform(range(len(sub.sv)),
                       j -> sub.sv[j+1] * cb0.cv[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb0.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM sub JOIN cb0 ON sub.s = cb0.s),
              tassign0 AS (
                SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM tdots0) WHERE arn = 1),
              tmeans0 AS (
                SELECT a.s, a.cid, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor((2*sum(sub.sv[t.i+1]) + count(*))
                       / (2.0*count(*))) AS BIGINT) AS mv
                FROM tassign0 a
                JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s
                CROSS JOIN range(16) t(i)
                GROUP BY a.s, a.cid, t.i),
              tseedc0 AS (
                SELECT s, cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM cb0 CROSS JOIN range(16) t(i)),
              cb1 AS (
                SELECT sc.s, sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cv
                FROM tseedc0 sc
                LEFT JOIN tmeans0 m
                  ON m.s = sc.s AND m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.s, sc.cid),
              cb AS (SELECT s, cid, cv FROM cb1),
              dots AS (
                SELECT sub.vec_id, sub.s, cb.cid,
                  CAST(list_sum(list_transform(range(len(sub.sv)),
                       i -> sub.sv[i+1] * cb.cv[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM sub JOIN cb ON sub.s = cb.s),
              codes AS (
                SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM dots) WHERE arn = 1),
              qfit AS (
                SELECT qz.vec_id AS q_id, cent.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       i -> qz.qe[i+1]*cent.cente[i+1])) AS BIGINT) AS qcdot,
                  CAST(list_sum(list_transform(cent.cente, x -> x*x)) AS BIGINT) AS ncc
                FROM qz CROSS JOIN cent WHERE qz.vec_id % 100 = 0),
              probes AS (
                SELECT q_id, cid AS cluster, qcdot FROM (
                  SELECT q_id, cid, qcdot,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY 2*qcdot - ncc DESC, cid) AS prn
                  FROM qfit) WHERE prn <= 2),
              qsub AS (
                SELECT vec_id AS q_id, sg.s, qe[sg.s*16+1 : sg.s*16+16] AS sv
                FROM qz CROSS JOIN (SELECT unnest([0,1,2,3]) AS s) sg
                WHERE vec_id % 100 = 0),
              qdots AS (
                SELECT qsub.q_id, qsub.s, cb.cid,
                  CAST(list_sum(list_transform(range(len(qsub.sv)),
                       i -> qsub.sv[i+1] * cb.cv[i+1])) AS BIGINT) AS qdot
                FROM qsub JOIN cb ON qsub.s = cb.s),
              scores AS (
                SELECT p.q_id, c.vec_id,
                  CAST(p.qcdot + sum(qd.qdot) AS BIGINT) AS score
                FROM probes p
                JOIN assign a ON a.cluster = p.cluster
                JOIN codes c ON c.vec_id = a.vec_id
                JOIN qdots qd ON qd.q_id = p.q_id AND qd.s = c.s AND qd.cid = c.cid
                GROUP BY p.q_id, c.vec_id, p.qcdot),
              a_annk AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY score DESC, vec_id) AS rn
                  FROM scores) WHERE rn <= 5),
              i_hits AS (
                SELECT q_id, count(*) AS n_hits
                FROM f_annk JOIN exactk USING (q_id, vec_id) GROUP BY q_id),
              a_hits AS (
                SELECT q_id, count(*) AS n_hits
                FROM a_annk JOIN exactk USING (q_id, vec_id) GROUP BY q_id)
              SELECT e.q_id,
                coalesce(i.n_hits, 0) * 10000 // 5 AS ivf_bp,
                coalesce(a.n_hits, 0) * 10000 // 5 AS adc_bp
              FROM (SELECT DISTINCT q_id FROM exactk) e
              LEFT JOIN i_hits i USING (q_id)
              LEFT JOIN a_hits a USING (q_id)
              ORDER BY e.q_id""")),

    // MOSS similarity percentage: shared winnowed fingerprints over the
    // SMALLER side's surviving fingerprint set, integer basis points —
    // the normalized containment score the MOSS UI ranks by. n_fp
    // counts post-boilerplate-drop fingerprints on each side (df<=10),
    // replayed by the oracle's per-doc counts over the same keep set.
    QEntry("q143_winnow_similarity",
      (s, d) => graft.pipeline.TextAnalysis.winnowSimilarity(
        Tables.documents(s, d), "doc_id", "text",
        k = 8, w = 16, minShared = 2, maxDf = 10)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH pos AS (
                SELECT doc_id, text,
                  unnest(generate_series(1, greatest(length(text) - 7, 1)))
                    AS i
                FROM documents),
              h AS (
                SELECT doc_id, i,
                  md5(substr(text, CAST(i AS INT), 8)) AS hv,
                  greatest(length(text) - 7, 1) AS nh
                FROM pos),
              wmin AS (
                SELECT doc_id, i, nh,
                  min(hv) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
                FROM h),
              fps AS (
                SELECT DISTINCT doc_id, fp
                FROM wmin WHERE i <= greatest(nh - 15, 1)),
              dfreq AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10),
              keep AS (SELECT fps.doc_id, fps.fp FROM fps JOIN dfreq USING (fp)),
              nfp AS (SELECT doc_id, count(*) AS n_fp FROM keep GROUP BY doc_id),
              prs AS (
                SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(count(*) AS BIGINT) AS n_shared
                FROM keep a JOIN keep b
                  ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY a.doc_id, b.doc_id
                HAVING count(*) >= 2)
              SELECT p.doc_a, p.doc_b, p.n_shared,
                CAST(na.n_fp AS BIGINT) AS n_fp_a,
                CAST(nb.n_fp AS BIGINT) AS n_fp_b,
                p.n_shared * 10000 // least(na.n_fp, nb.n_fp) AS sim_bp
              FROM prs p
              JOIN nfp na ON na.doc_id = p.doc_a
              JOIN nfp nb ON nb.doc_id = p.doc_b
              ORDER BY p.doc_a, p.doc_b""")),

    // MOSS overlap report WITH matched-region evidence — the q135 pair
    // report extended with the first/last shared-fingerprint window
    // start on each side (what MOSS actually displays per pair). The
    // positional frame comes from the fused winnow_spans scan; the
    // oracle rebuilds per-(doc, fp) min/max window positions from the
    // same ROWS-following window mins as q134/q135 and aggregates them
    // through the identical df<=10 boilerplate filter and pair join.
    QEntry("q139_winnow_span_pairs",
      (s, d) => graft.pipeline.TextAnalysis.winnowSpanPairs(
        Tables.documents(s, d), "doc_id", "text",
        k = 8, w = 16, minShared = 2, maxDf = 10)
        .orderBy(col("doc_a"), col("doc_b")),
      Some("""WITH pos AS (
                SELECT doc_id, text,
                  unnest(generate_series(1, greatest(length(text) - 7, 1)))
                    AS i
                FROM documents),
              h AS (
                SELECT doc_id, i,
                  md5(substr(text, CAST(i AS INT), 8)) AS hv,
                  greatest(length(text) - 7, 1) AS nh
                FROM pos),
              wmin AS (
                SELECT doc_id, i, nh,
                  min(hv) OVER (PARTITION BY doc_id ORDER BY i
                    ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS fp
                FROM h),
              fps AS (
                SELECT doc_id, fp,
                  CAST(min(i) AS INT) AS lo, CAST(max(i) AS INT) AS hi
                FROM wmin WHERE i <= greatest(nh - 15, 1)
                GROUP BY doc_id, fp),
              dfreq AS (
                SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 10),
              keep AS (
                SELECT fps.doc_id, fps.fp, fps.lo, fps.hi
                FROM fps JOIN dfreq USING (fp))
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(count(*) AS BIGINT) AS n_shared,
                CAST(min(a.lo) AS INT) AS a_first,
                CAST(max(a.hi) AS INT) AS a_last,
                CAST(min(b.lo) AS INT) AS b_first,
                CAST(max(b.hi) AS INT) AS b_last
              FROM keep a JOIN keep b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
              HAVING count(*) >= 2
              ORDER BY doc_a, doc_b""")),

    // The incremental curation loop (VERDICT r9 item 3): the q136 new
    // crawl replayed as three id-monotonic micro-batches through
    // IncrementalCuration (ingest pre-filter → streamIngest quality
    // flags → incremental exact dedup → incremental exact gram-posting
    // near-dup pairs), survivors derived from components + quality at
    // read time. The oracle is the BATCH pipeline's quality-survivor
    // stage — the q136 chain truncated at `qs` — so the gate pins
    // incremental == batch, not just "some rows".
    QEntry("q147_incremental_curation",
      (s, d) => q147Run(s, d, nBatches = 3),
      Some(s"""$q136ChainToQs
              SELECT id, source FROM qs ORDER BY id""")),

    // The sf≈1 replica lesson operationalized (BASELINE.md §"sf≈1 scale
    // point"): q60's LSH pair cost is Σ bucket², quadratic in
    // exact-duplicate density. q152 plants two duplicate groups (the
    // %7==3 slice copied at +1e7, the %13==5 slice at +2e7) and runs
    // the dup-collapsed operator: distinct quantized vectors collapse
    // to min-id reps (the q30 move in vector space), LSH runs over reps
    // only, and the output is the compact dup-membership ∪ rep-pair
    // edge set. The oracle rebuilds collapse, buckets, candidates and
    // scores bit-for-bit.
    QEntry("q152_vector_dedup_lsh",
      (s, d) => {
        val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val planted = emb
          .union(emb.filter(col("vec_id") % 7 === 3)
            .select((col("vec_id") + 10000000).as("vec_id"), col("embedding")))
          .union(emb.filter(col("vec_id") % 13 === 5)
            .select((col("vec_id") + 20000000).as("vec_id"), col("embedding")))
        graft.pipeline.Similarity.cosineNearDupPairsDeduped(
          planted, dim = 64, nBits = 4, threshold = 0.35)
          .orderBy(col("kind"), col("a_id"), col("b_id"))
      },
      Some(s"""WITH base AS (
                SELECT vec_id, embedding FROM embeddings
                UNION ALL
                SELECT vec_id + 10000000, embedding FROM embeddings
                WHERE vec_id % 7 = 3
                UNION ALL
                SELECT vec_id + 20000000, embedding FROM embeddings
                WHERE vec_id % 13 = 5),
              q AS (
                SELECT vec_id, list_transform(embedding,
                  v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM base),
              kq AS (
                SELECT vec_id, qe,
                  md5(list_aggregate(list_transform(qe,
                    x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS k
                FROM q),
              reps AS (
                SELECT k, min(vec_id) AS rep_id, count(*) AS n_dups
                FROM kq GROUP BY k),
              repv AS (
                SELECT r.rep_id AS vec_id, kq.qe, r.n_dups
                FROM reps r JOIN kq ON kq.vec_id = r.rep_id),
              dups AS (
                SELECT 'dup' AS kind, r.rep_id AS a_id, kq.vec_id AS b_id,
                  CAST(list_sum(list_transform(kq.qe, x -> x*x)) AS BIGINT) AS dot,
                  CAST(1.0 AS DOUBLE) AS cos4, CAST(1 AS BIGINT) AS implied_pairs
                FROM kq JOIN reps r USING (k)
                WHERE kq.vec_id != r.rep_id),
              bk AS (SELECT vec_id, qe, n_dups,
                       ${Pipeline2.duckBucketBits(4)} AS bucket
                     FROM repv),
              pairs AS (
                SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                  CAST(list_sum(list_transform(range(len(a.qe)),
                    i -> a.qe[i+1] * b.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(a.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(b.qe, x -> x*x)) AS BIGINT) AS nb,
                  a.n_dups AS nda, b.n_dups AS ndb
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
              near AS (
                SELECT 'near' AS kind, a_id, b_id, dot,
                  round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos4,
                  CAST(nda * ndb AS BIGINT) AS implied_pairs
                FROM pairs
                WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.35)
              SELECT * FROM dups
              UNION ALL SELECT * FROM near
              ORDER BY kind, a_id, b_id""")),

    // The full-pipeline closure of q147: the SAME incremental loop, then
    // the batch emission stages (decontaminate → weighted sample →
    // per-source packing → balanced shards) over its survivors — and the
    // oracle is the FULL q136 chain, so "incremental == batch" is pinned
    // for the ENTIRE pipeline output contract (id, source, w, cum_tok,
    // bin_id, rn, shard), not just the survivor set. This is the
    // continuously-crawling deployment: state absorbs micro-batches
    // forever; emission is an on-demand read of the curated corpus.
    QEntry("q153_incremental_curation_emit",
      (s, d) => {
        val (_, _, bench) = q136Inputs(s, d)
        q147Loop(s, d, nBatches = 3)
          .emit(bench, decontN = 8, sampleK = 50, salt = "q136",
            packBudget = 256, nShards = 4)
          .orderBy(col("id"))
      },
      Some(q136FullSql))
  )
}
