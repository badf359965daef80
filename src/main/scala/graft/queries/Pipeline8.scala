package graft.queries

import org.apache.spark.sql.functions._

/** Round-7 continuation pack: hash-anchored gate rows for the streaming
  * surface (the stream-stream join and streaming dedup were spec-only —
  * VERDICT r6 item 6), then the next LLM-pipeline curation operators.
  * Same conventions as the rest of the suite: integer microseconds for
  * event time, total ordering on a unique key, integer/decimal-exact
  * comparisons.
  */
object Pipeline8 {

  private val stopList =
    graft.pipeline.TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  val entries: Seq[QEntry] = Seq(

    // Stream-stream interval join, batch-twin gate row. The operator is
    // SHARED code: EventsProfile.attributionJoin builds the same plan for
    // batch and streaming inputs (the analyzer eliminates the two
    // watermark nodes on batch children, leaving exactly the interval
    // join the state store would compute incrementally; inner-join
    // matches emit as soon as both rows arrive, so streaming == batch
    // row-for-row — EventsProfileSpec pins that equivalence on real
    // micro-batches). This row hash-anchors the shared join against the
    // DuckDB interval self-join, closing the audit chain:
    // oracle == batch (here) == streaming (spec).
    // Event times flow as integer microseconds (the q41 convention) so
    // no timestamp formatting crosses the hash boundary.
    QEntry("q121_attribution_batch",
      (s, d) => {
        val ev = graft.streaming.EventsProfile.withEventTime(
          Tables.events(s, d))
        graft.streaming.EventsProfile.attributionJoin(
            ev.filter(col("event_type") === "click"),
            ev.filter(col("event_type") === "purchase"))
          .select(col("user_id"), col("purchase_id"), col("click_id"),
            unix_micros(col("purchase_time")).as("purchase_us"),
            unix_micros(col("click_time")).as("click_us"))
          .orderBy(col("purchase_id"), col("click_id"))
      },
      Some("""SELECT p.user_id, p.event_id AS purchase_id,
                c.event_id AS click_id,
                epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
              FROM events p JOIN events c
                ON p.user_id = c.user_id
               AND p.event_type = 'purchase' AND c.event_type = 'click'
               AND epoch_us(c.ts) <= epoch_us(p.ts)
               AND epoch_us(c.ts) >= epoch_us(p.ts) - 3600000000
              ORDER BY purchase_id, click_id""")),

    // Streaming dedup gate row — runs the ACTUAL streaming operator, not
    // a twin: the events table is re-delivered twice (the at-least-once
    // source failure mode dropDuplicatesWithinWatermark exists for),
    // written as ONE parquet file so Trigger.AvailableNow processes it
    // as a single micro-batch (batch 0's watermark is unset, so nothing
    // is late-filtered — the dedup state sees every row, and the
    // watermark's state-EVICTION behavior is covered separately by the
    // per-event micro-batch specs in EventsProfileSpec). Output = one
    // row per event_id == DISTINCT over the duplicated input; kept rows
    // are deterministic because re-deliveries are exact copies. The
    // memory sink holds one micro-batch of deduped fixture rows —
    // gate-scale only; production streams sink to files/Kafka.
    QEntry("q122_stream_dedup_replay",
      (s, d) => {
        import org.apache.spark.sql.streaming.Trigger
        val ev = Tables.events(s, d)
        val inDir = Scratch.dir(s, "q122_redelivered")
        ev.union(ev).coalesce(1).write.mode("overwrite").parquet(inDir)
        val sink = "q122_dedup_sink"
        val stream = s.readStream
          .schema(graft.streaming.EventsProfile.eventsSchema)
          .parquet(inDir)
        val q = graft.streaming.EventsProfile.dedupped(
            graft.streaming.EventsProfile.withEventTime(stream))
          .writeStream.outputMode("append").format("memory")
          .queryName(sink).trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        s.table(sink)
          .select(col("event_id"), col("event_type"),
            expr("ts div 1000").as("us"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id, event_type, epoch_us(ts) AS us
              FROM events ORDER BY event_id""")),

    // Gopher-style repetition signals (Rae et al. 2021 app. A): per-doc
    // duplicate-2/3-gram instance share and top-n-gram share, in basis
    // points. The Spark side never explodes: a sorted fold inside the
    // row (gramStats) counts distinct grams and the max run — a
    // zero-shuffle projection at any corpus size. The oracle rebuilds
    // the same counts the classical way (unnest → group by doc, gram),
    // so the fold itself is what the hash match certifies. The oracle's
    // gram index is the static range(4096) + filter (the q112 pattern).
    QEntry("q123_repetition_signals",
      (s, d) => graft.pipeline.TextAnalysis.repetitionSignals(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              g AS (
                SELECT doc_id, nn.n,
                  list_aggregate(toks[i+1 : i+nn.n], 'string_agg', ' ') AS gr
                FROM t
                CROSS JOIN (VALUES (2), (3)) nn(n)
                CROSS JOIN range(4096) r(i)
                WHERE i + nn.n <= len(toks)),
              pc AS (
                SELECT doc_id, n, gr, count(*) AS c
                FROM g GROUP BY doc_id, n, gr),
              st AS (
                SELECT doc_id, n, sum(c) AS ng, count(*) AS nd, max(c) AS top
                FROM pc GROUP BY doc_id, n),
              w AS (
                SELECT d.doc_id,
                  coalesce(max(CASE WHEN st.n = 2 THEN st.ng END), 0) AS n2,
                  coalesce(max(CASE WHEN st.n = 2 THEN st.nd END), 0) AS nd2,
                  coalesce(max(CASE WHEN st.n = 2 THEN st.top END), 0) AS top2,
                  coalesce(max(CASE WHEN st.n = 3 THEN st.ng END), 0) AS n3,
                  coalesce(max(CASE WHEN st.n = 3 THEN st.nd END), 0) AS nd3,
                  coalesce(max(CASE WHEN st.n = 3 THEN st.top END), 0) AS top3
                FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
                GROUP BY d.doc_id)
              SELECT doc_id, CAST(n2 AS BIGINT) AS n2,
                CASE WHEN n2 > 0
                  THEN CAST(floor((n2 - nd2) * 10000 / n2) AS BIGINT)
                  ELSE 0 END AS dup2_bp,
                CASE WHEN n2 > 0
                  THEN CAST(floor(top2 * 10000 / n2) AS BIGINT)
                  ELSE 0 END AS top2_bp,
                CAST(n3 AS BIGINT) AS n3,
                CASE WHEN n3 > 0
                  THEN CAST(floor((n3 - nd3) * 10000 / n3) AS BIGINT)
                  ELSE 0 END AS dup3_bp,
                CASE WHEN n3 > 0
                  THEN CAST(floor(top3 * 10000 / n3) AS BIGINT)
                  ELSE 0 END AS top3_bp
              FROM w ORDER BY doc_id""")),

    // SemDeDup (Abbas et al. 2023): cluster-then-dedup-within-cluster.
    // The oracle replays EVERYTHING — centroid seed, one exact Lloyd
    // step (the q108 CTE chain), integer-L2 assignment, the
    // within-cluster pair join and the squared HUGEINT threshold test —
    // so clustering AND the dedup decision are hash-pinned together.
    // Threshold 42/100 is chosen for fixture liveness (the synthetic
    // embeddings top out at cos ≈ 0.51); production near-dup thresholds
    // run 0.9+ on real embeddings.
    QEntry("q124_semantic_dedup",
      (s, d) => graft.pipeline.Similarity.semanticDedup(
        Tables.embeddings(s, d), nList = 16, dim = 64, iters = 1,
        thrNum = 42, thrDen = 100)
        .orderBy(col("vec_id")),
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
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
              cent AS (
                SELECT sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cente
                FROM seedc sc
                LEFT JOIN tmeans m ON m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.cid),
              nca AS (
                SELECT cid, cente,
                  CAST(list_sum(list_transform(cente, x -> x*x)) AS BIGINT) AS ncv
                FROM cent),
              afit AS (
                SELECT qz.vec_id, nca.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1]*nca.cente[j+1])) AS BIGINT) AS dotc,
                  nca.ncv AS ncv
                FROM qz CROSS JOIN nca),
              assigned AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY 2*dotc - ncv DESC, cid) AS arn
                  FROM afit) WHERE arn = 1),
              side AS (
                SELECT a.vec_id, a.cluster, qz.qe,
                  CAST(list_sum(list_transform(qz.qe, x -> x*x)) AS BIGINT) AS nrm
                FROM assigned a JOIN qz USING (vec_id)),
              prs AS (
                SELECT b.vec_id,
                  CAST(list_sum(list_transform(range(len(a.qe)),
                       j -> a.qe[j+1]*b.qe[j+1])) AS BIGINT) AS dot,
                  a.nrm AS na, b.nrm AS nb
                FROM side a JOIN side b
                  ON a.cluster = b.cluster AND a.vec_id < b.vec_id
                WHERE a.nrm > 0 AND b.nrm > 0),
              dups AS (
                SELECT DISTINCT vec_id FROM prs
                WHERE dot > 0
                  AND CAST(dot AS HUGEINT)*dot*10000 >= CAST(1764 AS HUGEINT)*na*nb)
              SELECT s.vec_id, CAST(s.cluster AS INTEGER) AS cluster,
                (d.vec_id IS NOT NULL) AS is_dup
              FROM side s LEFT JOIN dups d USING (vec_id)
              ORDER BY s.vec_id""")),

    // Multinomial Naive Bayes source classifier, trained on the
    // doc_id%10!=0 split and predicting `source` for the held-out
    // docs. Add-one smoothing; every ln rounded to integer micro-nats
    // per (term, class) BEFORE the doc sum (the q92/q117 convention),
    // so scores are order-independent integer sums and the argmax is
    // exact. The oracle replays counts, smoothing, priors, the
    // unseen-term coalesce and the (score desc, class asc) argmax.
    QEntry("q125_naive_bayes",
      (s, d) => graft.pipeline.Retrieval.naiveBayesClassify(
        Tables.documents(s, d), "doc_id", "text", "source")
        .orderBy(col("doc_id")),
      Some("""WITH tr AS (
                SELECT doc_id, source,
                  string_split_regex(lower(text), '\s+') AS toks
                FROM documents WHERE doc_id % 10 != 0),
              ev AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents WHERE doc_id % 10 = 0),
              trt AS (SELECT source, unnest(toks) AS term FROM tr),
              cst AS (SELECT source, count(*) AS ntk FROM trt GROUP BY source),
              csd AS (SELECT source, count(*) AS nd FROM tr GROUP BY source),
              tot AS (SELECT count(*) AS ndocs FROM tr),
              voc AS (SELECT count(DISTINCT term) AS v FROM trt),
              cs AS (
                SELECT csd.source, cst.ntk, voc.v,
                  CAST(round(ln(CAST(csd.nd AS DOUBLE) / tot.ndocs)
                       * 1000000.0) AS BIGINT) AS prior_micro,
                  CAST(round(ln(1.0 / (cst.ntk + voc.v))
                       * 1000000.0) AS BIGINT) AS miss_micro
                FROM csd JOIN cst USING (source)
                CROSS JOIN tot CROSS JOIN voc),
              tc AS (
                SELECT source, term, count(*) AS c
                FROM trt GROUP BY source, term),
              hit AS (
                SELECT tc.source, tc.term,
                  CAST(round(ln((tc.c + 1.0) / (cs.ntk + cs.v))
                       * 1000000.0) AS BIGINT) AS s_micro
                FROM tc JOIN cs USING (source)),
              etf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM (SELECT doc_id, unnest(toks) AS term FROM ev)
                GROUP BY doc_id, term),
              sc AS (
                SELECT e.doc_id, cs.source,
                  cs.prior_micro +
                    sum(e.tf * COALESCE(h.s_micro, cs.miss_micro)) AS score
                FROM etf e CROSS JOIN cs
                LEFT JOIN hit h ON h.source = cs.source AND h.term = e.term
                GROUP BY e.doc_id, cs.source, cs.prior_micro),
              rk AS (
                SELECT doc_id, source, score,
                  row_number() OVER (PARTITION BY doc_id
                    ORDER BY score DESC, source) AS rn
                FROM sc)
              SELECT doc_id, source AS pred, CAST(score AS BIGINT) AS best_micro
              FROM rk WHERE rn = 1 ORDER BY doc_id""")),

    // One BPE merge step (Sennrich 2016) at corpus scale: char-pair
    // counts weighted by word frequency, top pair chosen (count desc,
    // pair asc), merge applied by literal left-to-right replace —
    // verified identical in both engines, incl. the overlapping-run
    // case ("a a a" -> "aa a") — then the post-merge pair counts. The
    // oracle rebuilds chars via substr over the static range(64) (max
    // fixture word is 8 chars) and replays count -> pick -> merge ->
    // recount, so the merge DECISION and its application are pinned.
    QEntry("q126_bpe_merge_step",
      (s, d) => graft.pipeline.TextAnalysis.bpeMergeStep(
        Tables.documents(s, d), "text", topN = 20)
        .orderBy(col("cnt").desc, col("pair")),
      Some("""WITH wc AS (
                SELECT w AS wd, count(*) AS n FROM (
                  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
                WHERE length(w) > 0 GROUP BY w),
              p0 AS (
                SELECT substr(wd, CAST(i+1 AS INT), 1) || ' ' ||
                       substr(wd, CAST(i+2 AS INT), 1) AS pr, n
                FROM wc CROSS JOIN range(64) r(i)
                WHERE i + 2 <= length(wd)),
              pc0 AS (SELECT pr, sum(n) AS c FROM p0 GROUP BY pr),
              top1 AS (
                SELECT pr AS mpair, replace(pr, ' ', '') AS msym
                FROM pc0 ORDER BY c DESC, pr LIMIT 1),
              sq AS (
                SELECT wd, n,
                  string_agg(substr(wd, CAST(i+1 AS INT), 1), ' '
                    ORDER BY i) AS sq
                FROM wc CROSS JOIN range(64) r(i)
                WHERE i < length(wd) GROUP BY wd, n),
              m AS (
                SELECT string_split(replace(sq.sq, t.mpair, t.msym), ' ') AS ts,
                       sq.n, t.mpair
                FROM sq CROSS JOIN top1 t),
              p1 AS (
                SELECT ts[CAST(i+1 AS INT)] || ' ' ||
                       ts[CAST(i+2 AS INT)] AS pair, n, mpair
                FROM m CROSS JOIN range(64) r(i)
                WHERE i + 2 <= len(ts)),
              pc1 AS (
                SELECT pair, mpair AS merged, sum(n) AS cnt
                FROM p1 GROUP BY pair, mpair)
              SELECT pair, CAST(cnt AS BIGINT) AS cnt, merged
              FROM pc1 ORDER BY cnt DESC, pair LIMIT 20""")),

    // Per-source KL(P_source || P_corpus) over unigram distributions —
    // the domain-shift / mixture-design metric, in integer micro-nats
    // per token. Each term's log-ratio is rounded per (source, term)
    // BEFORE the weighted sum (order-independent integer rollup, the
    // q92 convention); both lns run on exact-integer double quotients.
    QEntry("q127_source_kl",
      (s, d) => graft.pipeline.Curation.sourceKlDivergence(
        Tables.documents(s, d), "source", "text")
        .orderBy(col("source")),
      Some("""WITH st AS (
                SELECT source,
                  unnest(string_split_regex(lower(text), '\s+')) AS term
                FROM documents),
              cst AS (
                SELECT source, term, count(*) AS c
                FROM st GROUP BY source, term),
              ct AS (
                SELECT term, CAST(sum(c) AS BIGINT) AS ct
                FROM cst GROUP BY term),
              ns AS (
                SELECT source, CAST(sum(c) AS BIGINT) AS ns
                FROM cst GROUP BY source),
              n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cst),
              contrib AS (
                SELECT cst.source, ns.ns,
                  cst.c * CAST(round(
                    (ln(CAST(cst.c AS DOUBLE) / ns.ns) -
                     ln(CAST(ct.ct AS DOUBLE) / n.n)) * 1000000.0)
                    AS BIGINT) AS cm
                FROM cst JOIN ct USING (term)
                JOIN ns USING (source) CROSS JOIN n)
              SELECT source, max(ns) AS n_toks,
                CAST(sum(cm) AS BIGINT) AS kl_sum_micro,
                CAST(floor(CAST(sum(cm) AS BIGINT) / max(ns)) AS BIGINT)
                  AS kl_micro
              FROM contrib GROUP BY source ORDER BY source""")),

    // BM25 ranked retrieval: every doc_id%100==0 doc's first 6 tokens
    // become a query; top-5 docs per query by summed integer-micro BM25
    // contributions (per-contribution rounding makes the sum
    // order-independent; rank ties break on doc_id). The oracle replays
    // the full q85 BM25 derivation, the distinct-term query join and
    // the windowed top-k.
    QEntry("q128_bm25_search",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val qs = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("q_id"),
            array_join(slice(split(lower(col("text")), "\\s+"), 1, 6), " ")
              .as("qtext"))
        graft.pipeline.Retrieval.bm25Search(qs, docs, "doc_id", "text", k = 5)
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                         FROM documents),
              dlen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
              tm AS (SELECT doc_id, unnest(toks) AS term FROM t),
              tf AS (SELECT doc_id, term, count(*) AS tf FROM tm
                     GROUP BY doc_id, term),
              df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
                     FROM dlen),
              contrib AS (
                SELECT tf.term, tf.doc_id,
                  CAST(round(round(
                    ln((CAST(st.n_docs AS DOUBLE) - df.df + 0.5)
                       / (df.df + 0.5) + 1.0)
                    * (tf.tf * 2.2)
                    / (tf.tf + 1.2 * (0.25 + 0.75 *
                        (dlen.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))),
                    6) * 1000000.0) AS BIGINT) AS c_micro
                FROM tf JOIN dlen USING (doc_id) JOIN df USING (term)
                CROSS JOIN st),
              q AS (
                SELECT doc_id AS q_id,
                  unnest(list_distinct(toks[1:6])) AS term
                FROM t WHERE doc_id % 100 = 0),
              scored AS (
                SELECT q.q_id, c.doc_id, sum(c.c_micro) AS score_micro
                FROM q JOIN contrib c USING (term)
                GROUP BY q.q_id, c.doc_id),
              rk AS (
                SELECT q_id, doc_id, CAST(score_micro AS BIGINT) AS score_micro,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score_micro DESC, doc_id) AS INT) AS rn
                FROM scored)
              SELECT q_id, doc_id, score_micro, rn FROM rk
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // PII redaction over a deterministically PII-augmented corpus (the
    // synthetic fixture carries no natural PII, so every doc_id%5==0
    // doc gets a derived email + phone + SSN-shaped id appended — the
    // q101 derivation trick; both engines build the identical string
    // from doc_id). Patterns live in the Java-regex ∩ RE2 dialect;
    // DuckDB regexp_replace needs the 'g' flag to match Spark's
    // replace-all.
    QEntry("q129_pii_redact",
      (s, d) => {
        val aug = Tables.documents(s, d).select(col("doc_id"),
          when(col("doc_id") % 5 === 0,
            concat(col("text"), lit(" u"), col("doc_id"),
              lit("@ex.com 555-123-4567 999-88-7777")))
            .otherwise(col("text")).as("text"))
        graft.pipeline.Curation.redactPii(aug, "doc_id", "text")
          .orderBy(col("doc_id"))
      },
      Some("""WITH aug AS (
                SELECT doc_id, CASE WHEN doc_id % 5 = 0
                  THEN text || ' u' || CAST(doc_id AS VARCHAR) ||
                       '@ex.com 555-123-4567 999-88-7777'
                  ELSE text END AS text
                FROM documents)
              SELECT doc_id,
                CAST(len(regexp_extract_all(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                  AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(text,
                  '\b\d{3}-\d{2}-\d{4}\b')) AS BIGINT) AS n_ids,
                CAST(len(regexp_extract_all(text,
                  '\b\d{3}[-.]\d{3}[-.]\d{4}\b')) AS BIGINT) AS n_phones,
                regexp_replace(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                  '<EMAIL>', 'g'),
                  '\b\d{3}-\d{2}-\d{4}\b', '<ID>', 'g'),
                  '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g') AS redacted
              FROM aug ORDER BY doc_id""")),

    // Balanced shard assignment: round-robin over the char-count-
    // descending global order, S=8 — near-equal shard mass (max−min ≤
    // heaviest doc) with a fully deterministic per-doc assignment. The
    // rank is the GlobalRank two-pass (no single-partition window);
    // the oracle replays the DESC order and the mod-S fold.
    QEntry("q130_balanced_shards",
      (s, d) => graft.pipeline.Curation.balancedShards(
        Tables.documents(s, d), "doc_id", "n_chars", nShards = 8)
        .orderBy(col("id")),
      Some("""WITH r AS (
                SELECT doc_id AS id, n_chars AS w,
                  CAST(row_number() OVER (ORDER BY n_chars DESC, doc_id)
                    AS INT) AS rn
                FROM documents)
              SELECT id, w, rn, CAST((rn - 1) % 8 AS INT) AS shard
              FROM r ORDER BY id""")),

    // Snapshot delta audit between two derived crawls: old = doc_id%7
    // != 0 (original text), new = doc_id%5 != 0 (text mutated for
    // doc_id%11 == 0) — yielding live rows in all four statuses.
    // Digest-only full-outer join; both engines md5 the same bytes.
    QEntry("q131_snapshot_diff",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val oldS = docs.filter(col("doc_id") % 7 =!= 0)
        val newS = docs.filter(col("doc_id") % 5 =!= 0)
          .select(col("doc_id"),
            when(col("doc_id") % 11 === 0, concat(col("text"), lit(" v2")))
              .otherwise(col("text")).as("text"))
        graft.pipeline.Curation.snapshotDiff(oldS, newS, "doc_id", "text")
          .orderBy(col("id"))
      },
      Some("""WITH olds AS (
                SELECT doc_id AS id, md5(text) AS h_old
                FROM documents WHERE doc_id % 7 != 0),
              news AS (
                SELECT doc_id AS id,
                  md5(CASE WHEN doc_id % 11 = 0 THEN text || ' v2'
                      ELSE text END) AS h_new
                FROM documents WHERE doc_id % 5 != 0)
              SELECT COALESCE(o.id, n.id) AS id,
                CASE WHEN o.id IS NULL THEN 'added'
                     WHEN n.id IS NULL THEN 'removed'
                     WHEN o.h_old = n.h_new THEN 'unchanged'
                     ELSE 'changed' END AS status
              FROM olds o FULL OUTER JOIN news n ON o.id = n.id
              ORDER BY id""")),

    // T5 span corruption at 15%: mask draws are md5 buckets per
    // (doc, position) — the q87 portable-sampling contract — so both
    // engines regenerate identical samples. The oracle rebuilds runs
    // with lag()+cumulative-sum windows and string_aggs the
    // input/target pieces; the Spark side is one O(n) fold per row.
    QEntry("q132_span_corrupt",
      (s, d) => graft.pipeline.Curation.spanCorrupt(
        Tables.documents(s, d), "doc_id", "text", maskPct = 15, salt = "t5")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              pos AS (
                SELECT doc_id, CAST(i+1 AS BIGINT) AS p,
                       toks[CAST(i+1 AS INT)] AS tok
                FROM t CROSS JOIN range(4096) r(i) WHERE i < len(toks)),
              fl AS (
                SELECT doc_id, p, tok,
                  (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#' ||
                      CAST(p AS VARCHAR) || ':t5'), 1, 8))::BIGINT % 100) < 15
                    AS m
                FROM pos),
              runs AS (
                SELECT *, CASE WHEN m AND NOT coalesce(
                    lag(m) OVER (PARTITION BY doc_id ORDER BY p), false)
                  THEN 1 ELSE 0 END AS st
                FROM fl),
              num AS (
                SELECT *, sum(st) OVER (PARTITION BY doc_id ORDER BY p) AS rid
                FROM runs),
              inp AS (
                SELECT doc_id, string_agg(piece, ' ' ORDER BY p) AS input
                FROM (
                  SELECT doc_id, p,
                    CASE WHEN NOT m THEN tok
                         WHEN st = 1 THEN '<X' || CAST(rid-1 AS VARCHAR) || '>'
                    END AS piece
                  FROM num) WHERE piece IS NOT NULL GROUP BY doc_id),
              tgt AS (
                SELECT doc_id, string_agg(piece, ' ' ORDER BY p) AS target
                FROM (
                  SELECT doc_id, p,
                    CASE WHEN m AND st = 1
                           THEN '<X' || CAST(rid-1 AS VARCHAR) || '> ' || tok
                         WHEN m THEN tok
                    END AS piece
                  FROM num) WHERE piece IS NOT NULL GROUP BY doc_id),
              agg AS (
                SELECT doc_id, count(*) AS n_tok,
                  count(*) FILTER (m) AS n_masked,
                  coalesce(max(rid), 0) AS n_spans
                FROM num GROUP BY doc_id)
              SELECT a.doc_id, CAST(a.n_tok AS BIGINT) AS n_tok,
                CAST(a.n_masked AS BIGINT) AS n_masked,
                CAST(a.n_spans AS BIGINT) AS n_spans,
                coalesce(i.input, '') AS input,
                coalesce(g.target, '') AS target
              FROM agg a LEFT JOIN inp i USING (doc_id)
              LEFT JOIN tgt g USING (doc_id)
              ORDER BY a.doc_id""")),

    // The composed quality-filter stack: q89's Gopher gates + q123's
    // repetition thresholds in ONE projection chain — the full
    // keep/drop decision with a first-failing-rule reason, all
    // integer. Thresholds (1000/1500/100 bp) chosen for fixture
    // liveness across the repetition rules too.
    QEntry("q133_quality_stack",
      (s, d) => graft.pipeline.Curation.qualityFilterStack(
        Tables.documents(s, d), "doc_id", "text",
        dup2MaxBp = 1000, top2MaxBp = 1500, dup3MaxBp = 100)
        .orderBy(col("doc_id")),
      Some(s"""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                FROM documents),
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
                FROM documents d LEFT JOIN st ON d.doc_id = st.doc_id
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
                FROM w)
              SELECT b.doc_id, b.dup2_bp, b.top2_bp, b.dup3_bp,
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
                     ELSE '' END AS reason
              FROM b JOIN g USING (doc_id) ORDER BY b.doc_id""")),

    // Winnowing fingerprints (MOSS): every 16-window of consecutive
    // 8-char shingle md5s contributes its min; distinct mins = the
    // fingerprint set. The oracle rebuilds the window mins with a
    // ROWS-following window function and clips the window index list
    // exactly as the Spark side's sequence guard does.
    QEntry("q134_winnow_fingerprints",
      (s, d) => graft.pipeline.TextAnalysis.winnowFingerprints(
        Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
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
                FROM wmin WHERE i <= greatest(nh - 15, 1))
              SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
                min(fp) AS fp_min, max(fp) AS fp_max
              FROM fps GROUP BY doc_id ORDER BY doc_id""")),

    // MOSS overlap report: doc pairs sharing >= 2 winnowed fingerprints
    // after dropping fingerprints in > 10 docs (boilerplate removal,
    // replayed by the oracle's df filter). Fan-out bounded by maxDf²
    // per fingerprint by construction.
    QEntry("q135_winnow_pairs",
      (s, d) => graft.pipeline.TextAnalysis.winnowPairs(
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
              keep AS (SELECT fps.doc_id, fps.fp FROM fps JOIN dfreq USING (fp))
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(count(*) AS BIGINT) AS n_shared
              FROM keep a JOIN keep b
                ON a.fp = b.fp AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
              HAVING count(*) >= 2
              ORDER BY doc_a, doc_b"""))
  )
}
