package graft.queries

import org.apache.spark.sql.functions._

/** Round-5 closing pack: sentence segmentation, lexical coverage (OOV),
  * and embedding-norm QA. Same conventions as the rest of the suite —
  * integer aggregates, floor-div for ratios, total ordering.
  */
object Pipeline6 {

  val entries: Seq[QEntry] = Seq(

    // Sentence segmentation stats: split on [.!?]+ runs, drop whitespace-
    // only fragments, report per-doc counts. Pure projection (the
    // split/filter/aggregate all happen inside one row), zero shuffle.
    QEntry("q98_sentence_stats",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          filter(transform(split(col("text"), "[.!?]+"), x => trim(x)),
            x => length(x) > 0).as("sents"))
        .select(col("doc_id"),
          size(col("sents")).cast("long").as("n_sentences"),
          coalesce(aggregate(col("sents"), lit(0L), (acc, x) => acc + length(x)),
            lit(0L)).as("sum_sent_chars"),
          coalesce(array_max(transform(col("sents"), x => length(x))), lit(0))
            .cast("long").as("max_sent_chars"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (
                SELECT doc_id,
                  list_filter(list_transform(
                    string_split_regex(text, '[.!?]+'), x -> trim(x)),
                    x -> length(x) > 0) AS sents
                FROM documents)
              SELECT doc_id,
                CAST(len(sents) AS BIGINT) AS n_sentences,
                CAST(coalesce(list_sum(list_transform(sents, x -> length(x))), 0)
                  AS BIGINT) AS sum_sent_chars,
                CAST(coalesce(list_max(list_transform(sents, x -> length(x))), 0)
                  AS BIGINT) AS max_sent_chars
              FROM t ORDER BY doc_id""")),

    // Lexical coverage: out-of-vocabulary rate against a FREQUENCY-CUTOFF
    // vocab (corpus count >= 5) — the word2vec-style min_count vocab. A
    // top-k vocab would need a global rank (single-partition window, the
    // q05 anti-pattern); the cutoff vocab is one keyed agg + one keyed
    // join and scales with no hot spot. oov_bp floor-divs the SAME IEEE
    // quotient in both engines.
    QEntry("q99_oov_rate",
      (s, d) => {
        // collapse to (doc, term, tf) FIRST: the vocab join and the
        // per-doc rollup then carry distinct pairs, never the raw
        // token stream (same shuffle discipline as unigramSurprisal)
        val tf = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(split(lower(col("text")), "\\s+")).as("term"))
          .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
        val uc = tf.groupBy(col("term")).agg(sum(col("tf")).as("c"))
        tf.join(uc, "term")
          .groupBy(col("doc_id"))
          .agg(sum(col("tf")).as("n_tok"),
            sum(when(col("c") < 5, col("tf")).otherwise(0L)).as("n_oov"))
          .select(col("doc_id"), col("n_tok"), col("n_oov"),
            floor(col("n_oov") * 10000.0 / col("n_tok")).cast("long").as("oov_bp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
                         FROM documents),
                   uc AS (SELECT term, count(*) AS c FROM t GROUP BY term),
                   agg AS (SELECT doc_id, count(*) AS n_tok,
                       CAST(sum(CASE WHEN c < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
                     FROM t JOIN uc USING (term) GROUP BY doc_id)
              SELECT doc_id, n_tok, n_oov,
                CAST(floor(n_oov * 10000.0 / n_tok) AS BIGINT) AS oov_bp
              FROM agg ORDER BY doc_id""")),

    // Embedding QA: per-label count and quantized-int64 squared-norm
    // stats — the drift/NaN tripwire a vector pipeline runs before
    // indexing. Fused dot_long keeps the norm in one codegen'd loop;
    // all aggregates are exact integers.
    QEntry("q100_embedding_norms",
      (s, d) => {
        val q = graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
        val n2 = graft.expressions.functions.dot_long(col("q"), col("q"))
        Tables.embeddings(s, d)
          .select(col("label"), q.as("q"))
          .select(col("label"), n2.as("norm2"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(col("norm2")).as("sum_norm2"),
            min(col("norm2")).as("min_norm2"),
            max(col("norm2")).as("max_norm2"))
          .orderBy(col("label"))
      },
      Some("""WITH q AS (
                SELECT label,
                  CAST(list_sum(list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT) *
                         CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)))
                    AS BIGINT) AS norm2
                FROM embeddings)
              SELECT label, count(*) AS n_vecs,
                CAST(sum(norm2) AS BIGINT) AS sum_norm2,
                min(norm2) AS min_norm2, max(norm2) AS max_norm2
              FROM q GROUP BY label ORDER BY label""")),

    // Doc-level embedding pooling (SURVEY §9 round-6 candidate): groups
    // of 10 token vectors (doc = vec_id div 10 — the fixture derivation)
    // mean-pooled into one doc vector. Integer-exact per the
    // Similarity.meanPoolQ contract: quantize first, integer per-
    // component sums, floor of the same IEEE mean both engines compute.
    // Output is one row PER COMPONENT, so the oracle pins every pooled
    // value, not a digest.
    QEntry("q103_embed_pool",
      (s, d) => {
        val toks = Tables.embeddings(s, d)
          .select(expr("vec_id div 10").as("doc_id"),
            graft.expressions.functions.quantize_vec(col("embedding"), 10000.0).as("qe"))
        graft.pipeline.Similarity.meanPoolQ(toks)
          .select(col("doc_id"), posexplode(col("pe")))
          .select(col("doc_id"), col("pos"), col("col").as("pv"))
          .orderBy(col("doc_id"), col("pos"))
      },
      Some("""WITH qz AS (
                SELECT vec_id // 10 AS doc_id,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              e AS (
                SELECT doc_id, CAST(t.i AS INTEGER) AS pos, qe[t.i+1] AS v
                FROM qz, range(64) t(i))
              SELECT doc_id, pos,
                CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS pv
              FROM e GROUP BY doc_id, pos
              ORDER BY doc_id, pos""")),

    // Pooled vectors flowing into bucketed ANN — the corpus-level
    // similarity search over q103's doc vectors, via the INTEGER
    // hyperplane bucket (lsh_bucket_long), so unlike the float-bucket
    // q39 this LSH pipeline is fully oracle-pinned: DuckDB rebuilds
    // pooling, buckets, in-bucket dots and the top-k ranking (the q60
    // convention).
    QEntry("q104_pooled_ann",
      (s, d) => {
        // Checkpoint the pooled frame ONCE: three consumers (query side,
        // corpus side, and the broadcast-strategy count probe) would
        // otherwise each re-run the whole meanPoolQ dataflow.
        val pooled = graft.pipeline.Similarity.meanPoolQ(
          Tables.embeddings(s, d)
            .select(expr("vec_id div 10").as("doc_id"),
              graft.expressions.functions.quantize_vec(col("embedding"), 10000.0).as("qe")))
          .localCheckpoint()
        val queries = pooled.filter(col("doc_id") % 10 === 0)
          .select(col("doc_id").as("q_id"), col("pe").as("qe"))
        graft.pipeline.Similarity.cosineTopKBucketedQ(
          queries, pooled.select(col("doc_id").as("vec_id"), col("pe").as("qe")),
          nBits = 4, k = 3)
          .orderBy(col("q_id"), col("rn"))
      },
      Some(s"""WITH qz AS (
                SELECT vec_id // 10 AS doc_id,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              e AS (
                SELECT doc_id, t.i AS pos, qe[t.i+1] AS v
                FROM qz, range(64) t(i)),
              pooled AS (
                SELECT doc_id, pos,
                  CAST(floor(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS pv
                FROM e GROUP BY doc_id, pos),
              pv AS (
                SELECT doc_id, list(pv ORDER BY pos) AS qe
                FROM pooled GROUP BY doc_id),
              bk AS (SELECT doc_id, qe, ${Pipeline2.duckBucketBits(4)} AS bucket FROM pv),
              cand AS (
                SELECT q.doc_id AS q_id, c.doc_id AS vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                    i -> q.qe[i+1] * c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM bk q JOIN bk c ON q.bucket = c.bucket
                WHERE q.doc_id % 10 = 0),
              ranked AS (
                SELECT q_id, vec_id, dot,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM cand)
              SELECT q_id, vec_id, dot, rn FROM ranked WHERE rn <= 3
              ORDER BY q_id, rn""")),

    // Watermark late-data audit (EventsProfile.lateDataAudit): replay
    // the event log in a deterministic near-ordered arrival sequence
    // (event_id jittered by a +-3 md5 draw — the fixture's events are
    // perfectly time-ordered, so the jitter plants the out-of-order
    // tail a real ingest has; ~1-25% of rows arrive behind the running
    // watermark depending on SF) and compute, per (hour window,
    // event_type), what the streaming profile would emit (on-time
    // count + cents) and what its watermark would drop (late count).
    // Streaming equivalence is spec-pinned with real per-event
    // micro-batches; this row pins the audit math cross-engine.
    QEntry("q105_late_data_audit",
      (s, d) => {
        val arrival = col("event_id") +
          conv(substring(md5(col("event_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 6 - 3
        graft.streaming.EventsProfile.lateDataAudit(Tables.events(s, d), arrival)
          .orderBy(col("window_start_us"), col("event_type"))
      },
      Some("""WITH e AS (
                SELECT event_id, event_type, epoch_us(ts) AS us,
                  CAST(round(value * 100) AS BIGINT) AS cents,
                  event_id + ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                    % 6 - 3 AS arr
                FROM events),
              w AS (
                SELECT *, max(us) OVER (ORDER BY arr, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wmax
                FROM e),
              f AS (
                SELECT event_type, cents,
                  (us // 3600000000) * 3600000000 AS window_start_us,
                  (wmax IS NOT NULL AND
                   (us // 3600000000) * 3600000000 + 3600000000 <= wmax - 600000000)
                    AS late
                FROM w)
              SELECT window_start_us, event_type,
                count(*) AS n_total,
                CAST(sum(CASE WHEN late THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
                CAST(sum(CASE WHEN late THEN 0 ELSE 1 END) AS BIGINT) AS n_ontime,
                CAST(sum(CASE WHEN late THEN 0 ELSE cents END) AS BIGINT) AS cents_ontime
              FROM f GROUP BY 1, 2 ORDER BY 1, 2""")),

    // k-means|| seeding (Bahmani et al. VLDB 2012), oracle-pinned end to
    // end via the integer-exact portable twin
    // (Similarity.kmeansParallelSeedsExact): integer micro-nat costs
    // (order-independent totals), md5-prefix admission draws compared in
    // exact wide arithmetic (decimal128 / HUGEINT), and the driver-side
    // greedy weighted farthest-first reduction replayed as chained
    // selection CTEs — the SURVEY §10 round-7 item: the hash-draw stages
    // were already deterministic, this pins the greedy reduction too.
    // The xxhash64 float-cost production operator keeps its
    // determinism+quality spec (ExactJoinSpec).
    QEntry("q109_kmeanspp_seeds", {
      val (nList, over, rounds) = (4, 8, 2)
      (s, d) => graft.pipeline.Similarity.kmeansParallelSeedsExact(
        Tables.embeddings(s, d), nList = nList, over = over, rounds = rounds)
        .select(col("cid"), posexplode(col("cente")))
        .select(col("cid"), col("pos"), col("col").as("cv"))
        .orderBy(col("cid"), col("pos"))
    },
      Some {
        val (nList, over, rounds) = (4, 8, 2)
        def dot(a: String, b: String) =
          s"CAST(list_sum(list_transform(range(64), i -> $a[i+1] * $b[i+1])) AS BIGINT)"
        def norm(a: String) = s"CAST(list_sum(list_transform($a, x -> x*x)) AS BIGINT)"
        val admit = over.toLong * 4294967296L // over * 2^32
        val roundCtes = (1 to rounds).map { r =>
          s"""sc$r AS (
                SELECT p.vec_id, p.qe,
                  max(${dot("p.qe", "c.cente")}
                      / (sqrt(${norm("c.cente")}) * sqrt(p.nq))) AS best
                FROM spts p CROSS JOIN cand${r - 1} c
                GROUP BY p.vec_id, p.qe),
              cost$r AS (
                SELECT vec_id, qe,
                  greatest(CAST(floor((1.0 - best) * 1000000.0) AS BIGINT), 0) AS cost
                FROM sc$r),
              tot$r AS (SELECT COALESCE(sum(cost), 0) AS total FROM cost$r),
              pick$r AS (
                SELECT c.vec_id AS cid, c.qe AS cente
                FROM cost$r c CROSS JOIN tot$r t
                WHERE CAST(CAST(('0x' || substr(md5(CAST(c.vec_id AS VARCHAR) || ':$r'),
                          1, 8)) AS BIGINT) AS HUGEINT) * CAST(t.total AS HUGEINT)
                    < CAST(c.cost AS HUGEINT) * CAST($admit AS HUGEINT)),
              cand$r AS (
                SELECT cid, cente FROM cand${r - 1}
                UNION
                SELECT cid, cente FROM pick$r)"""
        }.mkString(",\n              ")
        val greedyCtes = (2 to nList).map { k =>
          s"""g$k AS (
                SELECT r.cid, r.cente,
                  CAST(r.w AS DOUBLE) * (1.0 - max(
                    ${dot("r.cente", "s.cente")} /
                    (sqrt(${norm("r.cente")}) * sqrt(${norm("s.cente")})))) AS gain
                FROM wcand r CROSS JOIN ch${k - 1} s
                WHERE r.cid NOT IN (SELECT cid FROM ch${k - 1})
                GROUP BY r.cid, r.cente, r.w),
              sel$k AS (SELECT cid, cente FROM g$k ORDER BY gain DESC, cid LIMIT 1),
              ch$k AS (SELECT cid, cente FROM ch${k - 1}
                       UNION ALL SELECT cid, cente FROM sel$k)"""
        }.mkString(",\n              ")
        s"""WITH qz AS (
              SELECT vec_id, list_transform(embedding,
                v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
              FROM embeddings),
            pts AS (SELECT vec_id, qe, ${norm("qe")} AS nq FROM qz),
            spts AS (SELECT * FROM pts WHERE nq > 0),
            cand0 AS (
              SELECT vec_id AS cid, qe AS cente FROM spts ORDER BY vec_id LIMIT 1),
            $roundCtes,
            wnear AS (
              SELECT vec_id, cid FROM (
                SELECT p.vec_id, c.cid,
                  row_number() OVER (PARTITION BY p.vec_id
                    ORDER BY ${dot("p.qe", "c.cente")}
                      / (sqrt(${norm("c.cente")}) * sqrt(p.nq)) DESC, c.cid) AS nrn
                FROM spts p CROSS JOIN cand$rounds c) WHERE nrn = 1),
            cellw AS (SELECT cid, count(*) AS w FROM wnear GROUP BY cid),
            wcand AS (
              SELECT c.cid, c.cente, COALESCE(cellw.w, 0) AS w
              FROM cand$rounds c LEFT JOIN cellw ON cellw.cid = c.cid),
            sel1 AS (SELECT cid, cente FROM wcand ORDER BY w DESC, cid LIMIT 1),
            ch1 AS (SELECT cid, cente FROM sel1),
            $greedyCtes
            SELECT cid, CAST(t.i AS INTEGER) AS pos, cente[t.i+1] AS cv
            FROM ch$nList CROSS JOIN range(64) t(i)
            ORDER BY cid, pos"""
      })
  )
}
