package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-5 text-retrieval pack: TF-IDF term scoring and a bounded
  * inverted index — the retrieval-side operators of a training-data
  * pipeline (dedup/quality filtering feed INTO these; similarity search
  * reads OUT of them).
  */
object Pipeline4 {

  val entries: Seq[QEntry] = Seq(

    // TF-IDF: per-(doc, term) score. Two hash aggregations (tf on
    // (doc, term), df on term — both map-side combined) + one join on
    // term + the corpus size broadcast as a 1-row frame (never a
    // driver-side collect). Doubles appear only in the final ln() —
    // rounded at the query edge per the oracle-parity convention.
    QEntry("q81_tfidf",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        val terms = docs.select(col("doc_id"), explode(col("toks")).as("term"))
        val tf = terms.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        tf.join(dfreq, "term")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("term"), col("tf"), col("df"),
            round(col("tf") *
              log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
          .orderBy(col("doc_id"), col("term"))
      },
      Some("""WITH t AS (
                SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
                FROM documents),
              tf AS (
                SELECT doc_id, term, count(*) AS tf
                FROM t GROUP BY doc_id, term),
              df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
              n AS (SELECT count(*) AS n_docs FROM documents)
              SELECT tf.doc_id, tf.term, tf.tf, df.df,
                round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
              FROM tf JOIN df USING (term) CROSS JOIN n
              ORDER BY tf.doc_id, tf.term""")),

    // Product-quantization ADC search under the full oracle: seed
    // codebooks (subvectors of the 4 lowest vec_ids — deterministic,
    // rebuildable in SQL), integer-dot encode, and ADC top-5 where
    // score(q, x) = dot(q, reconstruct(codes(x))) exactly. The oracle
    // recomputes encode+score as a join-sum — every stage of the PQ
    // dataflow is integer-pinned (Lloyd-TRAINED codebooks are the
    // spec-gated upgrade: same dataflow, PqSpec).
    QEntry("q83_pq_adc",
      (s, d) => {
        val (m, ksub, dim, k) = (4, 4, 64, 5)
        val emb = Tables.embeddings(s, d)
        val cb = graft.pipeline.Similarity.pqCodebookSeed(emb, m, ksub, dim)
        val enc = graft.pipeline.Similarity.pqEncode(emb, cb, m, dim)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        graft.pipeline.Similarity.pqTopKDot(queries, enc, cb, m, ksub, dim, k)
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              sub AS (
                SELECT vec_id, sg.s, qe[sg.s*16+1 : sg.s*16+16] AS sv
                FROM qz CROSS JOIN (SELECT unnest([0,1,2,3]) AS s) sg),
              seeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
              cb AS (
                SELECT sub.s, seeds.cid, sub.sv AS cv
                FROM sub JOIN seeds USING (vec_id)),
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
              scores AS (
                SELECT qd.vec_id AS q_id, c.vec_id,
                  CAST(sum(qd.dot) AS BIGINT) AS score
                FROM codes c
                JOIN dots qd ON c.s = qd.s AND c.cid = qd.cid
                WHERE qd.vec_id % 100 = 0
                GROUP BY qd.vec_id, c.vec_id),
              ranked AS (
                SELECT q_id, vec_id, score,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, vec_id) AS rn
                FROM scores)
              SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= 5
              ORDER BY q_id, rn""")),

    // IVF-PQ with RESIDUAL coupling (IVFADC, Jégou et al. PAMI 2011):
    // corpus assigned to coarse centroids by integer L2 fit, residuals
    // qe − cente PQ-encoded, score = dot(q, cente) + adc(residual codes)
    // — an exact integer the oracle rebuilds end to end (assignment,
    // residuals, codebook, codes, probes, scores). nProbe=2 of nList=4
    // exercises the probe pruning; the recall-vs-raw-PQ improvement is
    // spec-pinned (SimilaritySpec) at nProbe=nList.
    QEntry("q102_ivf_pq_residual",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        graft.pipeline.Similarity.ivfPqTopKDot(queries, emb,
          nList = 4, m = 4, ksub = 4, dim = 64, k = 5, nProbe = 2)
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
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
                -- skip the centroid sources: their residuals are ~zero
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4 OFFSET 4)),
              cb AS (
                SELECT sub.s, pseeds.cid, sub.sv AS cv
                FROM sub JOIN pseeds USING (vec_id)),
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
              ranked AS (
                SELECT q_id, vec_id, score,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, vec_id) AS rn
                FROM scores)
              SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= 5
              ORDER BY q_id, rn""")),

    // One Lloyd iteration of PQ codebook training, INTEGER-EXACT and
    // oracle-pinned per component (Similarity.pqTrainIterExact): the
    // assignment is the q83 integer L2 fit, the mean update is
    // round-half-up as floor((2·sum + n)/(2n)) — pure integer sums,
    // floor of the same IEEE quotient — so DuckDB replays the entire
    // k-means step (assign → per-component mean → empty-cluster
    // fallback) value-by-value. The multi-iteration pqTrain stays
    // spec-gated (its avg/round update is not cross-engine exact).
    QEntry("q106_pq_train_iter",
      (s, d) => graft.pipeline.Similarity
        .pqTrainIterExact(Tables.embeddings(s, d), m = 4, ksub = 4, dim = 64)
        .select(col("s"), col("cid"), posexplode(col("cv")))
        .select(col("s"), col("cid"), col("pos"), col("col").as("cv"))
        .orderBy(col("s"), col("cid"), col("pos")),
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              sub AS (
                SELECT vec_id, sg.s, qe[sg.s*16+1 : sg.s*16+16] AS sv
                FROM qz CROSS JOIN (SELECT unnest([0,1,2,3]) AS s) sg),
              seeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
              cb AS (
                SELECT sub.s, seeds.cid, sub.sv AS cv
                FROM sub JOIN seeds USING (vec_id)),
              dots AS (
                SELECT sub.vec_id, sub.s, cb.cid,
                  CAST(list_sum(list_transform(range(len(sub.sv)),
                       i -> sub.sv[i+1] * cb.cv[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM sub JOIN cb ON sub.s = cb.s),
              assign AS (
                SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM dots) WHERE arn = 1),
              comp AS (
                SELECT a.s, a.cid, CAST(t.i AS INTEGER) AS pos, sub.sv[t.i+1] AS v
                FROM assign a
                JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s
                CROSS JOIN range(16) t(i)),
              means AS (
                SELECT s, cid, pos,
                  CAST(floor((2*sum(v) + count(*)) / (2.0*count(*))) AS BIGINT) AS mv
                FROM comp GROUP BY s, cid, pos),
              seedcomp AS (
                SELECT s, cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM cb CROSS JOIN range(16) t(i))
              SELECT sc.s, sc.cid, sc.pos, COALESCE(m.mv, sc.seedv) AS cv
              FROM seedcomp sc
              LEFT JOIN means m ON m.s = sc.s AND m.cid = sc.cid AND m.pos = sc.pos
              ORDER BY sc.s, sc.cid, sc.pos""")),

    // Iterated exact training (q106 chained twice): codebook CONVERGENCE
    // audited cross-engine — the oracle replays assign → mean → assign →
    // mean with generated chained CTEs, pinning every component of the
    // 2-iteration codebook. Spec asserts the Lloyd property holds per
    // step (PqSpec).
    QEntry("q107_pq_train_2iter", {
      val iters = 2
      (s, d) => graft.pipeline.Similarity
        .pqTrainExact(Tables.embeddings(s, d), m = 4, ksub = 4, dim = 64, iters = iters)
        .select(col("s"), col("cid"), posexplode(col("cv")))
        .select(col("s"), col("cid"), col("pos"), col("col").as("cv"))
        .orderBy(col("s"), col("cid"), col("pos"))
    },
      Some {
        val iters = 2
        val steps = (0 until iters).map { i =>
          s"""dots$i AS (
                SELECT sub.vec_id, sub.s, cb$i.cid,
                  CAST(list_sum(list_transform(range(len(sub.sv)),
                       j -> sub.sv[j+1] * cb$i.cv[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb$i.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM sub JOIN cb$i ON sub.s = cb$i.s),
              assign$i AS (
                SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM dots$i) WHERE arn = 1),
              means$i AS (
                SELECT a.s, a.cid, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor((2*sum(sub.sv[t.i+1]) + count(*))
                       / (2.0*count(*))) AS BIGINT) AS mv
                FROM assign$i a
                JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s
                CROSS JOIN range(16) t(i)
                GROUP BY a.s, a.cid, t.i),
              seedc$i AS (
                SELECT s, cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM cb$i CROSS JOIN range(16) t(i)),
              cb${i + 1} AS (
                SELECT sc.s, sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cv
                FROM seedc$i sc
                LEFT JOIN means$i m
                  ON m.s = sc.s AND m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.s, sc.cid)"""
        }.mkString(",\n              ")
        s"""WITH qz AS (
              SELECT vec_id,
                     list_transform(embedding,
                       v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
              FROM embeddings),
            sub AS (
              SELECT vec_id, sg.s, qe[sg.s*16+1 : sg.s*16+16] AS sv
              FROM qz CROSS JOIN (SELECT unnest([0,1,2,3]) AS s) sg),
            seeds AS (
              SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
              FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4)),
            cb0 AS (
              SELECT sub.s, seeds.cid, sub.sv AS cv
              FROM sub JOIN seeds USING (vec_id)),
            $steps
            SELECT s, cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS cv
            FROM cb$iters CROSS JOIN range(16) t(i)
            ORDER BY s, cid, pos"""
      }),

    // Exact-TRAINED IVFADC end to end (the SURVEY §10 round-7 item):
    // q102's residual-coupled search with one integer-exact Lloyd
    // refinement of the residual codebook
    // (ivfPqTopKDot(trainIters = 1) — lloydStepExact, the q106
    // convention), all under the oracle: DuckDB replays coarse
    // assignment, residuals, codebook seeding, the training step
    // (assign → round-half-up mean → empty-cell fallback, as a chained
    // CTE per iteration — the q107 pattern), re-encoding against the
    // TRAINED codebook, probes, and ADC scores. The
    // trained-tightens-fidelity property is spec-pinned
    // (SimilaritySpec); this row pins the trained search's VALUES.
    QEntry("q110_ivfadc_trained", {
      val iters = 1
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        graft.pipeline.Similarity.ivfPqTopKDot(queries, emb,
          nList = 4, m = 4, ksub = 4, dim = 64, k = 5, nProbe = 2,
          trainIters = iters)
          .orderBy(col("q_id"), col("rn"))
      }
    },
      Some {
        val iters = 1
        val trainSteps = (0 until iters).map { i =>
          s"""tdots$i AS (
                SELECT sub.vec_id, sub.s, cb$i.cid,
                  CAST(list_sum(list_transform(range(len(sub.sv)),
                       j -> sub.sv[j+1] * cb$i.cv[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb$i.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM sub JOIN cb$i ON sub.s = cb$i.s),
              tassign$i AS (
                SELECT vec_id, s, cid FROM (
                  SELECT vec_id, s, cid,
                    row_number() OVER (PARTITION BY vec_id, s
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM tdots$i) WHERE arn = 1),
              tmeans$i AS (
                SELECT a.s, a.cid, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor((2*sum(sub.sv[t.i+1]) + count(*))
                       / (2.0*count(*))) AS BIGINT) AS mv
                FROM tassign$i a
                JOIN sub ON sub.vec_id = a.vec_id AND sub.s = a.s
                CROSS JOIN range(16) t(i)
                GROUP BY a.s, a.cid, t.i),
              tseedc$i AS (
                SELECT s, cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM cb$i CROSS JOIN range(16) t(i)),
              cb${i + 1} AS (
                SELECT sc.s, sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cv
                FROM tseedc$i sc
                LEFT JOIN tmeans$i m
                  ON m.s = sc.s AND m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.s, sc.cid)"""
        }.mkString(",\n              ")
        s"""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
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
                -- skip the centroid sources: their residuals are ~zero
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 4 OFFSET 4)),
              cb0 AS (
                SELECT sub.s, pseeds.cid, sub.sv AS cv
                FROM sub JOIN pseeds USING (vec_id)),
              $trainSteps,
              cb AS (SELECT s, cid, cv FROM cb$iters),
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
              ranked AS (
                SELECT q_id, vec_id, score,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY score DESC, vec_id) AS rn
                FROM scores)
              SELECT q_id, vec_id, score, rn FROM ranked WHERE rn <= 5
              ORDER BY q_id, rn"""
      }),

    // Per-doc contamination FLAGS (every non-bench doc kept, zero
    // included) — the state-free projection twin of q80, identical in
    // batch and append-mode streaming (TextAnalysis.contaminationFlags
    // scaladoc; streaming equivalence spec-pinned).
    QEntry("q84_contamination_flags",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val bench = graft.pipeline.TextAnalysis.benchShingleHashSet(
          docs.filter(col("doc_id") % 10 === 0), "doc_id", "text", 8)
        graft.pipeline.TextAnalysis.contaminationFlags(
          docs.filter(col("doc_id") % 10 =!= 0), bench, "doc_id", "text", 8)
          .orderBy(col("doc_id"))
      },
      Some("""WITH sh AS (
                SELECT doc_id, unnest(list_distinct(list_transform(
                  range(1, len(toks) - 6),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                       toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                       toks[i+6] || ' ' || toks[i+7]))) AS g
                FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                      FROM documents)
                WHERE len(toks) >= 8),
              bench AS (SELECT DISTINCT g FROM sh WHERE doc_id % 10 = 0),
              hits AS (
                SELECT s.doc_id, count(*) AS n_contaminated
                FROM sh s JOIN bench b USING (g)
                WHERE s.doc_id % 10 <> 0
                GROUP BY s.doc_id)
              SELECT d.doc_id, CAST(coalesce(h.n_contaminated, 0) AS BIGINT)
                       AS n_contaminated
              FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
              WHERE d.doc_id % 10 <> 0
              ORDER BY d.doc_id""")),

    // Bounded inverted index: per term, document frequency + the first
    // maxPostings doc ids. The cap runs BEFORE the collect (row_number
    // per term, filter, then collect_list) so no executor ever holds a
    // stopword's full posting list — collect_list-then-slice would buffer
    // O(df) per term, which at corpus scale is the whole corpus for
    // common terms.
    QEntry("q82_inverted_index",
      (s, d) => {
        val maxPostings = 20
        val terms = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(array_distinct(split(lower(col("text")), "\\s+"))).as("term"))
        val w = Window.partitionBy(col("term")).orderBy(col("doc_id"))
        terms
          .withColumn("rn", row_number().over(w))
          .groupBy(col("term"))
          .agg(count(lit(1)).as("df"),
            array_join(
              transform(
                sort_array(collect_list(when(col("rn") <= maxPostings, col("doc_id")))),
                x => x.cast("string")),
              ",").as("postings_csv"))
          .orderBy(col("term"))
      },
      Some("""WITH t AS (
                SELECT DISTINCT doc_id,
                  unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS term
                FROM documents)
              SELECT term, count(*) AS df,
                array_to_string((list_sort(list(doc_id)))[1:20], ',') AS postings_csv
              FROM t GROUP BY term ORDER BY term"""))
  )
}
