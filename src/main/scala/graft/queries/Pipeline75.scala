package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 pack, second batch — the MaxSim production candidate path
  * (VERDICT r13 item 5): token-level IVF routing (the q47/q108 coarse
  * quantizer at SLICE grain) generates candidates, q370's late-
  * interaction scorer re-ranks the candidate set only, and recall@5 is
  * scored against the brute-force panel (the q116 eval pattern) — the
  * "eval-grade q370 grows a scale path" composition.
  */
object Pipeline75 {

  /** q370's quantized embedding frame (int64 milli-components). */
  private[graft] def quantEmb(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"),
        graft.pipeline.Similarity.quantize(col("embedding")).as("v"))

  /** The ~30-probe md5 panel flag over a quantized frame — the shared
    * input of the production and eval arms. (Round 18: the per-slice
    * `nm` norm column is gone — [[maxsimOn]]'s fused kernel re-derives
    * the identical IEEE norms in-row, so the checkpoint carries one
    * fewer array column and the interpreted norm `transform` lambda
    * disappears; see expressions/VecSim.scala.) */
  private[graft] def probeNormed(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val stride = math.max(1L, emb.count() / 30L)
    val panelHash =
      conv(substring(md5(col("vec_id").cast("string")), 1, 15),
        16, 10).cast("long")
    emb.withColumn("is_probe", panelHash % stride === 0)
      .localCheckpoint() // slices + probes + rerank sides
  }

  /** nList-row coarse-quantizer dim: seeds = slice 0 of the first
    * nList vectors (the q47 seed convention). Broadcast downstream. */
  private[graft] def coarseCent(emb: org.apache.spark.sql.DataFrame,
      nList: Int): org.apache.spark.sql.DataFrame =
    emb.orderBy(col("vec_id")).limit(nList)
      .select(col("vec_id").as("cid"),
        expr("slice(v, 1, 16)").as("ce"))
      .withColumn("nc",
        expr("aggregate(ce, 0L, (a, x) -> a + x * x)"))
      .localCheckpoint() // small dim, broadcast to every assignment

  /** Assign every 16-dim slice of every vector to its top-`keepTop`
    * centroids by cosine (dot/sqrt(nc), ties to the smaller cid —
    * q47's ordering). O(slices x nList) broadcast products: the IVF
    * BUILD cost, amortized across queries in production. */
  private[graft] def assignSlices(normed: org.apache.spark.sql.DataFrame,
      cent: org.apache.spark.sql.DataFrame, keepTop: Int)
      : org.apache.spark.sql.DataFrame = {
    val sliceScores = normed
      .select(col("vec_id"), col("is_probe"),
        explode(sequence(lit(0), lit(3))).as("k"), col("v"))
      .select(col("vec_id"), col("is_probe"), col("k"),
        expr("slice(v, k * 16 + 1, 16)").as("sv"))
      .join(broadcast(cent), lit(true))
      .select(col("vec_id"), col("is_probe"), col("k"), col("cid"),
        // round 18: fused exact int64 dot (same ordered integer sum as
        // the aggregate(zip_with(...)) lambda it replaces — integer adds
        // are order-free anyway) — the 256-cells-per-vector assignment
        // loop is now whole-stage-codegen'd
        (graft.expressions.functions.dot_long(col("sv"), col("ce"))
          .cast("double") /
          sqrt(col("nc").cast("double"))).as("cs"))
    val wAssign = org.apache.spark.sql.expressions.Window
      .partitionBy(col("vec_id"), col("k"))
      .orderBy(col("cs").desc, col("cid").asc)
    sliceScores
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= keepTop)
  }

  /** q370's integer-micro MaxSim scorer on an explicit (q_id, vec_id)
    * pair frame against the shared normed sides. Round 18 (guide §4 +
    * §2.4): the i-explode + 16 interpreted subCos lambda cells + the
    * (q_id, vec_id) re-aggregation SHUFFLE are replaced by ONE codegen'd
    * kernel call per pair — bit-identical Σᵢ maxⱼ (VecSimSpec pins it
    * differentially against the verbatim HOF on the real corpus; the
    * q370/q383 oracles re-verified at sf0.001 and sf0.01). Pairs are
    * unique, so removing the explode removes the need to re-group. */
  private[graft] def maxsimOn(pairs: org.apache.spark.sql.DataFrame,
      normed: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    pairs
      .join(normed.select(col("vec_id").as("q_id"), col("v").as("qv")),
        "q_id")
      .join(normed.select(col("vec_id"), col("v")), "vec_id")
      .select(col("q_id"), col("vec_id"),
        graft.expressions.functions.maxsim_micro(col("qv"), col("v"))
          .as("maxsim_micro"))

  val entries: Seq[QEntry] = Seq(

    // IVF-routed MaxSim: each 64-dim vector is 4×16-dim token slices
    // (q370's matryoshka stub). A 64-list coarse quantizer (seeds =
    // slice 0 of the first 64 vectors, the q47 seed convention) assigns
    // EVERY corpus slice to its best centroid by cosine (dot/√nc, ties
    // to the smaller cid — q47's ordering); each probe-panel query
    // slice routes to its top-2 centroids, and a doc is a CANDIDATE if
    // any of its slices lives in any routed list (token-level routing:
    // MaxSim matches any query slice against any doc slice, so
    // any-overlap is the correct candidate predicate). q370's integer-
    // micro MaxSim then scores ONLY the candidate pairs; the brute-
    // force top-5 over the full corpus (q370's own ranking) is the
    // ground truth. Emits per probe: candidate count (the sub-linear-
    // cost evidence — SCALE.md records the fraction), hits@5 and
    // recall@5 in bp. Every stage — seeds, assignment ties, routing,
    // both rankings, the intersection — replays in the oracle.
    QEntry("q383_maxsim_ivf_rerank",
      (s, d) => {
        // Round 18 (guide §2.5 parallelism, the q192/Pipeline12 pattern):
        // JobProfile measured this query as 29 jobs × exactly ONE task
        // each — the small scan checkpoints as 1 partition and every
        // downstream stage (assignment 1.5 s, candidate maxsim 1.7 s,
        // brute-force maxsim 3.6 s of task time) ran serially with 31
        // idle cores. Key-hash repartition of the slim (vec_id, v) rows
        // BEFORE the checkpoint gives every consumer the session's
        // parallelism; at real scale the scan has many splits and this
        // exchange is noise relative to the kernels it feeds.
        val emb = quantEmb(s, d)
          .repartition(s.sparkContext.defaultParallelism, col("vec_id"))
          .localCheckpoint()
        val normed = probeNormed(emb)
        // 64-list coarse quantizer over the shared 16-dim slice space
        // (the gate pins 64; tools.IvfScale measures 64/256/1024)
        val cent = coarseCent(emb, 64)
        val ranked = assignSlices(normed, cent, 2)
          .localCheckpoint() // (vec, k) -> clusters; both routing sides
        val docLists = ranked.filter(!col("is_probe") && col("arn") === 1)
          .select(col("vec_id"), col("cid").as("cluster")).distinct()
        val routes = ranked.filter(col("is_probe"))
          .select(col("vec_id").as("q_id"), col("cid").as("cluster"))
          .distinct()
        val cands = routes.join(docLists, "cluster")
          .select(col("q_id"), col("vec_id")).distinct()
          .localCheckpoint() // candidate pairs: rerank + count
        val nCands = cands.groupBy(col("q_id"))
          .agg(count(lit(1)).as("n_candidates"))
        // q370's scorer, verbatim, via the shared maxsimOn
        def maxsim(pairs: org.apache.spark.sql.DataFrame) =
          maxsimOn(pairs, normed)
        val wRank = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("maxsim_micro").desc, col("vec_id").asc)
        val annTop = maxsim(cands)
          .withColumn("rank", row_number().over(wRank))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id"))
        val exactPairs = normed.filter(!col("is_probe"))
          .select(col("vec_id"))
          .crossJoin(broadcast(normed.filter(col("is_probe"))
            .select(col("vec_id").as("q_id"))))
          .select(col("q_id"), col("vec_id"))
        val exactTop = maxsim(exactPairs)
          .withColumn("rank", row_number().over(wRank))
          .filter(col("rank") <= 5)
          .select(col("q_id"), col("vec_id"))
        val hits = annTop.join(exactTop, Seq("q_id", "vec_id"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
        exactTop.select(col("q_id")).distinct()
          .join(nCands, Seq("q_id"), "left")
          .join(hits, Seq("q_id"), "left")
          .select(col("q_id"),
            coalesce(col("n_candidates"), lit(0L)).as("n_candidates"),
            coalesce(col("n_hits"), lit(0L)).as("n_hits"))
          .withColumn("recall_bp", expr("n_hits * 10000 div 5"))
          .orderBy(col("q_id"))
      },
      Some("""WITH ez AS (
                SELECT vec_id,
                  list_transform(embedding, x ->
                    CAST(round(CAST(x AS DOUBLE) * 10000.0) AS BIGINT))
                    AS v
                FROM embeddings),
              st AS (
                SELECT greatest(1, count(*) // 30) AS stride FROM ez),
              pz AS (
                SELECT vec_id, v,
                  ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                    ::BIGINT % st.stride = 0 AS is_probe
                FROM ez, st),
              cent AS (
                SELECT vec_id AS cid,
                  list_transform(range(16), t -> v[t + 1]) AS ce
                FROM (SELECT vec_id, v FROM ez ORDER BY vec_id LIMIT 64)),
              cfit AS (
                SELECT p.vec_id, p.is_probe, k.k, c.cid,
                  CAST(list_sum(list_transform(range(16), t ->
                    p.v[k.k * 16 + t + 1] * c.ce[t + 1])) AS DOUBLE)
                  / sqrt(CAST(list_sum(list_transform(c.ce, x -> x * x))
                      AS DOUBLE)) AS cs
                FROM pz p, (SELECT unnest(range(4)) AS k) k, cent c),
              ranked AS (
                SELECT vec_id, is_probe, k, cid, arn FROM (
                  SELECT vec_id, is_probe, k, cid,
                    row_number() OVER (PARTITION BY vec_id, k
                      ORDER BY cs DESC, cid) AS arn
                  FROM cfit) WHERE arn <= 2),
              doclists AS (
                SELECT DISTINCT vec_id, cid AS cluster FROM ranked
                WHERE NOT is_probe AND arn = 1),
              routes AS (
                SELECT DISTINCT vec_id AS q_id, cid AS cluster
                FROM ranked WHERE is_probe),
              cands AS (
                SELECT DISTINCT r.q_id, d.vec_id
                FROM routes r JOIN doclists d ON d.cluster = r.cluster),
              ncand AS (
                SELECT q_id, count(*) AS n_candidates FROM cands
                GROUP BY q_id),
              qv AS (SELECT vec_id AS q_id, v AS qv FROM pz
                     WHERE is_probe),
              cv AS (SELECT vec_id, v FROM pz WHERE NOT is_probe),
              anncells AS (
                SELECT ca.q_id, ca.vec_id, i.i,
                  list_max(list_transform(range(4), j ->
                    CAST(round(
                      CAST(list_sum(list_transform(range(16), t ->
                        q.qv[i.i * 16 + t + 1] * c.v[j * 16 + t + 1]))
                        AS DOUBLE) /
                      (sqrt(CAST(list_sum(list_transform(range(16),
                        t -> q.qv[i.i * 16 + t + 1]
                          * q.qv[i.i * 16 + t + 1])) AS DOUBLE)) *
                       sqrt(CAST(list_sum(list_transform(range(16),
                        t -> c.v[j * 16 + t + 1]
                          * c.v[j * 16 + t + 1])) AS DOUBLE)))
                      * 1000000.0) AS BIGINT))) AS best_micro
                FROM cands ca
                JOIN qv q ON q.q_id = ca.q_id
                JOIN cv c ON c.vec_id = ca.vec_id,
                  (SELECT unnest(range(4)) AS i) i),
              annms AS (
                SELECT q_id, vec_id, sum(best_micro) AS maxsim_micro
                FROM anncells GROUP BY q_id, vec_id),
              anntop AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY maxsim_micro DESC, vec_id) AS rank
                  FROM annms) WHERE rank <= 5),
              excells AS (
                SELECT q.q_id, c.vec_id, i.i,
                  list_max(list_transform(range(4), j ->
                    CAST(round(
                      CAST(list_sum(list_transform(range(16), t ->
                        q.qv[i.i * 16 + t + 1] * c.v[j * 16 + t + 1]))
                        AS DOUBLE) /
                      (sqrt(CAST(list_sum(list_transform(range(16),
                        t -> q.qv[i.i * 16 + t + 1]
                          * q.qv[i.i * 16 + t + 1])) AS DOUBLE)) *
                       sqrt(CAST(list_sum(list_transform(range(16),
                        t -> c.v[j * 16 + t + 1]
                          * c.v[j * 16 + t + 1])) AS DOUBLE)))
                      * 1000000.0) AS BIGINT))) AS best_micro
                FROM qv q, cv c, (SELECT unnest(range(4)) AS i) i),
              exms AS (
                SELECT q_id, vec_id, sum(best_micro) AS maxsim_micro
                FROM excells GROUP BY q_id, vec_id),
              extop AS (
                SELECT q_id, vec_id FROM (
                  SELECT q_id, vec_id,
                    row_number() OVER (PARTITION BY q_id
                      ORDER BY maxsim_micro DESC, vec_id) AS rank
                  FROM exms) WHERE rank <= 5),
              hits AS (
                SELECT q_id, count(*) AS n_hits
                FROM anntop JOIN extop USING (q_id, vec_id)
                GROUP BY q_id)
              SELECT e.q_id,
                CAST(coalesce(n.n_candidates, 0) AS BIGINT)
                  AS n_candidates,
                CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
                coalesce(h.n_hits, 0) * 10000 // 5 AS recall_bp
              FROM (SELECT DISTINCT q_id FROM extop) e
              LEFT JOIN ncand n USING (q_id)
              LEFT JOIN hits h USING (q_id)
              ORDER BY e.q_id"""))
  )
}
