package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, sixth batch — two curation decisions the dedup/ANN
  * families stop short of: WHICH duplicate to keep (the keep-policy
  * audit), and WHICH negatives to train on (hard-negative mining for
  * retrieval/embedding training data).
  */
object Pipeline58 {

  val entries: Seq[QEntry] = Seq(

    // Keep-policy audit: near-dup clusters carry a product decision —
    // keep the earliest member (stable ids), the longest (maximum
    // content), or the highest-quality (stopword-ratio score). The
    // fixture plants 3-member clusters per 7th doc (base, a padded
    // variant, a half-truncation); per policy the audit reports
    // clusters, retained vs dropped tokens, and agreement with the
    // earliest-member baseline in basis points. Keeper selection is a
    // per-cluster window over ≤3 rows/key (bounded), melted once —
    // policy cost is independent of cluster count beyond one shuffle.
    QEntry("q341_keep_policy_audit",
      (s, d) => {
        val base = Tables.documents(s, d)
          .filter(col("doc_id") % 7 === 0)
          .select(col("doc_id"), col("text"))
        val members = base
          .select(col("doc_id").as("cluster_id"),
            col("doc_id").as("member_id"), col("text"))
          .union(base.select(col("doc_id"),
            (col("doc_id") + 10000000L).as("member_id"),
            concat(col("text"), lit(" quality pad xyz"))))
          .union(base.select(col("doc_id"),
            (col("doc_id") + 20000000L).as("member_id"),
            col("text").substr(lit(1),
              (length(col("text")) / 2).cast("int"))))
        val feat = members.select(col("cluster_id"), col("member_id"),
          graft.pipeline.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("tok"),
          graft.pipeline.TextAnalysis.stopwordCount(col("text"))
            .cast("long").as("stop"))
          .withColumn("q_ppm",
            expr("stop * 1000000 div greatest(1L, tok)"))
          .localCheckpoint() // three keeper rankings + the token sums
        def keeper(policy: String, order: Seq[org.apache.spark.sql.Column]) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster_id")).orderBy(order: _*)
          feat.withColumn("rn", row_number().over(w))
            .withColumn("policy", lit(policy))
        }
        val ranked = keeper("earliest", Seq(col("member_id").asc))
          .union(keeper("longest",
            Seq(col("tok").desc, col("member_id").asc)))
          .union(keeper("quality",
            Seq(col("q_ppm").desc, col("member_id").asc)))
          .localCheckpoint() // stats + the agreement join
        val stats = ranked.groupBy(col("policy"))
          .agg(sum(when(col("rn") === 1, lit(1L)).otherwise(0L))
            .as("n_clusters"),
            sum(when(col("rn") === 1, col("tok")).otherwise(0L))
              .as("retained_tokens"),
            sum(when(col("rn") > 1, col("tok")).otherwise(0L))
              .as("dropped_tokens"))
        val keepers = ranked.filter(col("rn") === 1)
          .select(col("policy"), col("cluster_id"), col("member_id"))
        val agree = keepers
          .join(keepers.filter(col("policy") === "earliest")
            .select(col("cluster_id"), col("member_id").as("base_keep")),
            "cluster_id")
          .groupBy(col("policy"))
          .agg(expr("sum(CASE WHEN member_id = base_keep THEN 1 ELSE 0 " +
            "END) * 10000 div count(1)").as("agree_earliest_bp"))
        stats.join(agree, "policy").orderBy(col("policy"))
      },
      Some("""WITH base AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 7 = 0),
              members AS (
                SELECT doc_id AS cluster_id, doc_id AS member_id, text
                FROM base
                UNION ALL
                SELECT doc_id, doc_id + 10000000,
                  text || ' quality pad xyz' FROM base
                UNION ALL
                SELECT doc_id, doc_id + 20000000,
                  substr(text, 1, CAST(length(text) // 2 AS BIGINT))
                FROM base),
              feat AS (
                SELECT cluster_id, member_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok,
                  CAST(len(list_filter(
                    string_split_regex(lower(text), '\s+'),
                    x -> x IN ('the', 'a', 'of', 'and', 'to', 'in',
                      'is', 'on', 'for', 'with'))) AS BIGINT) AS stop
                FROM members),
              featq AS (
                SELECT *, stop * 1000000 // greatest(1, tok) AS q_ppm
                FROM feat),
              ranked AS (
                SELECT 'earliest' AS policy, cluster_id, member_id, tok,
                  row_number() OVER (PARTITION BY cluster_id
                    ORDER BY member_id) AS rn
                FROM featq
                UNION ALL
                SELECT 'longest', cluster_id, member_id, tok,
                  row_number() OVER (PARTITION BY cluster_id
                    ORDER BY tok DESC, member_id)
                FROM featq
                UNION ALL
                SELECT 'quality', cluster_id, member_id, tok,
                  row_number() OVER (PARTITION BY cluster_id
                    ORDER BY q_ppm DESC, member_id)
                FROM featq),
              stats AS (
                SELECT policy,
                  sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS n_clusters,
                  sum(CASE WHEN rn = 1 THEN tok ELSE 0 END)
                    AS retained_tokens,
                  sum(CASE WHEN rn > 1 THEN tok ELSE 0 END)
                    AS dropped_tokens
                FROM ranked GROUP BY policy),
              keepers AS (
                SELECT policy, cluster_id, member_id FROM ranked
                WHERE rn = 1),
              agree AS (
                SELECT k.policy,
                  sum(CASE WHEN k.member_id = b.member_id THEN 1
                      ELSE 0 END) * 10000 // count(*) AS agree_earliest_bp
                FROM keepers k
                JOIN keepers b ON b.policy = 'earliest'
                  AND b.cluster_id = k.cluster_id
                GROUP BY k.policy)
              SELECT policy, CAST(n_clusters AS BIGINT) AS n_clusters,
                CAST(retained_tokens AS BIGINT) AS retained_tokens,
                CAST(dropped_tokens AS BIGINT) AS dropped_tokens,
                CAST(agree_earliest_bp AS BIGINT) AS agree_earliest_bp
              FROM stats JOIN agree USING (policy)
              ORDER BY policy""")),

    // Hard-negative mining for embedding/retrieval training: per query
    // vector (every 50th), negatives must carry a DIFFERENT label;
    // `hard` = the 5 most cosine-similar wrong-label vectors (the
    // gradient-rich ones), `easy` = 5 deterministic md5-coin picks
    // from the same wrong-label pool (the contrast batch). Quantized
    // int64 dots (the q36 kernel), one broadcast of the bounded query
    // set, two rankings over one scored frame — no second scan.
    QEntry("q342_hard_negatives",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), col("embedding"), col("label"))
        // scale-adaptive probe panel: stride = n div 30 keeps the
        // broadcast query set at ~30 vectors at ANY corpus size, so
        // the brute-force score stays LINEAR in the corpus (a fixed
        // "% 50" panel grew with the fixture and the 100× replica
        // spent >4 min sorting 450M scored rows; mining for an
        // unbounded query set belongs to the bucketed ANN family —
        // q104's path). One count job, the Detector-style driver read.
        // Panel membership hashes the id first (ADVICE/SCALE r13: a
        // raw `vec_id % stride` panel is id-DENSITY-dependent — on
        // the sparse-id 100× replica it selected 1 probe instead of
        // ~30 and the SCALE row under-measured; an md5-uniform draw
        // selects ~n/stride probes under ANY id distribution).
        val stride = math.max(1L, emb.count() / 30L)
        val panelHash =
          conv(substring(md5(col("vec_id").cast("string")), 1, 15),
            16, 10).cast("long")
        val queries = emb.filter(panelHash % stride === 0)
          .select(col("vec_id").as("q_id"),
            graft.pipeline.Similarity.quantize(col("embedding"))
              .as("qe"), col("label").as("q_label"))
        val corpus = emb.select(col("vec_id"),
          graft.pipeline.Similarity.quantize(col("embedding")).as("ce"),
          col("label"))
        val scored = corpus.join(broadcast(queries), lit(true))
          .filter(col("label") =!= col("q_label"))
          .select(col("q_id"), col("vec_id"),
            graft.expressions.functions.dot_long(col("qe"), col("ce"))
              .as("dot"),
            graft.expressions.functions.dot_long(col("qe"), col("qe"))
              .as("na"),
            graft.expressions.functions.dot_long(col("ce"), col("ce"))
              .as("nb"))
          .withColumn("cos", col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
          .withColumn("coin", md5(concat(col("q_id").cast("string"),
            lit(":"), col("vec_id").cast("string"))))
          .localCheckpoint() // two rankings over one scored frame
        def pick(kind: String, order: Seq[org.apache.spark.sql.Column]) = {
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id")).orderBy(order: _*)
          scored.withColumn("rank", row_number().over(w))
            .filter(col("rank") <= 5)
            .select(col("q_id"), col("vec_id").as("neg_id"),
              lit(kind).as("kind"), col("rank").cast("long").as("rank"),
              col("dot"))
        }
        pick("hard", Seq(col("cos").desc, col("vec_id").asc))
          .union(pick("easy", Seq(col("coin").asc, col("vec_id").asc)))
          .orderBy(col("q_id"), col("kind"), col("rank"))
      },
      Some("""WITH qz AS (
                SELECT vec_id AS q_id, label AS q_label,
                  list_transform(embedding, v ->
                    CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS qe
                FROM embeddings WHERE
                  ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                    ::BIGINT %
                  (SELECT greatest(1, count(*) // 30) FROM embeddings)
                  = 0),
              cz AS (
                SELECT vec_id, label,
                  list_transform(embedding, v ->
                    CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS ce
                FROM embeddings),
              scored AS (
                SELECT q_id, vec_id,
                  CAST(list_sum(list_transform(range(len(qe)),
                    i -> qe[i+1] * ce[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT)
                    AS na,
                  CAST(list_sum(list_transform(ce, x -> x*x)) AS BIGINT)
                    AS nb,
                  md5(CAST(q_id AS VARCHAR) || ':' ||
                    CAST(vec_id AS VARCHAR)) AS coin
                FROM qz, cz WHERE cz.label <> qz.q_label),
              hard AS (
                SELECT q_id, vec_id AS neg_id, 'hard' AS kind,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id)
                    AS BIGINT) AS rank,
                  dot
                FROM scored),
              easy AS (
                SELECT q_id, vec_id, 'easy',
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY coin, vec_id) AS BIGINT) AS rank,
                  dot
                FROM scored)
              SELECT q_id, neg_id, kind, rank, dot
              FROM (SELECT * FROM hard WHERE rank <= 5
                    UNION ALL SELECT * FROM easy WHERE rank <= 5)
              ORDER BY q_id, kind, rank"""))
  )
}
