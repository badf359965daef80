package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, sixteenth batch — retrieval-serving planners: RAG
  * chunking geometry and the recall cost of int8 storage (q348's
  * quantization grid meeting q145's recall-eval discipline).
  */
object Pipeline68 {

  val entries: Seq[QEntry] = Seq(

    // RAG chunk-geometry planner: for chunk sizes {64, 128, 256} with
    // 1/8 overlap, the corpus-wide chunking bill — chunks, overlap-
    // duplicated tokens, last-chunk padding, utilization — all closed-
    // form integer arithmetic on the token-count column (ceil via
    // (a+b−1) div b on nonnegatives): one scan, a 3-cell grid, no text
    // manipulation. The "what does this chunk size cost at corpus
    // scale" readout behind any embedding-index build.
    QEntry("q368_rag_chunk_planner",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(graft.pipeline.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("tok"))
        val grid = s.range(0, 3)
          .select(expr("CAST(64 * pow(2, id) AS BIGINT)").as("cs"))
          .withColumn("ov", expr("cs div 8"))
        toks.crossJoin(broadcast(grid))
          .select(col("cs"), col("ov"), col("tok"),
            when(col("tok") <= col("cs"), 1L)
              .otherwise(expr("1 + (tok - cs + (cs - ov) - 1) " +
                "div (cs - ov)")).as("n_chunks"))
          .withColumn("dup_tokens", (col("n_chunks") - 1L) * col("ov"))
          .withColumn("last_fill",
            col("tok") - (col("n_chunks") - 1L) * (col("cs") - col("ov")))
          .withColumn("padding", col("cs") - col("last_fill"))
          .groupBy(col("cs"), col("ov"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("tok")).as("corpus_tokens"),
            sum(col("n_chunks")).as("total_chunks"),
            sum(col("dup_tokens")).as("dup_tokens"),
            sum(col("padding")).as("padding_tokens"))
          .withColumn("utilization_bp",
            expr("corpus_tokens * 10000 div (total_chunks * cs)"))
          .orderBy(col("cs"))
      },
      Some("""WITH toks AS (
                SELECT CAST(len(string_split_regex(lower(text), '\s+'))
                  AS BIGINT) AS tok
                FROM documents),
              grid AS (
                SELECT cs, cs // 8 AS ov
                FROM (SELECT unnest([64, 128, 256]) AS cs)),
              c AS (
                SELECT g.cs, g.ov, t.tok,
                  CASE WHEN t.tok <= g.cs THEN 1
                    ELSE 1 + (t.tok - g.cs + (g.cs - g.ov) - 1)
                      // (g.cs - g.ov) END AS n_chunks
                FROM toks t, grid g),
              e AS (
                SELECT cs, ov, tok, n_chunks,
                  (n_chunks - 1) * ov AS dup_tokens,
                  cs - (tok - (n_chunks - 1) * (cs - ov)) AS padding
                FROM c)
              SELECT CAST(cs AS BIGINT) AS cs, CAST(ov AS BIGINT) AS ov,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(tok) AS BIGINT) AS corpus_tokens,
                CAST(sum(n_chunks) AS BIGINT) AS total_chunks,
                CAST(sum(dup_tokens) AS BIGINT) AS dup_tokens,
                CAST(sum(padding) AS BIGINT) AS padding_tokens,
                CAST(sum(tok) * 10000 // (sum(n_chunks) * cs) AS BIGINT)
                  AS utilization_bp
              FROM e GROUP BY cs, ov
              ORDER BY cs""")),

    // Recall cost of int8 storage: exact top-10 cosine neighbours (the
    // 1e4 grid, q342's panel + ranking) vs top-10 over the q348
    // asymmetric-affine int8 round trip — recall@10 and top-1 survival
    // per probe. This is the decision-closing readout for q348: the
    // planner says what the error IS, this says what the error DOES to
    // retrieval. Both arms share one corpus scan shape; the int8 arm
    // dequantizes through the broadcast 64-row per-dim stats.
    QEntry("q369_quantized_recall",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"),
            graft.pipeline.Similarity.quantize(col("embedding")).as("qe"))
          .localCheckpoint() // feeds stats, both arms, both sides
        // md5-hashed panel draw (id-density-free; ADVICE/SCALE r13)
        val stride = math.max(1L, emb.count() / 30L)
        val panelHash =
          conv(substring(md5(col("vec_id").cast("string")), 1, 15),
            16, 10).cast("long")
        val stats = emb
          .select(posexplode(col("qe")))
          .groupBy(col("pos"))
          .agg(min(col("col")).as("vmin"), max(col("col")).as("vmax"))
          .withColumn("range_q",
            greatest(lit(1L), col("vmax") - col("vmin")))
          .select(col("pos"), col("vmin"), col("range_q"))
          .orderBy(col("pos"))
          .agg(collect_list(col("vmin")).as("mins"),
            collect_list(col("range_q")).as("ranges"))
          .localCheckpoint() // one row: the per-dim affine table
        val deq = emb.crossJoin(broadcast(stats))
          .select(col("vec_id"),
            expr("zip_with(qe, zip_with(mins, ranges, (mn, rg) -> " +
              "struct(mn AS mn, rg AS rg)), (v, s) -> " +
              "s.mn + ((v - s.mn) * 255 div s.rg) * s.rg div 255)")
              .as("de"))
          .localCheckpoint()
        def top10(vecs: org.apache.spark.sql.DataFrame, vcol: String,
            label: String) = {
          val probes = vecs.filter(panelHash % stride === 0)
            .select(col("vec_id").as("q_id"), col(vcol).as("qv"))
          val scored = vecs.filter(panelHash % stride =!= 0)
            .join(broadcast(probes), lit(true))
            .select(col("q_id"), col("vec_id"),
              graft.expressions.functions.dot_long(col("qv"), col(vcol))
                .as("dot"),
              graft.expressions.functions.dot_long(col("qv"), col("qv"))
                .as("na"),
              graft.expressions.functions.dot_long(col(vcol), col(vcol))
                .as("nb"))
            .withColumn("cos",
              col("dot") / (sqrt(col("na")) * sqrt(col("nb"))))
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("vec_id").asc)
          scored.withColumn("rn", row_number().over(w))
            .filter(col("rn") <= 10)
            .select(col("q_id"), col("vec_id"),
              col("rn").cast("long").as(label))
        }
        val exact = top10(emb, "qe", "r_exact")
        val coarse = top10(deq, "de", "r_int8")
        exact.join(coarse, Seq("q_id", "vec_id"), "full")
          .groupBy(col("q_id"))
          .agg(sum(when(col("r_exact").isNotNull &&
              col("r_int8").isNotNull, 1L).otherwise(0L))
              .as("n_overlap"),
            max(when(col("r_exact") === 1L,
              coalesce(col("r_int8"), lit(0L))).otherwise(lit(0L)))
              .as("top1_int8_rank"))
          .select(col("q_id"),
            (col("n_overlap") * 1000L).as("overlap_milli"),
            (col("top1_int8_rank") === 1L).cast("boolean")
              .as("top1_survives"))
          .orderBy(col("q_id"))
      },
      Some("""WITH ez AS (
                SELECT vec_id,
                  list_transform(embedding, v ->
                    CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS qe
                FROM embeddings),
              st AS (
                SELECT greatest(1, count(*) // 30) AS stride FROM ez),
              dimstats AS (
                SELECT i AS pos, min(qe[i + 1]) AS vmin,
                  greatest(1, max(qe[i + 1]) - min(qe[i + 1])) AS rg
                FROM ez, (SELECT unnest(range(64)) AS i) t
                GROUP BY i),
              dims AS (
                SELECT list(vmin ORDER BY pos) AS mins,
                  list(rg ORDER BY pos) AS rgs
                FROM dimstats),
              dz AS (
                SELECT vec_id,
                  list_transform(range(64), i ->
                    mins[i + 1] + ((qe[i + 1] - mins[i + 1]) * 255
                      // rgs[i + 1]) * rgs[i + 1] // 255) AS de
                FROM ez, dims),
              px AS (SELECT vec_id AS q_id, qe AS qv FROM ez, st
                     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % st.stride = 0),
              cx AS (SELECT vec_id, qe FROM ez, st
                     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % st.stride <> 0),
              sx AS (
                SELECT q_id, vec_id,
                  CAST(list_sum(list_transform(range(64), i ->
                    qv[i+1] * qe[i+1])) AS DOUBLE) /
                  (sqrt(CAST(list_sum(list_transform(qv, x -> x*x))
                    AS DOUBLE)) *
                   sqrt(CAST(list_sum(list_transform(qe, x -> x*x))
                    AS DOUBLE))) AS cos
                FROM px, cx),
              tx AS (
                SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS r_exact
                FROM sx QUALIFY r_exact <= 10),
              pd AS (SELECT vec_id AS q_id, de AS qv FROM dz, st
                     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % st.stride = 0),
              cd AS (SELECT vec_id, de FROM dz, st
                     WHERE ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % st.stride <> 0),
              sd AS (
                SELECT q_id, vec_id,
                  CAST(list_sum(list_transform(range(64), i ->
                    qv[i+1] * de[i+1])) AS DOUBLE) /
                  (sqrt(CAST(list_sum(list_transform(qv, x -> x*x))
                    AS DOUBLE)) *
                   sqrt(CAST(list_sum(list_transform(de, x -> x*x))
                    AS DOUBLE))) AS cos
                FROM pd, cd),
              td AS (
                SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY cos DESC, vec_id) AS r_int8
                FROM sd QUALIFY r_int8 <= 10)
              SELECT q_id,
                CAST(sum(CASE WHEN tx.r_exact IS NOT NULL
                  AND td.r_int8 IS NOT NULL THEN 1 ELSE 0 END) * 1000
                  AS BIGINT) AS overlap_milli,
                max(CASE WHEN tx.r_exact = 1
                  THEN coalesce(td.r_int8, 0) ELSE 0 END) = 1
                  AS top1_survives
              FROM tx FULL JOIN td USING (q_id, vec_id)
              GROUP BY q_id
              ORDER BY q_id"""))
  )
}
