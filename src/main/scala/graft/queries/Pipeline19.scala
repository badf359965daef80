package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3, seventh pack: k-center coreset selection and
  * NDCG ranking evaluation. Conventions unchanged.
  */
object Pipeline19 {

  val entries: Seq[QEntry] = Seq(

    // Greedy k-center coreset per label (farthest-point traversal,
    // k = 4): seed = the label's smallest vec_id, then each pick is the
    // candidate maximizing its MINIMUM distance to the selected set —
    // the 2-approximation diverse-exemplar selection a training-data
    // curator runs per class. Distances stay as exact integer squared
    // L2 on quantized vectors: d² = na + nb − 2·dot (no sqrt — argmax
    // is monotone in d²), so the whole trajectory replays. Each step:
    // one join of the label's vectors against the ≤ 3-row selected
    // set + one per-label argmax window; nothing pairwise beyond
    // candidates × selected.
    QEntry("q221_kcenter_coreset",
      (s, d) => {
        val vz = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label"),
            graft.expressions.functions.quantize_vec(col("embedding"),
              10000.0).as("ce"))
          .withColumn("nb",
            graft.expressions.functions.dot_long(col("ce"), col("ce")))
          .localCheckpoint() // candidates re-read by every greedy step
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("label"))
          .orderBy(col("mind2").desc, col("vec_id"))
        val s1 = vz.groupBy(col("label")).agg(min(col("vec_id")).as("vec_id"))
          .join(vz, Seq("label", "vec_id"))
          .select(col("label"), col("vec_id"), col("ce"), col("nb"),
            lit(0L).as("mind2"), lit(1L).as("pick"))
        def step(sel: org.apache.spark.sql.DataFrame, pick: Long) = {
          val selV = sel.select(col("label"), col("vec_id").as("sid"),
            col("ce").as("se"), col("nb").as("sn"))
          vz.join(sel.groupBy(col("label"))
              .agg(collect_set(col("vec_id")).as("taken")), "label")
            .filter(!array_contains(col("taken"), col("vec_id")))
            .join(selV, "label")
            .select(col("label"), col("vec_id"), col("ce"), col("nb"),
              (col("nb") + col("sn") -
                lit(2L) * graft.expressions.functions.dot_long(
                  col("ce"), col("se"))).as("d2"))
            .groupBy(col("label"), col("vec_id"))
            .agg(first(col("ce")).as("ce"), first(col("nb")).as("nb"),
              min(col("d2")).as("mind2"))
            .withColumn("r", row_number().over(w))
            .filter(col("r") === 1)
            .select(col("label"), col("vec_id"), col("ce"), col("nb"),
              col("mind2"), lit(pick).as("pick"))
        }
        val s2 = step(s1, 2).localCheckpoint()
        val s3 = step(s1.unionByName(s2), 3).localCheckpoint()
        val s4 = step(s1.unionByName(s2).unionByName(s3), 4)
        s1.unionByName(s2).unionByName(s3).unionByName(s4)
          .select(col("label"), col("pick"), col("vec_id"), col("mind2"))
          .orderBy(col("label"), col("pick"))
      },
      Some("""WITH vz AS (
                SELECT vec_id, label,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS ce
                FROM embeddings),
              vn AS (
                SELECT vec_id, label, ce,
                  CAST(list_sum(list_transform(ce, x -> x*x)) AS BIGINT)
                    AS nb
                FROM vz),
              s1 AS (
                SELECT label, min(vec_id) AS vec_id FROM vn GROUP BY label),
              d2 AS (
                SELECT a.label, a.vec_id, b.vec_id AS sid,
                  a.nb + b.nb - 2 * CAST(list_sum(list_transform(
                    range(len(a.ce)), i -> a.ce[i+1] * b.ce[i+1]))
                    AS BIGINT) AS d2
                FROM vn a JOIN vn b ON b.label = a.label
                  AND b.vec_id != a.vec_id),
              m2 AS (
                SELECT d2.label, d2.vec_id, min(d2.d2) AS mind2
                FROM d2 JOIN s1 ON s1.label = d2.label
                  AND s1.vec_id = d2.sid
                GROUP BY 1, 2),
              s2 AS (
                SELECT label, vec_id, mind2 FROM m2
                QUALIFY row_number() OVER (PARTITION BY label
                  ORDER BY mind2 DESC, vec_id) = 1),
              sel2 AS (
                SELECT label, vec_id FROM s1
                UNION ALL SELECT label, vec_id FROM s2),
              m3 AS (
                SELECT d2.label, d2.vec_id, min(d2.d2) AS mind2
                FROM d2 JOIN sel2 ON sel2.label = d2.label
                  AND sel2.vec_id = d2.sid
                WHERE NOT EXISTS (SELECT 1 FROM sel2 x
                  WHERE x.label = d2.label AND x.vec_id = d2.vec_id)
                GROUP BY 1, 2),
              s3 AS (
                SELECT label, vec_id, mind2 FROM m3
                QUALIFY row_number() OVER (PARTITION BY label
                  ORDER BY mind2 DESC, vec_id) = 1),
              sel3 AS (
                SELECT label, vec_id FROM sel2
                UNION ALL SELECT label, vec_id FROM s3),
              m4 AS (
                SELECT d2.label, d2.vec_id, min(d2.d2) AS mind2
                FROM d2 JOIN sel3 ON sel3.label = d2.label
                  AND sel3.vec_id = d2.sid
                WHERE NOT EXISTS (SELECT 1 FROM sel3 x
                  WHERE x.label = d2.label AND x.vec_id = d2.vec_id)
                GROUP BY 1, 2),
              s4 AS (
                SELECT label, vec_id, mind2 FROM m4
                QUALIFY row_number() OVER (PARTITION BY label
                  ORDER BY mind2 DESC, vec_id) = 1),
              allp AS (
                SELECT label, 1 AS pick, vec_id, 0 AS mind2 FROM s1
                UNION ALL SELECT label, 2, vec_id, mind2 FROM s2
                UNION ALL SELECT label, 3, vec_id, mind2 FROM s3
                UNION ALL SELECT label, 4, vec_id, mind2 FROM s4)
              SELECT CAST(label AS INT) AS label, CAST(pick AS BIGINT)
                  AS pick,
                vec_id, CAST(mind2 AS BIGINT) AS mind2
              FROM allp ORDER BY label, pick""")),

    // NDCG@5 of the BM25 ranking against DERIVED graded relevance
    // (rel 3 = same source AND lang as the query doc, 2 = same source,
    // 1 = same lang, 0 otherwise — both engines derive it identically):
    // DCG = Σ rel·disc(rank) with the log2 discount rounded to integer
    // micro units per rank (the q184 ln convention — order-independent
    // sums), IDCG from the ideal reordering of the SAME 5 graded hits,
    // ndcg_bp = dcg·10⁴ div idcg. The ranking-quality eval that sits
    // beside recall@k (q116) in an index owner's dashboard. Scale:
    // the q128 search chain + one 5-rows-per-query grade join + two
    // per-query rollups.
    QEntry("q222_ndcg_eval",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val qs = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("q_id"),
            array_join(slice(split(lower(col("text")), "\\s+"), 1, 6), " ")
              .as("qtext"))
        val hits = graft.pipeline.Retrieval
          .bm25Search(qs, docs, "doc_id", "text", k = 5)
          .select(col("q_id"), col("doc_id").as("id"),
            col("rn").cast("long").as("rn"))
        val meta = docs.select(col("doc_id"), col("source"), col("lang"))
        val graded = hits
          .join(meta.select(col("doc_id").as("q_id"),
            col("source").as("q_src"), col("lang").as("q_lang")), "q_id")
          .join(meta.select(col("doc_id").as("id"),
            col("source").as("h_src"), col("lang").as("h_lang")), "id")
          .select(col("q_id"), col("id"), col("rn"),
            (when(col("q_src") === col("h_src"), 2L).otherwise(0L) +
             when(col("q_lang") === col("h_lang"), 1L).otherwise(0L))
              .as("rel"))
          .localCheckpoint() // feeds DCG and the ideal reordering
        // discount in integer micro: round(1e6 / log2(rank + 1))
        val disc = expr(
          "CAST(round(1000000.0 / (ln(rank + 1) / ln(2))) AS BIGINT)")
        val dcgRolled = graded
          .select(col("q_id"), col("rn").as("rank"), col("rel"))
          .select(col("q_id"), (col("rel") * disc).as("g"))
          .groupBy(col("q_id")).agg(sum(col("g")).as("dcg_micro"))
        val wq = org.apache.spark.sql.expressions.Window
          .partitionBy(col("q_id"))
          .orderBy(col("rel").desc, col("id"))
        val idcgRolled = graded
          .withColumn("rank", row_number().over(wq).cast("long"))
          .select(col("q_id"), (col("rel") * disc).as("g"))
          .groupBy(col("q_id")).agg(sum(col("g")).as("idcg_micro"))
        dcgRolled.join(idcgRolled, "q_id")
          .select(col("q_id"), col("dcg_micro"), col("idcg_micro"),
            when(col("idcg_micro") > 0,
              expr("(dcg_micro * 10000) div idcg_micro")).otherwise(0L)
              .as("ndcg_bp"))
          .orderBy(col("q_id"))
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
              lscored AS (
                SELECT q.q_id, c.doc_id, sum(c.c_micro) AS score_micro
                FROM q JOIN contrib c USING (term)
                GROUP BY q.q_id, c.doc_id),
              hits AS (
                SELECT q_id, doc_id AS id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS rn
                FROM lscored
                QUALIFY rn <= 5),
              meta AS (SELECT doc_id, source, lang FROM documents),
              graded AS (
                SELECT h.q_id, h.id, h.rn,
                  (CASE WHEN mq.source = mh.source THEN 2 ELSE 0 END) +
                  (CASE WHEN mq.lang = mh.lang THEN 1 ELSE 0 END) AS rel
                FROM hits h
                JOIN meta mq ON mq.doc_id = h.q_id
                JOIN meta mh ON mh.doc_id = h.id),
              dcg AS (
                SELECT q_id,
                  sum(rel * CAST(round(1000000.0 / (ln(rn + 1) / ln(2)))
                    AS BIGINT)) AS dcg_micro
                FROM graded GROUP BY q_id),
              ideal AS (
                SELECT q_id, rel,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY rel DESC, id) AS rank
                FROM graded),
              idcg AS (
                SELECT q_id,
                  sum(rel * CAST(round(1000000.0 / (ln(rank + 1) / ln(2)))
                    AS BIGINT)) AS idcg_micro
                FROM ideal GROUP BY q_id)
              SELECT d.q_id, CAST(d.dcg_micro AS BIGINT) AS dcg_micro,
                CAST(i.idcg_micro AS BIGINT) AS idcg_micro,
                CAST(CASE WHEN i.idcg_micro > 0
                  THEN (d.dcg_micro * 10000) // i.idcg_micro
                  ELSE 0 END AS BIGINT) AS ndcg_bp
              FROM dcg d JOIN idcg i ON i.q_id = d.q_id
              ORDER BY d.q_id"""))
  )
}
