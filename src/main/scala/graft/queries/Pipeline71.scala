package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, nineteenth batch — distributed-sketch algebra (KMV
  * union/intersection across sources) and the consistent-hash churn
  * planner.
  */
object Pipeline71 {

  val entries: Seq[QEntry] = Seq(

    // KMV sketch algebra: q181 built per-source k-minimum-values
    // sketches; this is the MERGE half that makes sketches worth
    // shipping — for every source pair, the union estimate
    // (k−1)·2⁶⁰ div h₍ₖ₎ from the merged sketch, the intersection by
    // the ρ = |in-both|/k rule, and the Jaccard in ppm — all from two
    // 64-value arrays per source (constant bytes per shard at any
    // corpus size; the q189 exact pair join rescans the corpus
    // instead). Elements are distinct word-3-gram 60-bit hashes;
    // sketch extraction is the q181 source-keyed rank window.
    QEntry("q376_kmv_union",
      (s, d) => {
        val grams = Tables.documents(s, d)
          .select(col("source"),
            explode(graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 3, distinct = true))
              .as("sh"))
          .select(col("source"),
            conv(substring(md5(col("sh")), 1, 15), 16, 10).cast("long")
              .as("h"))
          .distinct()
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source")).orderBy(col("h"))
        val sk = grams.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 64)
          .groupBy(col("source"))
          .agg(sort_array(collect_list(col("h"))).as("sk"))
          .localCheckpoint() // one 64-long array per source
        val pairs = sk.select(col("source").as("src_a"), col("sk").as("sa"))
          .join(broadcast(sk.select(col("source").as("src_b"),
            col("sk").as("sb"))), col("src_a") < col("src_b"))
          .select(col("src_a"), col("src_b"),
            expr("slice(array_sort(array_union(sa, sb)), 1, 64)")
              .as("mg"),
            col("sa"), col("sb"))
          .select(col("src_a"), col("src_b"),
            element_at(col("mg"), 64).as("hk"),
            size(expr("array_intersect(mg, array_intersect(sa, sb))"))
              .cast("long").as("in_both"))
          .select(col("src_a"), col("src_b"), col("in_both"),
            expr("CAST(CAST(63 AS DECIMAL(38,0)) * " +
              "1152921504606846976 div greatest(1L, hk) AS BIGINT)")
              .as("union_est"))
          .withColumn("inter_est",
            expr("in_both * union_est div 64"))
          .withColumn("jaccard_ppm", expr("in_both * 1000000 div 64"))
        pairs.orderBy(col("src_a"), col("src_b"))
      },
      Some("""WITH t AS (
                SELECT source,
                  string_split_regex(lower(text), '\s+') AS w
                FROM documents),
              g AS (
                SELECT DISTINCT source, h FROM (
                  SELECT source,
                    unnest(list_transform(range(1, len(w) - 1),
                      i -> ('0x' || substr(md5(w[i] || ' ' || w[i+1]
                        || ' ' || w[i+2]), 1, 15))::BIGINT)) AS h
                  FROM t WHERE len(w) >= 3)),
              rk AS (
                SELECT source, h,
                  row_number() OVER (PARTITION BY source ORDER BY h)
                    AS rn
                FROM g QUALIFY rn <= 64),
              sk AS (
                SELECT source, list(h ORDER BY h) AS sk
                FROM rk GROUP BY source),
              pr AS (
                SELECT a.source AS src_a, b.source AS src_b,
                  a.sk AS sa, b.sk AS sb,
                  (list_sort(list_distinct(a.sk || b.sk)))[1:64] AS mg
                FROM sk a JOIN sk b ON a.source < b.source),
              m AS (
                SELECT src_a, src_b, mg[64] AS hk,
                  len(list_filter(mg, x -> list_contains(sa, x)
                    AND list_contains(sb, x))) AS in_both
                FROM pr)
              SELECT src_a, src_b, CAST(in_both AS BIGINT) AS in_both,
                CAST(CAST(63 AS HUGEINT) * 1152921504606846976
                  // greatest(1, hk) AS BIGINT) AS union_est,
                CAST(in_both * (CAST(63 AS HUGEINT) * 1152921504606846976
                  // greatest(1, hk)) // 64 AS BIGINT) AS inter_est,
                CAST(in_both * 1000000 // 64 AS BIGINT) AS jaccard_ppm
              FROM m
              ORDER BY src_a, src_b""")),

    // Consistent-hash churn planner: docs assigned to their successor
    // vnode on the 2⁶⁰ md5 ring (4 vnodes per node — the smoothing
    // practice), under 8 nodes vs 9 — per node the load in both
    // scenarios and the corpus-wide churn in bp (theory: ≈ 1/9 of
    // keys move; naive `mod N` sharding moves ≈ 8/9). The "what does
    // adding a node cost" readout for any sharded state (dedup state,
    // ANN partitions, manifest buckets). Assignment = one broadcast
    // join against ≤ 36 vnode rows + a min over candidates.
    QEntry("q377_consistent_hash_churn",
      (s, d) => {
        val keys = Tables.documents(s, d)
          .select(col("doc_id"),
            expr("CAST(conv(substring(md5(concat('key:', " +
              "CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT)")
              .as("kp"))
          .localCheckpoint() // both scenarios read it
        def assign(nNodes: Int, out: String) = {
          val vnodes = s.range(0, nNodes.toLong)
            .select(col("id").as("node"))
            .crossJoin(s.range(0, 4).select(col("id").as("v")))
            .select(col("node"),
              expr("CAST(conv(substring(md5(concat('node:', " +
                "CAST(node AS STRING), ':', CAST(v AS STRING))), " +
                "1, 15), 16, 10) AS BIGINT)").as("vp"))
          val ringMin = vnodes.orderBy(col("vp").asc).limit(1)
            .select(col("node").as("wrap_node"), col("vp").as("wrap_vp"))
          keys.join(broadcast(vnodes), col("vp") >= col("kp"), "left")
            .groupBy(col("doc_id"), col("kp"))
            .agg(min(when(col("vp").isNotNull,
              struct(col("vp"), col("node")))).as("succ"))
            .crossJoin(broadcast(ringMin))
            .select(col("doc_id"),
              coalesce(col("succ.node"), col("wrap_node")).as(out))
        }
        val a = assign(8, "node_8")
        val b = assign(9, "node_9")
        val j = a.join(b, "doc_id").localCheckpoint()
        val churn = j.agg(
          expr("sum(CASE WHEN node_8 != node_9 THEN 1L ELSE 0L END) " +
            "* 10000 div count(1)").as("churn_bp"),
          count(lit(1)).as("n_keys"))
        val loads = j
          .select(explode(array(
            struct(lit(8L).as("scenario"), col("node_8").as("node")),
            struct(lit(9L).as("scenario"), col("node_9").as("node")))))
          .select(col("col.scenario"), col("col.node"))
          .groupBy(col("scenario"), col("node"))
          .agg(count(lit(1)).as("load"))
        loads.crossJoin(broadcast(churn))
          .select(col("scenario"), col("node"), col("load"),
            expr("load * 10000 div n_keys").as("share_bp"),
            col("churn_bp"))
          .orderBy(col("scenario"), col("node"))
      },
      Some("""WITH keys AS (
                SELECT doc_id,
                  ('0x' || substr(md5('key:' ||
                    CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS kp
                FROM documents),
              vn AS (
                SELECT n.node, v.v,
                  ('0x' || substr(md5('node:' ||
                    CAST(n.node AS VARCHAR) || ':' ||
                    CAST(v.v AS VARCHAR)), 1, 15))::BIGINT AS vp
                FROM (SELECT unnest(range(9)) AS node) n,
                  (SELECT unnest(range(4)) AS v) v),
              a8 AS (
                SELECT k.doc_id,
                  coalesce(
                    (SELECT v.node FROM vn v
                     WHERE v.node < 8 AND v.vp >= k.kp
                     ORDER BY v.vp LIMIT 1),
                    (SELECT v.node FROM vn v WHERE v.node < 8
                     ORDER BY v.vp LIMIT 1)) AS node_8
                FROM keys k),
              a9 AS (
                SELECT k.doc_id,
                  coalesce(
                    (SELECT v.node FROM vn v WHERE v.vp >= k.kp
                     ORDER BY v.vp LIMIT 1),
                    (SELECT v.node FROM vn v
                     ORDER BY v.vp LIMIT 1)) AS node_9
                FROM keys k),
              j AS (
                SELECT a8.doc_id, a8.node_8, a9.node_9
                FROM a8 JOIN a9 USING (doc_id)),
              ch AS (
                SELECT sum(CASE WHEN node_8 <> node_9 THEN 1 ELSE 0 END)
                    * 10000 // count(*) AS churn_bp,
                  count(*) AS n_keys
                FROM j),
              loads AS (
                SELECT 8 AS scenario, node_8 AS node, count(*) AS load
                FROM j GROUP BY node_8
                UNION ALL
                SELECT 9, node_9, count(*) FROM j GROUP BY node_9)
              SELECT CAST(l.scenario AS BIGINT) AS scenario,
                CAST(l.node AS BIGINT) AS node,
                CAST(l.load AS BIGINT) AS load,
                CAST(l.load * 10000 // ch.n_keys AS BIGINT) AS share_bp,
                CAST(ch.churn_bp AS BIGINT) AS churn_bp
              FROM loads l, ch
              ORDER BY l.scenario, l.node"""))
  )
}
