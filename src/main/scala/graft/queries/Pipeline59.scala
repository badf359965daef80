package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, seventh batch — training-set assembly: deterministic
  * augmentation, leakage-safe shard assignment, and quality-ordered
  * token-budget selection.
  */
object Pipeline59 {

  val entries: Seq[QEntry] = Seq(

    // Deterministic text augmentation: per eligible doc (every 3rd)
    // two variants — `dropout` (each token position drops on an md5
    // coin, p = 1/10) and `swap` (the adjacent pair at a key-derived
    // position exchanges, when the tokens differ). Everything is
    // index-based higher-order functions over one tokenization — no
    // shuffle before the final ordering — and the augmented text is
    // fingerprinted (md5) so the oracle proves byte-exact
    // reconstruction, not just counts. The augmentation-as-dataflow
    // contract: same coins on any cluster size, rerun-stable.
    QEntry("q343_augmentation",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .filter(col("doc_id") % 3 === 0)
          .select(col("doc_id"), split(lower(col("text")), " ").as("t"))
        val dropped = toks.select(col("doc_id"), lit("dropout").as("variant"),
          col("t"),
          expr("""filter(transform(sequence(0, size(t) - 1), i ->
                    struct(element_at(t, i + 1) AS tk,
                      CAST(conv(substring(md5(concat(
                        CAST(doc_id AS STRING), ':', CAST(i AS STRING))),
                        1, 4), 16, 10) AS BIGINT) % 10 AS coin)),
                  s -> s.coin <> 0)""").as("kept"))
          .select(col("doc_id"), col("variant"),
            expr("size(kept)").cast("long").as("n_tokens_out"),
            expr("size(t) - size(kept)").cast("long").as("n_changed"),
            md5(expr("array_join(transform(kept, s -> s.tk), ' ')"))
              .as("aug_md5"))
        val swapped = toks.select(col("doc_id"), lit("swap").as("variant"),
          expr("CAST(doc_id % greatest(1, size(t) - 1) AS INT)").as("p"),
          col("t"))
          .select(col("doc_id"), col("variant"),
            expr("size(t)").cast("long").as("n_tokens_out"),
            expr("""CASE WHEN size(t) >= 2 AND
                      element_at(t, p + 1) <> element_at(t, p + 2)
                    THEN 2L ELSE 0L END""").as("n_changed"),
            md5(expr("""array_join(transform(sequence(0, size(t) - 1),
                  i -> CASE WHEN size(t) >= 2 AND i = p
                         THEN element_at(t, p + 2)
                       WHEN size(t) >= 2 AND i = p + 1
                         THEN element_at(t, p + 1)
                       ELSE element_at(t, i + 1) END), ' ')"""))
              .as("aug_md5"))
        dropped.select(col("doc_id"), col("variant"), col("n_tokens_out"),
            col("n_changed"), col("aug_md5"))
          .union(swapped)
          .orderBy(col("doc_id"), col("variant"))
      },
      Some("""WITH toks AS (
                SELECT doc_id, string_split(lower(text), ' ') AS t
                FROM documents WHERE doc_id % 3 = 0),
              dropped AS (
                SELECT doc_id, 'dropout' AS variant,
                  list_filter(list_transform(range(len(t)), i ->
                    {'tk': t[i+1],
                     'coin': ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                       || ':' || CAST(i AS VARCHAR)), 1, 4))::BIGINT
                       % 10}),
                    s -> s.coin <> 0) AS kept,
                  t
                FROM toks),
              dout AS (
                SELECT doc_id, variant,
                  CAST(len(kept) AS BIGINT) AS n_tokens_out,
                  CAST(len(t) - len(kept) AS BIGINT) AS n_changed,
                  md5(array_to_string(list_transform(kept, s -> s.tk),
                    ' ')) AS aug_md5
                FROM dropped),
              sw AS (
                SELECT doc_id, 'swap' AS variant,
                  CAST(doc_id % greatest(1, len(t) - 1) AS BIGINT) AS p,
                  t
                FROM toks),
              sout AS (
                SELECT doc_id, variant,
                  CAST(len(t) AS BIGINT) AS n_tokens_out,
                  CASE WHEN len(t) >= 2 AND t[p+1] <> t[p+2]
                    THEN 2 ELSE 0 END AS n_changed,
                  md5(array_to_string(list_transform(range(len(t)), i ->
                    CASE WHEN len(t) >= 2 AND i = p THEN t[p+2]
                         WHEN len(t) >= 2 AND i = p + 1 THEN t[p+1]
                         ELSE t[i+1] END), ' ')) AS aug_md5
                FROM sw)
              SELECT doc_id, variant, n_tokens_out,
                CAST(n_changed AS BIGINT) AS n_changed, aug_md5
              FROM (SELECT * FROM dout UNION ALL
                    SELECT doc_id, variant, n_tokens_out, n_changed,
                      aug_md5 FROM sout)
              ORDER BY doc_id, variant""")),

    // Leakage-safe shard assignment, measured against the leaky
    // default: near-dup cluster members (the q341 planted 3-member
    // clusters) must land in the SAME training shard or eval-vs-train
    // contamination walks straight through the split. Policy
    // `doc_hash` shards by member id (the default everyone ships
    // first); `rep_hash` shards by the cluster rep — the group-safe
    // rule (q205's discipline at shard grain). Per policy: clusters
    // split across shards (count + bp) and the shard-load spread
    // (max/min tokens) — co-sharding must not cost balance. Both
    // policies are one md5 projection + one census; no shuffle beyond
    // the group-bys.
    QEntry("q344_shard_integrity",
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
          .select(col("cluster_id"), col("member_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"))
        def shard(c: org.apache.spark.sql.Column) =
          expr(s"CAST(conv(substring(md5(CAST(${c} AS STRING)), 1, 4), " +
            "16, 10) AS BIGINT) % 8")
        val assigned = members
          .withColumn("doc_hash", shard(col("member_id")))
          .withColumn("rep_hash", shard(col("cluster_id")))
          .localCheckpoint() // both policy censuses
        def audit(policy: String, sh: org.apache.spark.sql.Column) = {
          val split = assigned.groupBy(col("cluster_id"))
            .agg(countDistinct(sh).as("n_shards"))
            .agg(sum(when(col("n_shards") > 1, 1L).otherwise(0L))
              .as("clusters_split"),
              count(lit(1)).as("n_clusters"))
          val load = assigned.groupBy(sh.as("shard"))
            .agg(sum(col("tok")).as("stok"))
            .agg(max(col("stok")).as("max_shard_tokens"),
              min(col("stok")).as("min_shard_tokens"))
          split.crossJoin(load)
            .select(lit(policy).as("policy"), col("clusters_split"),
              expr("clusters_split * 10000 div n_clusters")
                .as("split_bp"),
              col("max_shard_tokens"), col("min_shard_tokens"))
        }
        audit("doc_hash", col("doc_hash"))
          .union(audit("rep_hash", col("rep_hash")))
          .orderBy(col("policy"))
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
                  ('0x' || substr(md5(CAST(member_id AS VARCHAR)), 1, 4))
                    ::BIGINT % 8 AS doc_hash,
                  ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))
                    ::BIGINT % 8 AS rep_hash
                FROM members),
              pol AS (
                SELECT 'doc_hash' AS policy, cluster_id, member_id, tok,
                  doc_hash AS shard FROM feat
                UNION ALL
                SELECT 'rep_hash', cluster_id, member_id, tok, rep_hash
                FROM feat),
              sp AS (
                SELECT policy,
                  sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END)
                    AS clusters_split,
                  count(*) AS n_clusters
                FROM (SELECT policy, cluster_id,
                        count(DISTINCT shard) AS ns
                      FROM pol GROUP BY policy, cluster_id)
                GROUP BY policy),
              ld AS (
                SELECT policy, max(stok) AS max_shard_tokens,
                  min(stok) AS min_shard_tokens
                FROM (SELECT policy, shard, sum(tok) AS stok
                      FROM pol GROUP BY policy, shard)
                GROUP BY policy)
              SELECT sp.policy,
                CAST(clusters_split AS BIGINT) AS clusters_split,
                CAST(clusters_split * 10000 // n_clusters AS BIGINT)
                  AS split_bp,
                CAST(max_shard_tokens AS BIGINT) AS max_shard_tokens,
                CAST(min_shard_tokens AS BIGINT) AS min_shard_tokens
              FROM sp JOIN ld USING (policy)
              ORDER BY sp.policy""")),

    // Quality-ordered token-budget selection at BUCKET grain (the
    // "fill 50% of the token budget with the best docs" curation cut):
    // per-doc stopword-quality ppm → 100-bucket dimension → cumulative
    // tokens best-first → per bucket `take` / `partial` / `drop`, with
    // the boundary bucket's take fraction in ppm. No doc-grain ordered
    // window anywhere: selection happens on the bounded bucket dim,
    // and a finer grid (not a corpus sort) is the refinement path at
    // 100 TB.
    QEntry("q345_budget_selection",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"),
            graft.pipeline.TextAnalysis.stopwordCount(col("text"))
              .cast("long").as("stop"))
          .select(col("tok"),
            expr("least(99L, (stop * 1000000 div greatest(1L, tok)) " +
              "div 10000)").as("bucket"))
        val dim = graft.pipeline.Stats.boundedDim(
          docs.groupBy(col("bucket"))
            .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("tokens")),
          "q345_budget_selection") // ≤100 buckets by construction
        val budget = docs.agg((sum(col("tok")) / 2).cast("long")
          .as("budget"))
        dim.crossJoin(broadcast(budget))
          .withColumn("cum_before",
            coalesce(sum(col("tokens")).over(
              org.apache.spark.sql.expressions.Window
                .orderBy(col("bucket").desc)
                .rowsBetween(Long.MinValue, -1)), lit(0L)))
          .withColumn("status",
            when(col("cum_before") + col("tokens") <= col("budget"),
              "take")
              .when(col("cum_before") >= col("budget"), "drop")
              .otherwise("partial"))
          .withColumn("take_ppm",
            when(col("status") === "take", lit(1000000L))
              .when(col("status") === "drop", lit(0L))
              .otherwise(expr(
                "(budget - cum_before) * 1000000 div tokens")))
          .select(col("bucket"), col("n_docs"), col("tokens"),
            col("cum_before"), col("status"), col("take_ppm"))
          .orderBy(col("bucket").desc)
      },
      Some("""WITH docs AS (
                SELECT CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok,
                  CAST(len(list_filter(
                    string_split_regex(lower(text), '\s+'),
                    x -> x IN ('the', 'a', 'of', 'and', 'to', 'in',
                      'is', 'on', 'for', 'with'))) AS BIGINT) AS stop
                FROM documents),
              b AS (
                SELECT least(99, (stop * 1000000 //
                    greatest(1, tok)) // 10000) AS bucket, tok
                FROM docs),
              dim AS (
                SELECT bucket, count(*) AS n_docs, sum(tok) AS tokens
                FROM b GROUP BY bucket),
              bd AS (SELECT CAST(sum(tok) // 2 AS BIGINT) AS budget
                     FROM docs),
              cum AS (
                SELECT bucket, n_docs, tokens,
                  coalesce(sum(tokens) OVER (ORDER BY bucket DESC
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS cum_before
                FROM dim)
              SELECT bucket, CAST(n_docs AS BIGINT) AS n_docs,
                CAST(tokens AS BIGINT) AS tokens,
                CAST(cum_before AS BIGINT) AS cum_before,
                CASE WHEN cum_before + tokens <= budget THEN 'take'
                     WHEN cum_before >= budget THEN 'drop'
                     ELSE 'partial' END AS status,
                CASE WHEN cum_before + tokens <= budget THEN 1000000
                     WHEN cum_before >= budget THEN 0
                     ELSE CAST((budget - cum_before) * 1000000 // tokens
                       AS BIGINT) END AS take_ppm
              FROM cum, bd
              ORDER BY bucket DESC"""))
  )
}
