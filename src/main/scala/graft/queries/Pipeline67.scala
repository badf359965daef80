package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, fifteenth batch — the manifest's streaming arm
  * (arrival waves), the serving-side prefix-cache planner, and the
  * word2vec-style negative-sampling table.
  */
object Pipeline67 {

  val entries: Seq[QEntry] = Seq(

    // Manifest evolution across arrival waves: docs land in three
    // deterministic waves (doc_id % 3, processed 0→2) and the release
    // root is re-stamped after each — the gate-checkable face of
    // `Manifest.IncrementalManifest` (ManifestSpec pins the streaming
    // fold's roots-after-every-wave to exactly these rows). ONE corpus
    // scan builds (source, bucket, wave) sub-folds; each wave's state
    // is then a dim-grain modular merge (sums of ≤3 folds < 2⁶³ — long
    // is safe) — the micro-batch accumulation cost never rescans the
    // corpus.
    QEntry("q365_manifest_waves",
      (s, d) => {
        val sub = Tables.documents(s, d)
          .select(col("source"), (col("doc_id") % 3).as("wave"),
            conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), col("text"))), 1, 15), 16, 10).cast("long")
              .as("h"))
          .select(col("source"), col("wave"), col("h"),
            pmod(col("h"), lit(256L)).as("b"))
          .groupBy(col("source"), col("wave"), col("b"))
          .agg(count(lit(1)).as("n"),
            (sum(col("h").cast("decimal(38,0)")) %
              lit(graft.pipeline.Manifest.FoldM)).cast("long")
              .as("fold"))
          .localCheckpoint() // ≤ 3×256 rows per source
        val grid = s.range(0, 3).select(col("id").as("as_of"))
        val cum = sub.crossJoin(broadcast(grid))
          .filter(col("wave") <= col("as_of"))
          .groupBy(col("as_of"), col("source"), col("b"))
          .agg(sum(col("n")).as("n"),
            (sum(col("fold")) %
              lit(graft.pipeline.Manifest.FoldM)).as("fold"))
        cum.groupBy(col("as_of"), col("source"))
          .agg(sum(col("n")).as("n_rows"),
            md5(concat_ws("|", sort_array(collect_list(concat(
              lpad(col("b").cast("string"), 3, "0"), lit(":"),
              col("fold").cast("string")))))).as("root"))
          .orderBy(col("as_of"), col("source"))
      },
      Some("""WITH r AS (
                SELECT source, doc_id % 3 AS wave,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':'
                    || text), 1, 15))::BIGINT AS h
                FROM documents),
              sub AS (
                SELECT source, wave, h % 256 AS b, count(*) AS n,
                  CAST(sum(CAST(h AS HUGEINT))
                    % 2305843009213693951 AS BIGINT) AS fold
                FROM r GROUP BY source, wave, h % 256),
              cum AS (
                SELECT g.as_of, s.source, s.b, sum(s.n) AS n,
                  CAST(sum(s.fold) % 2305843009213693951 AS BIGINT)
                    AS fold
                FROM sub s, (SELECT unnest(range(3)) AS as_of) g
                WHERE s.wave <= g.as_of
                GROUP BY g.as_of, s.source, s.b)
              SELECT CAST(as_of AS BIGINT) AS as_of, source,
                CAST(sum(n) AS BIGINT) AS n_rows,
                md5(string_agg(lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold AS VARCHAR), '|'
                  ORDER BY lpad(CAST(b AS VARCHAR), 3, '0') || ':'
                  || CAST(fold AS VARCHAR))) AS root
              FROM cum GROUP BY as_of, source
              ORDER BY as_of, source""")),

    // Prefix-cache planner: for prefix lengths k ∈ {4, 16, 64} tokens,
    // how much of the corpus shares identical k-token prefixes — the
    // "what does a serving prefix cache buy" readout (docs sharing a
    // prefix re-use its KV cache; families of size f save (f−1)·k
    // tokens of prefill). Prefixes travel as md5 longs; one tokenize
    // pass, a 3-cell grid explode, one keyed count per k.
    QEntry("q366_prefix_cache_planner",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+")
            .as("w"))
          .localCheckpoint()
        val grid = s.range(0, 3)
          .select(expr("CAST(pow(4, id + 1) AS BIGINT)").as("k"))
        val fams = toks.crossJoin(broadcast(grid))
          .filter(size(col("w")) >= col("k"))
          .select(col("k"),
            conv(substring(md5(concat_ws(" ",
              slice(col("w"), lit(1), col("k")))), 1, 15), 16, 10)
              .cast("long").as("pfx"))
          .groupBy(col("k"), col("pfx"))
          .agg(count(lit(1)).as("f"))
        fams.groupBy(col("k"))
          .agg(sum(col("f")).as("eligible_docs"),
            count(lit(1)).as("n_prefixes"),
            sum(when(col("f") >= 2, 1L).otherwise(0L)).as("n_families"),
            sum(when(col("f") >= 2, col("f")).otherwise(0L))
              .as("docs_in_families"),
            sum(when(col("f") >= 2, (col("f") - 1L)).otherwise(0L))
              .as("cacheable_prefills"))
          .withColumn("cacheable_tokens",
            col("cacheable_prefills") * col("k"))
          .orderBy(col("k"))
      },
      Some("""WITH t AS (
                SELECT doc_id,
                  string_split_regex(lower(text), '\s+') AS w
                FROM documents),
              fams AS (
                SELECT g.k,
                  ('0x' || substr(md5(array_to_string(w[1:g.k], ' ')),
                    1, 15))::BIGINT AS pfx,
                  count(*) AS f
                FROM t, (SELECT unnest([4, 16, 64]) AS k) g
                WHERE len(w) >= g.k
                GROUP BY g.k, pfx)
              SELECT CAST(k AS BIGINT) AS k,
                CAST(sum(f) AS BIGINT) AS eligible_docs,
                CAST(count(*) AS BIGINT) AS n_prefixes,
                CAST(sum(CASE WHEN f >= 2 THEN 1 ELSE 0 END) AS BIGINT)
                  AS n_families,
                CAST(sum(CASE WHEN f >= 2 THEN f ELSE 0 END) AS BIGINT)
                  AS docs_in_families,
                CAST(sum(CASE WHEN f >= 2 THEN f - 1 ELSE 0 END)
                  AS BIGINT) AS cacheable_prefills,
                CAST(sum(CASE WHEN f >= 2 THEN f - 1 ELSE 0 END) * k
                  AS BIGINT) AS cacheable_tokens
              FROM fams GROUP BY k
              ORDER BY k""")),

    // Negative-sampling table (word2vec's unigram^(3/4) rule): the
    // top-64 words (two-pass GlobalRank) weighted c^0.75 — the tail
    // boost that keeps frequent words from dominating negatives; per
    // word the sampling ppm and its boost vs the raw share in milli.
    // pow→round lands on integers before any arithmetic (both engines
    // evaluate the identical double expression on the same ints —
    // q289's final-formula discipline).
    QEntry("q367_negative_sampling",
      (s, d) => {
        val wc = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
        val top = graft.operators.GlobalRank.rowNumber(
            wc, "rank", col("cnt").desc, col("w"))
          .filter(col("rank") <= 64)
          .select(col("rank").cast("long").as("rank"), col("w"),
            col("cnt"),
            expr("CAST(round(pow(CAST(cnt AS DOUBLE), 0.75)) AS BIGINT)")
              .as("wt"))
          .localCheckpoint() // 64 rows
        val tot = top.agg(sum(col("wt")).as("tw"),
          sum(col("cnt")).as("tc"))
        top.crossJoin(broadcast(tot))
          .select(col("rank"), col("w"), col("cnt"),
            expr("wt * 1000000 div tw").as("sample_ppm"),
            expr("cnt * 1000000 div tc").as("raw_ppm"))
          .withColumn("boost_milli",
            expr("sample_ppm * 1000 div greatest(1L, raw_ppm)"))
          .orderBy(col("rank"))
      },
      Some("""WITH wc AS (
                SELECT w, count(*) AS cnt FROM (
                  SELECT unnest(string_split_regex(lower(text), '\s+'))
                    AS w
                  FROM documents)
                GROUP BY w),
              top AS (
                SELECT row_number() OVER (ORDER BY cnt DESC, w) AS rank,
                  w, cnt,
                  CAST(round(pow(CAST(cnt AS DOUBLE), 0.75)) AS BIGINT)
                    AS wt
                FROM wc QUALIFY rank <= 64),
              tot AS (SELECT sum(wt) AS tw, sum(cnt) AS tc FROM top)
              SELECT CAST(rank AS BIGINT) AS rank, w,
                CAST(cnt AS BIGINT) AS cnt,
                CAST(wt * 1000000 // tw AS BIGINT) AS sample_ppm,
                CAST(cnt * 1000000 // tc AS BIGINT) AS raw_ppm,
                CAST((wt * 1000000 // tw) * 1000 //
                  greatest(1, cnt * 1000000 // tc) AS BIGINT)
                  AS boost_milli
              FROM top, tot
              ORDER BY rank"""))
  )
}
