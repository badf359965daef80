package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Curation, Retrieval, TextAnalysis}

/** Round-5 curation/retrieval pack: BM25, token chunking, deterministic
  * stratified sampling, training-sequence packing, Gopher-style quality
  * gates, an ORC sink/scan roundtrip, and PMI collocations. Every query
  * keeps doubles out of aggregation (integer counts all the way; ln/÷
  * only at the rounded query edge) per the oracle-parity convention.
  */
object Pipeline5 {

  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  val entries: Seq[QEntry] = Seq(

    // BM25 (k1=1.2, b=0.75): two map-side-combined hash aggs (tf, df) +
    // a broadcast 1-row corpus-stats frame. See Retrieval.bm25.
    QEntry("q85_bm25",
      (s, d) => Retrieval.bm25(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id"), col("term")),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                         FROM documents),
                   dlen AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
                   tm AS (SELECT doc_id, unnest(toks) AS term FROM t),
                   tf AS (SELECT doc_id, term, count(*) AS tf FROM tm
                          GROUP BY doc_id, term),
                   df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
                   st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl
                          FROM dlen)
              SELECT tf.doc_id, tf.term, tf.tf, df.df, dlen.dl,
                round(ln((CAST(st.n_docs AS DOUBLE) - df.df + 0.5) / (df.df + 0.5) + 1.0)
                  * (tf.tf * 2.2)
                  / (tf.tf + 1.2 * (0.25 + 0.75 *
                      (dlen.dl / (CAST(st.sum_dl AS DOUBLE) / st.n_docs)))), 6) AS bm25
              FROM tf JOIN dlen USING (doc_id) JOIN df USING (term) CROSS JOIN st
              ORDER BY tf.doc_id, tf.term""")),

    // Sliding-window token chunking (chunk 16, stride 8) — the standard
    // context-window prep step. Pure explode of a per-row sequence; fan-out
    // is bounded by doc length / stride, no shuffle at all.
    QEntry("q86_chunk_windows",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
        .select(col("doc_id"), col("toks"),
          posexplode(sequence(lit(0), size(col("toks")) - 1, lit(8))))
        .select(col("doc_id"), col("pos").cast("long").as("chunk_id"),
          size(slice(col("toks"), col("col") + 1, lit(16))).cast("long").as("n_tokens"),
          array_join(slice(col("toks"), col("col") + 1, lit(16)), " ").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_id")),
      Some("""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                         FROM documents),
                   c AS (SELECT doc_id, toks, unnest(range(0, len(toks), 8)) AS s FROM t)
              SELECT doc_id, s // 8 AS chunk_id,
                     CAST(len(toks[s+1 : s+16]) AS BIGINT) AS n_tokens,
                     array_to_string(toks[s+1 : s+16], ' ') AS chunk_text
              FROM c ORDER BY doc_id, chunk_id""")),

    // Deterministic stratified sampling: per-language keep rates decided
    // by an md5 bucket of the KEY (never rand()) — reproducible across
    // runs, retries, and engines. Zero-shuffle projection + filter.
    QEntry("q87_stratified_sample",
      (s, d) => Curation.stratifiedSample(
          Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 60, "es" -> 45, "de" -> 40, "fr" -> 35), 25, "strat")
        .select(col("doc_id"), col("lang"), col("bucket"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang, bucket FROM (
                SELECT doc_id, lang,
                  ('0x' || substr(md5(cast(doc_id AS VARCHAR) || ':strat'), 1, 8))::BIGINT
                    % 100 AS bucket,
                  CASE lang WHEN 'en' THEN 60 WHEN 'es' THEN 45 WHEN 'de' THEN 40
                            WHEN 'fr' THEN 35 ELSE 25 END AS rate
                FROM documents)
              WHERE bucket < rate ORDER BY doc_id""")),

    // Training-sequence packing: concatenate docs per source in key order,
    // cut at 256-token boundaries, assign each doc the bin its start
    // offset falls in. One cumulative-sum window per stratum.
    QEntry("q88_pack_sequences",
      (s, d) => Curation.packSequences(
          Tables.documents(s, d)
            .select(col("source"), col("doc_id"),
              size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok")),
          "doc_id", "source", "n_tok", 256)
        .select(col("source"), col("doc_id"), col("n_tok"), col("cum_tok"), col("bin_id"))
        .orderBy(col("source"), col("doc_id")),
      Some("""WITH t AS (SELECT source, doc_id,
                     CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tok
                   FROM documents),
                   c AS (SELECT source, doc_id, n_tok,
                     sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok
                   FROM t)
              SELECT source, doc_id, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok,
                     CAST(floor((cum_tok - n_tok) / 256.0) AS BIGINT) AS bin_id
              FROM c ORDER BY source, doc_id""")),

    // Gopher-style quality gates — all thresholds compared in integers
    // (n_stop*100 >= n_tok), so keep/reject is engine-exact. reason is the
    // FIRST failing rule, '' when kept.
    QEntry("q89_quality_filter",
      (s, d) => {
        val f = Curation.qualityFlags(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            f.getField("n_tok").as("n_tok"),
            f.getField("sum_tok_len").as("sum_tok_len"),
            f.getField("n_stop").as("n_stop"),
            f.getField("n_distinct").as("n_distinct"),
            f.getField("ok_len").as("ok_len"),
            f.getField("ok_wl").as("ok_wl"),
            f.getField("ok_stop").as("ok_stop"),
            f.getField("ok_rep").as("ok_rep"),
            f.getField("keep").as("keep"),
            f.getField("reason").as("reason"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
                          FROM documents),
                    f AS (SELECT doc_id,
                      CAST(len(toks) AS BIGINT) AS n_tok,
                      CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT)
                        AS sum_tok_len,
                      CAST(len(list_filter(toks, t -> t IN ($stopList))) AS BIGINT)
                        AS n_stop,
                      CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
                    FROM t),
                    g AS (SELECT *,
                      (n_tok >= 10 AND n_tok <= 90) AS ok_len,
                      (sum_tok_len >= n_tok * 3 AND sum_tok_len <= n_tok * 10) AS ok_wl,
                      (n_stop * 100 >= n_tok) AS ok_stop,
                      (n_distinct * 10 >= n_tok * 4) AS ok_rep
                    FROM f)
               SELECT doc_id, n_tok, sum_tok_len, n_stop, n_distinct,
                 ok_len, ok_wl, ok_stop, ok_rep,
                 (ok_len AND ok_wl AND ok_stop AND ok_rep) AS keep,
                 CASE WHEN NOT ok_len THEN 'len' WHEN NOT ok_wl THEN 'word_len'
                      WHEN NOT ok_stop THEN 'stopword' WHEN NOT ok_rep THEN 'repetition'
                      ELSE '' END AS reason
               FROM g ORDER BY doc_id""")),

    // ORC sink + scan under the gate (second columnar format beside
    // parquet): write a pruned projection, read it back, aggregate. The
    // oracle computes the same aggregate from the parquet original, so a
    // roundtrip corruption anywhere (schema, nulls, values) hash-fails.
    QEntry("q90_orc_roundtrip",
      (s, d) => {
        val path = Scratch.dir(s, "orc_q90")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").orc(path)
        s.read.orc(path)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars"),
            min(col("doc_id")).as("min_id"),
            max(col("doc_id")).as("max_id"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                min(doc_id) AS min_id, max(doc_id) AS max_id
              FROM documents GROUP BY lang, source ORDER BY lang, source""")),

    // Corpus unigram surprisal per doc — the perplexity-style quality
    // signal. Integer micro-nats before the per-doc sum, so the
    // aggregation is order-independent in any engine.
    QEntry("q92_unigram_surprisal",
      (s, d) => Retrieval.unigramSurprisal(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS term
                         FROM documents),
                   uc AS (SELECT term, count(*) AS c FROM t GROUP BY term),
                   n AS (SELECT count(*) AS n_toks FROM t),
                   sc AS (SELECT term,
                       CAST(round(ln(CAST(n.n_toks AS DOUBLE) / c) * 1000000.0) AS BIGINT)
                         AS s_micro
                     FROM uc CROSS JOIN n),
                   agg AS (SELECT doc_id, count(*) AS n_tok,
                       CAST(sum(s_micro) AS BIGINT) AS surp_sum_micro
                     FROM t JOIN sc USING (term) GROUP BY doc_id)
              SELECT doc_id, n_tok, surp_sum_micro,
                CAST(floor(surp_sum_micro / n_tok) AS BIGINT) AS mean_surprisal_micro
              FROM agg ORDER BY doc_id""")),

    // Train/eval split-leakage audit over the q57 md5-bucket split:
    // shared 8-gram shingles between eval docs and ANY train doc. The
    // Spark side joins on fused xxhash64 longs; the oracle re-derives
    // the same split and joins the n-gram STRINGS (hash-free twin).
    QEntry("q93_split_leakage",
      (s, d) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100
        val docs = Tables.documents(s, d)
          .withColumn("split", when(bucket < 80, "train").otherwise("eval"))
        Curation.splitLeakage(docs, "doc_id", "text", 8, "split", "train")
          .orderBy(col("doc_id"))
      },
      Some("""WITH sp AS (
                SELECT doc_id, text,
                  CASE WHEN ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT
                            % 100 < 80
                       THEN 'train' ELSE 'eval' END AS split
                FROM documents),
              sh AS (
                SELECT doc_id, split, unnest(list_distinct(list_transform(
                  range(1, len(toks) - 6),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] || ' ' ||
                       toks[i+3] || ' ' || toks[i+4] || ' ' || toks[i+5] || ' ' ||
                       toks[i+6] || ' ' || toks[i+7]))) AS g
                FROM (SELECT doc_id, split, string_split_regex(lower(text), '\s+') AS toks
                      FROM sp)
                WHERE len(toks) >= 8),
              tr AS (SELECT g, doc_id AS train_id FROM sh WHERE split = 'train'),
              te AS (SELECT doc_id, g FROM sh WHERE split <> 'train'),
              hits AS (
                SELECT te.doc_id, count(DISTINCT tr.train_id) AS n_train_docs,
                       count(*) AS n_shared_shingles
                FROM te JOIN tr USING (g) GROUP BY te.doc_id)
              SELECT sp.doc_id,
                CAST(coalesce(h.n_train_docs, 0) AS BIGINT) AS n_train_docs,
                CAST(coalesce(h.n_shared_shingles, 0) AS BIGINT) AS n_shared_shingles
              FROM sp LEFT JOIN hits h ON sp.doc_id = h.doc_id
              WHERE sp.split <> 'train'
              ORDER BY sp.doc_id""")),

    // Parquet schema evolution under the gate: an old batch written with
    // 2 columns, a new batch with 3, one mergeSchema read over both —
    // rows from the old layout surface the new column as NULL. The
    // oracle computes the same aggregate from the original table, so a
    // wrong NULL-fill, a dropped batch, or a bad partition-discovery
    // shows up as a hash mismatch.
    QEntry("q94_schema_evolution",
      (s, d) => {
        val path = Scratch.dir(s, "schema_evo_q94")
        val docs = Tables.documents(s, d)
        docs.filter(col("doc_id") % 2 === 0)
          .select(col("doc_id"), col("lang"))
          .write.mode("overwrite").parquet(s"$path/batch=1")
        docs.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("lang"), col("n_chars"))
          .write.mode("overwrite").parquet(s"$path/batch=2")
        s.read.option("mergeSchema", "true").parquet(path)
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("sum_chars_new_batch"),
            count(col("n_chars")).as("n_new_batch"))
          .orderBy(col("lang"))
      },
      Some("""SELECT lang, count(*) AS n_docs,
                CAST(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS BIGINT)
                  AS sum_chars_new_batch,
                count(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS n_new_batch
              FROM documents GROUP BY lang ORDER BY lang""")),

    // Partitioned layout + partition pruning: write partitioned by lang,
    // read back with a lang filter — the filter must prune DIRECTORIES
    // (PartitionFilters, plan-gated), not scan-and-discard rows. The
    // oracle recomputes from the unpartitioned original.
    QEntry("q95_partition_pruning",
      (s, d) => {
        val path = Scratch.dir(s, "part_q95")
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
          .write.mode("overwrite").partitionBy("lang").parquet(path)
        s.read.parquet(path)
          .filter(col("lang") === "en")
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
          .orderBy(col("source"))
      },
      Some("""SELECT source, count(*) AS n_docs,
                CAST(sum(n_chars) AS BIGINT) AS sum_chars
              FROM documents WHERE lang = 'en'
              GROUP BY source ORDER BY source""")),

    // Data-mixture rebalancing: equalize per-language token shares by
    // computing each language's keep rate from a 20k-token budget, then
    // applying the deterministic md5-bucket rule. Two keyed aggs + a
    // strata-sized broadcast; the filter itself is zero-shuffle.
    QEntry("q96_mixture_rebalance",
      (s, d) => Curation.rebalanceMixture(
          Tables.documents(s, d)
            .select(col("doc_id"), col("lang"),
              size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok")),
          "doc_id", "lang", "n_tok", 20000L, "mix")
        .select(col("doc_id"), col("lang"), col("n_tok"), col("rate"), col("bucket"))
        .orderBy(col("doc_id")),
      Some("""WITH t AS (SELECT doc_id, lang,
                     CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS n_tok
                   FROM documents),
                   tot AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS stratum_tokens
                           FROM t GROUP BY lang),
                   r AS (SELECT lang,
                           least(100, CAST(floor(20000 * 100.0 / stratum_tokens) AS BIGINT))
                             AS rate
                         FROM tot),
                   k AS (SELECT t.doc_id, t.lang, t.n_tok, r.rate,
                           ('0x' || substr(md5(cast(t.doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT
                             % 100 AS bucket
                         FROM t JOIN r USING (lang))
              SELECT doc_id, lang, n_tok, rate, bucket FROM k
              WHERE bucket < rate ORDER BY doc_id""")),

    // JSON sink + schema-inferred scan roundtrip (the write-side twin of
    // q69's JSONL ingest): corruption anywhere in the sink/scan loop
    // hash-fails against the parquet-original oracle.
    QEntry("q97_json_sink_roundtrip",
      (s, d) => {
        val path = Scratch.dir(s, "json_q97")
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
          .write.mode("overwrite").json(path)
        s.read.json(path)
          .groupBy(col("lang"), col("source"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("n_chars")).as("chars_total"),
            min(col("doc_id")).as("first_id"),
            max(col("doc_id")).as("last_id"))
          .orderBy(col("lang"), col("source"))
      },
      Some("""SELECT lang, source, count(*) AS n_rows,
                CAST(sum(n_chars) AS BIGINT) AS chars_total,
                min(doc_id) AS first_id, max(doc_id) AS last_id
              FROM documents GROUP BY lang, source ORDER BY lang, source""")),

    // PMI bigram collocations (count >= 3): adjacent-token pairs via
    // zip_with (no explode of position indices), integer counts, one ln()
    // at the rounded edge. See Retrieval.pmiBigrams.
    QEntry("q91_pmi_bigrams",
      (s, d) => Retrieval.pmiBigrams(Tables.documents(s, d), "text", 3L)
        .orderBy(col("w1"), col("w2")),
      Some("""WITH t AS (SELECT string_split_regex(lower(text), '\s+') AS toks
                         FROM documents),
                   uni AS (SELECT unnest(toks) AS w FROM t),
                   uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
                   pr AS (SELECT unnest(list_transform(range(1, len(toks)),
                            i -> toks[i] || ' ' || toks[i+1])) AS g
                          FROM t WHERE len(toks) >= 2),
                   ps AS (SELECT split_part(g, ' ', 1) AS w1,
                                 split_part(g, ' ', 2) AS w2 FROM pr),
                   bi AS (SELECT w1, w2, count(*) AS c_xy FROM ps GROUP BY w1, w2
                          HAVING count(*) >= 3),
                   nu AS (SELECT CAST(count(*) AS BIGINT) AS n_uni FROM uni),
                   nb AS (SELECT count(*) AS n_bi FROM ps)
              SELECT bi.w1, bi.w2, bi.c_xy,
                round(ln((CAST(bi.c_xy AS DOUBLE) * nu.n_uni * nu.n_uni) /
                         ((CAST(nb.n_bi AS DOUBLE) * x.c) * y.c)), 6) AS pmi
              FROM bi JOIN uc x ON bi.w1 = x.w JOIN uc y ON bi.w2 = y.w
              CROSS JOIN nu CROSS JOIN nb
              ORDER BY bi.w1, bi.w2"""))
  )
}
