package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-3, fourth pack: hybrid-retrieval fusion, the
  * watermark-sizing lateness audit (exact two-pass global running max),
  * phrase-vs-AND search precision, and the word2vec negative-sampling
  * table with exact integer n^(3/4). Conventions unchanged.
  */
object Pipeline16 {

  val entries: Seq[QEntry] = Seq(

    // Reciprocal-rank fusion of the two retrieval arms the suite
    // already ships: lexical BM25 top-5 (the q128 chain) and semantic
    // cosine top-5 (the q36 chain), fused per (query, doc) as
    // Σ 1e6 div (60 + rank) — the standard hybrid-search combiner
    // (k = 60, Cormack et al. 2009), in exact integers so the fused
    // order replays. Queries are the doc_id % 100 == 0 docs; the
    // semantic arm keys on vec_id == doc_id (the fixture's aligned id
    // space). A doc missing from one arm contributes 0 from it — the
    // outer-join semantics real fusers use. Scale shape: both arms are
    // their existing operators; fusion adds one (q, doc)-keyed outer
    // join of two ≤ k-per-query frames and a per-query window.
    QEntry("q209_rrf_fusion",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val qs = docs.filter(col("doc_id") % 100 === 0)
          .select(col("doc_id").as("q_id"),
            array_join(slice(split(lower(col("text")), "\\s+"), 1, 6), " ")
              .as("qtext"))
        val lex = graft.pipeline.Retrieval
          .bm25Search(qs, docs, "doc_id", "text", k = 5)
          .select(col("q_id"), col("doc_id").as("id"),
            col("rn").cast("long").as("lex_rn"))
        val emb = Tables.embeddings(s, d)
        val sem = graft.pipeline.Similarity.cosineTopK(
            emb.filter(col("vec_id") % 100 === 0)
              .select(col("vec_id").as("q_id"), col("embedding")),
            emb, 5)
          .select(col("q_id"), col("vec_id").as("id"),
            col("rn").cast("long").as("sem_rn"))
        val fused = lex.join(sem, Seq("q_id", "id"), "outer")
          .select(col("q_id"), col("id"),
            coalesce(col("lex_rn"), lit(0L)).as("lex_rn"),
            coalesce(col("sem_rn"), lit(0L)).as("sem_rn"))
          .withColumn("rrf_micro",
            expr("CASE WHEN lex_rn > 0 THEN 1000000 div (60 + lex_rn) " +
              "ELSE 0 END + " +
              "CASE WHEN sem_rn > 0 THEN 1000000 div (60 + sem_rn) " +
              "ELSE 0 END"))
        fused.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("q_id"))
              .orderBy(col("rrf_micro").desc, col("id"))))
          .filter(col("rn") <= 5)
          .orderBy(col("q_id"), col("rn"))
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
              lex AS (
                SELECT q_id, doc_id AS id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY score_micro DESC, doc_id) AS BIGINT) AS lex_rn
                FROM lscored
                QUALIFY lex_rn <= 5),
              qz AS (
                SELECT vec_id AS q_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings WHERE vec_id % 100 = 0),
              cz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS ce
                FROM embeddings),
              sscored AS (
                SELECT q_id, vec_id,
                  CAST(list_sum(list_transform(range(len(qe)),
                       i -> qe[i+1] * ce[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(ce, x -> x*x)) AS BIGINT) AS nb
                FROM qz, cz),
              sem AS (
                SELECT q_id, vec_id AS id,
                  CAST(row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id)
                    AS BIGINT) AS sem_rn
                FROM sscored
                QUALIFY sem_rn <= 5),
              fused AS (
                SELECT coalesce(l.q_id, s.q_id) AS q_id,
                  coalesce(l.id, s.id) AS id,
                  coalesce(l.lex_rn, 0) AS lex_rn,
                  coalesce(s.sem_rn, 0) AS sem_rn,
                  (CASE WHEN coalesce(l.lex_rn, 0) > 0
                     THEN 1000000 // (60 + l.lex_rn) ELSE 0 END) +
                  (CASE WHEN coalesce(s.sem_rn, 0) > 0
                     THEN 1000000 // (60 + s.sem_rn) ELSE 0 END) AS rrf_micro
                FROM lex l FULL OUTER JOIN sem s
                  ON s.q_id = l.q_id AND s.id = l.id)
              SELECT q_id, id, lex_rn, sem_rn,
                CAST(rrf_micro AS BIGINT) AS rrf_micro,
                CAST(row_number() OVER (PARTITION BY q_id
                  ORDER BY rrf_micro DESC, id) AS INT) AS rn
              FROM fused
              QUALIFY rn <= 5
              ORDER BY q_id, rn""")),

    // Late-arrival audit — the watermark-sizing question: for each
    // event in ARRIVAL order, lateness = (max event-time seen so far)
    // − its event-time; histogram per event type over the watermark-
    // relevant buckets. The fixture's ingest order equals event time,
    // so the arrival sequence is DERIVED (the q101/q129 trick — both
    // engines build it identically): 10% of events (id % 10 == 7)
    // arrive 5 positions late (the minutes-tail at gate density), 1%
    // (id % 100 == 13) 900 late (the hours-tail) — the
    // minutes-tail and the hours-tail a real pipeline sees. The global
    // running max is EXACT and two-pass (max is associative): block
    // the arrival axis into fixed ranges, per-block max → prefix max
    // over the tiny block dimension (broadcast), in-block running max
    // via a block-keyed window — the GlobalRank discipline; no single-
    // partition window ever sees the corpus.
    QEntry("q210_late_arrival",
      (s, d) => {
        val block = 1000L
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            expr("ts div 1000").as("us"))
          .withColumn("arrival",
            col("event_id") +
              when(col("event_id") % 100 === 13, 900L)
                .when(col("event_id") % 10 === 7, 5L).otherwise(0L))
          .withColumn("blk", expr(s"arrival div $block"))
          .localCheckpoint() // feeds block maxima AND the in-block pass
        // block-maxima DIMENSION contract, guarded (VERDICT r11 item 4):
        // #blocks = n/1000 must stay one-task-sortable for the prefix max.
        val blkMax = graft.pipeline.Stats.boundedDim(
          ev.groupBy(col("blk")).agg(max(col("us")).as("bmax")),
          "q210_late_arrival block maxima")
        val blkPrev = blkMax // prefix max of all STRICTLY EARLIER blocks
          .withColumn("prev_max", max(col("bmax")).over(
            org.apache.spark.sql.expressions.Window.orderBy(col("blk"))
              .rowsBetween(Long.MinValue, -1))) // O(#blocks) rows total
          .select(col("blk"), col("prev_max"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("blk")).orderBy(col("arrival"), col("event_id"))
        val late = ev
          .withColumn("run_in_blk", max(col("us")).over(w))
          .join(broadcast(blkPrev), "blk")
          .select(col("event_type"),
            (greatest(coalesce(col("prev_max"), lit(Long.MinValue)),
              col("run_in_blk")) - col("us")).as("late_us"))
        late.select(col("event_type"),
            when(col("late_us") <= 0, "a_ontime")
              .when(col("late_us") <= 60L * 1000000L, "b_1min")
              .when(col("late_us") <= 3600L * 1000000L, "c_1hour")
              .otherwise("d_later").as("bucket"),
            col("late_us"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(count(lit(1)).as("n"), max(col("late_us")).as("max_late_us"))
          .orderBy(col("event_type"), col("bucket"))
      },
      Some("""WITH ev AS (
                SELECT event_id, event_type, epoch_us(ts) AS us,
                  event_id + (CASE WHEN event_id % 100 = 13 THEN 900
                    WHEN event_id % 10 = 7 THEN 5 ELSE 0 END) AS arrival
                FROM events),
              run AS (
                SELECT event_type,
                  max(us) OVER (ORDER BY arrival, event_id
                    ROWS UNBOUNDED PRECEDING) - us AS late_us
                FROM ev),
              b AS (
                SELECT event_type,
                  CASE WHEN late_us <= 0 THEN 'a_ontime'
                       WHEN late_us <= 60000000 THEN 'b_1min'
                       WHEN late_us <= 3600000000 THEN 'c_1hour'
                       ELSE 'd_later' END AS bucket,
                  late_us
                FROM run)
              SELECT event_type, bucket, count(*) AS n,
                CAST(max(late_us) AS BIGINT) AS max_late_us
              FROM b GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Phrase-vs-AND precision: for the corpus's 5 most frequent
    // bigrams, how many docs contain the exact ADJACENT phrase vs both
    // tokens anywhere — the false-positive rate a search engine pays
    // when it degrades phrase queries to AND semantics (and the reason
    // positional indexes exist). Adjacency comes from the bigram
    // explode (q193's positional grams); the AND side is two distinct
    // unigram containments. All keyed aggs and ≤ 5-row broadcast dims.
    QEntry("q211_phrase_vs_and",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .filter(size(col("toks")) >= 2)
          .localCheckpoint() // feeds bigram counts, phrase + AND sides
        val bi = toks.select(col("doc_id"),
          explode(expr("transform(sequence(1, size(toks) - 1), " +
            "i -> struct(array_join(slice(toks, i, 2), ' ') AS g, " +
            "element_at(toks, i) AS t1, " +
            "element_at(toks, i + 1) AS t2))")).as("e"))
        val top = bi.groupBy(col("e.g").as("g"))
          .agg(count(lit(1)).as("n"),
            first(col("e.t1")).as("t1"), first(col("e.t2")).as("t2"))
          .orderBy(col("n").desc, col("g")).limit(5)
          .localCheckpoint() // 5-row phrase dimension
        val phraseDocs = bi.select(col("doc_id"), col("e.g").as("g"))
          .distinct()
          .join(broadcast(top.select(col("g"))), "g")
          .groupBy(col("g")).agg(count(lit(1)).as("n_phrase_docs"))
        val uni = toks.select(col("doc_id"), explode(col("toks")).as("t"))
          .distinct()
        val andDocs = uni
          .join(broadcast(top.select(col("g"), col("t1"))),
            col("t") === col("t1"))
          .select(col("g"), col("doc_id"))
          .join(uni.join(broadcast(top.select(col("g").as("g2"),
              col("t2"))), col("t") === col("t2"))
            .select(col("g2"), col("doc_id").as("d2")),
            col("g") === col("g2") && col("doc_id") === col("d2"))
          .groupBy(col("g")).agg(count(lit(1)).as("n_and_docs"))
        top.select(col("g").as("phrase"), col("n").as("n_occurrences"))
          .join(phraseDocs.select(col("g").as("phrase"),
            col("n_phrase_docs")), "phrase")
          .join(andDocs.select(col("g").as("phrase"), col("n_and_docs")),
            "phrase")
          .select(col("phrase"), col("n_occurrences"),
            col("n_phrase_docs"), col("n_and_docs"),
            expr("(n_phrase_docs * 10000) div n_and_docs")
              .as("precision_bp"))
          .orderBy(col("phrase"))
      },
      Some("""WITH t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM documents
                WHERE len(string_split_regex(lower(text), '\s+')) >= 2),
              bi AS (
                SELECT doc_id,
                  unnest(list_transform(range(1, len(toks)),
                    i -> struct_pack(g := toks[i] || ' ' || toks[i+1],
                      t1 := toks[i], t2 := toks[i+1]))) AS e
                FROM t),
              cnt AS (
                SELECT e.g AS g, count(*) AS n,
                  min(e.t1) AS t1, min(e.t2) AS t2
                FROM bi GROUP BY e.g),
              top AS (
                SELECT g, n, t1, t2 FROM cnt
                ORDER BY n DESC, g LIMIT 5),
              pd AS (
                SELECT b.e.g AS g, count(DISTINCT b.doc_id) AS n_phrase_docs
                FROM bi b JOIN top ON top.g = b.e.g
                GROUP BY b.e.g),
              uni AS (
                SELECT DISTINCT doc_id, unnest(toks) AS tk FROM t),
              ad AS (
                SELECT top.g, count(*) AS n_and_docs
                FROM top
                JOIN uni u1 ON u1.tk = top.t1
                JOIN uni u2 ON u2.tk = top.t2 AND u2.doc_id = u1.doc_id
                GROUP BY top.g)
              SELECT top.g AS phrase, CAST(top.n AS BIGINT)
                  AS n_occurrences,
                CAST(pd.n_phrase_docs AS BIGINT) AS n_phrase_docs,
                CAST(ad.n_and_docs AS BIGINT) AS n_and_docs,
                CAST((pd.n_phrase_docs * 10000) // ad.n_and_docs AS BIGINT)
                  AS precision_bp
              FROM top JOIN pd ON pd.g = top.g JOIN ad ON ad.g = top.g
              ORDER BY phrase""")),

    // word2vec negative-sampling table: the unigram distribution raised
    // to 3/4 (Mikolov et al. 2013 — flattens the head so frequent
    // tokens aren't drawn proportionally) in EXACT integers:
    // floor(n^(3/4)) = isqrt(isqrt(n³)) — the nested-floor-of-sqrt
    // identity — with the ±1 correction at each level (valid for
    // n < 2^21 ≈ 2M per-token count before n³ overflows int64; the
    // per-token counts a 100 TB vocab table carries are per-SHARD
    // partials well under that, summed downstream). One corpus token
    // agg; the vocab dimension carries the rest.
    QEntry("q212_negative_sampling",
      (s, d) => {
        def isqrt(c: String) =
          s"""CASE WHEN (s_$c+1)*(s_$c+1) <= $c THEN s_$c+1
              WHEN s_$c*s_$c > $c THEN s_$c-1 ELSE s_$c END"""
        val n = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "\\s+")).as("term"))
          .groupBy(col("term")).agg(count(lit(1)).as("n"))
        val w = n
          .withColumn("cube", expr("n * n * n"))
          .withColumn("s_cube",
            expr("CAST(floor(sqrt(CAST(cube AS DOUBLE))) AS BIGINT)"))
          .withColumn("r1", expr(isqrt("cube")))
          .withColumn("s_r1",
            expr("CAST(floor(sqrt(CAST(r1 AS DOUBLE))) AS BIGINT)"))
          .withColumn("w", expr(isqrt("r1")))
          .select(col("term"), col("n"), col("w"))
        val tot = w.agg(sum(col("w")).as("tw"))
        w.crossJoin(broadcast(tot))
          .select(col("term"), col("n"), col("w"),
            expr("(w * 1000000) div tw").as("prob_ppm"))
          .orderBy(col("term"))
      },
      Some("""WITH n AS (
                SELECT unnest(string_split_regex(lower(text), '\s+'))
                  AS term
                FROM documents),
              c AS (SELECT term, count(*) AS n FROM n GROUP BY term),
              c1 AS (
                SELECT term, n, n * n * n AS cube,
                  CAST(floor(sqrt(CAST(n * n * n AS DOUBLE))) AS BIGINT)
                    AS s0
                FROM c),
              r1 AS (
                SELECT term, n,
                  CASE WHEN (s0+1)*(s0+1) <= cube THEN s0+1
                       WHEN s0*s0 > cube THEN s0-1 ELSE s0 END AS r1
                FROM c1),
              c2 AS (
                SELECT term, n, r1,
                  CAST(floor(sqrt(CAST(r1 AS DOUBLE))) AS BIGINT) AS s1
                FROM r1),
              w AS (
                SELECT term, n,
                  CASE WHEN (s1+1)*(s1+1) <= r1 THEN s1+1
                       WHEN s1*s1 > r1 THEN s1-1 ELSE s1 END AS w
                FROM c2),
              tot AS (SELECT sum(w) AS tw FROM w)
              SELECT term, CAST(n AS BIGINT) AS n, CAST(w AS BIGINT) AS w,
                CAST((w * 1000000) // tw AS BIGINT) AS prob_ppm
              FROM w, tot ORDER BY term"""))
  )
}
