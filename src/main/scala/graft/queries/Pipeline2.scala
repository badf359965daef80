package graft.queries

import org.apache.spark.sql.functions._

import graft.operators.{HeavyHitters, MultiDistinct, RangeJoin}
import graft.pipeline.{Dedup, Multimodal, Similarity, Skew}

/** Round-4 scale-operator pack: interval join, all-pairs embedding
  * near-dup, exact n-gram Jaccard join, multi-distinct without Expand,
  * and exact heavy hitters — each the scale-safe formulation of an
  * operation Spark either lacks or plans with a 100TB-hostile shape
  * (cartesian range joins, Expand-multiplied distincts, full-key-set
  * shuffles for top-frequency queries).
  */
object Pipeline2 {

  /** DuckDB twin of the q60 bucket: sign bits of the +-qe parity-mix
    * projection, integer-exact (same weights as
    * Similarity.cosineNearDupPairs). */
  private[queries] def duckBucketBits(nBits: Int): String =
    (0 until nBits).map { b =>
      s"""(CASE WHEN list_sum(list_transform(range(64),
         |  i -> CASE WHEN (i*2654435761 + $b*40503)%97 < 48
         |       THEN qe[i+1] ELSE -qe[i+1] END)) >= 0
         |  THEN ${1 << b} ELSE 0 END)""".stripMargin
    }.mkString(" + ")

  val entries: Seq[QEntry] = Seq(

    // Interval containment join (events x per-user audit windows) via
    // the binned equality-join rewrite — a bare BETWEEN join plans as
    // BroadcastNestedLoopJoin (O(points x intervals) compares); binning
    // makes it a hash join (operators/RangeJoin.scala).
    QEntry("q59_interval_join",
      (s, d) => {
        val e = Tables.events(s, d)
          .select(col("event_id"), expr("ts div 1000").as("us"), col("value"))
        val w = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(min(expr("ts div 1000")).as("lo"))
          .select(col("user_id").as("win_id"), col("lo"),
            (col("lo") + (col("user_id") % 7 + 1) * 60000000L).as("hi"))
        RangeJoin.binned(e, "us", w, "lo", "hi", binWidth = 7L * 60000000L)
          .groupBy(col("win_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(round(col("value") * 100, 0).cast("long")).cast("long").as("value_cents"))
          .orderBy(col("win_id"))
      },
      Some("""WITH e AS (SELECT event_id, epoch_us(ts) AS us, value FROM events),
              w AS (SELECT user_id AS win_id, min(epoch_us(ts)) AS lo,
                      min(epoch_us(ts)) + (user_id % 7 + 1) * 60000000 AS hi
                    FROM events GROUP BY user_id)
              SELECT win_id, count(*) AS n_events,
                CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents
              FROM w JOIN e ON e.us BETWEEN w.lo AND w.hi
              GROUP BY win_id ORDER BY win_id""")),

    // All-pairs embedding near-dup: hyperplane-LSH candidates + exact
    // quantized cosine — integer-exact end to end, so the ORACLE rebuilds
    // collapse, buckets, candidates and scores bit-for-bit (unlike the
    // xxhash64 operators q37/q53's production twins). DEFAULT contract
    // (VERDICT r10 item 1): bit-identical quantized vectors collapse to
    // min-id reps BEFORE bucketing — duplicate vectors collide in every
    // bucket and pair cost is Σ bucket² (measured ~100× at 10 corpus
    // copies) — output = dup membership ∪ rep near pairs, each near pair
    // carrying its implied cross-duplicate pair count.
    QEntry("q60_cosine_pairs_lsh",
      (s, d) => Similarity.cosineNearDupPairs(
        Tables.embeddings(s, d).select(col("vec_id"), col("embedding")),
        dim = 64, nBits = 4, threshold = 0.35)
        .orderBy(col("kind"), col("a_id"), col("b_id")),
      Some(s"""WITH q AS (
                SELECT vec_id, list_transform(embedding,
                  v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              kq AS (
                SELECT vec_id, qe,
                  md5(list_aggregate(list_transform(qe,
                    x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS k
                FROM q),
              grp AS (
                SELECT k, min(vec_id) AS rep_id, count(*) AS n_dups
                FROM kq GROUP BY k),
              repv AS (
                SELECT g.rep_id AS vec_id, kq.qe, g.n_dups
                FROM grp g JOIN kq ON kq.vec_id = g.rep_id),
              dups AS (
                SELECT 'dup' AS kind, g.rep_id AS a_id, kq.vec_id AS b_id,
                  CAST(list_sum(list_transform(kq.qe, x -> x*x)) AS BIGINT) AS dot,
                  CAST(1.0 AS DOUBLE) AS cos4, CAST(1 AS BIGINT) AS implied_pairs
                FROM kq JOIN grp g USING (k)
                WHERE kq.vec_id != g.rep_id),
              bk AS (SELECT vec_id, qe, n_dups, ${duckBucketBits(4)} AS bucket
                     FROM repv),
              pairs AS (
                SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                  CAST(list_sum(list_transform(range(len(a.qe)),
                    i -> a.qe[i+1] * b.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(a.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(b.qe, x -> x*x)) AS BIGINT) AS nb,
                  a.n_dups AS nda, b.n_dups AS ndb
                FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id),
              near AS (
                SELECT 'near' AS kind, a_id, b_id, dot,
                  round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos4,
                  CAST(nda * ndb AS BIGINT) AS implied_pairs
                FROM pairs
                WHERE dot / (sqrt(na) * sqrt(nb)) >= 0.35)
              SELECT * FROM dups UNION ALL SELECT * FROM near
              ORDER BY kind, a_id, b_id""")),

    // Exact n-gram Jaccard similarity JOIN (prefix-filtered AllPairs),
    // under the DEFAULT contract: exact duplicates collapse to min-id
    // reps first (VERDICT r10 item 1 — the measured 155× sf≈10
    // duplicate-squaring pathology, fixed at the path users run), output
    // = `near` rep pairs with implied_pairs + `dup` membership edges.
    // The oracle replays the collapse, then the BRUTE-FORCE all-pairs
    // formulation over reps: prefix filtering is lossless, so the
    // driver gate itself proves the candidate pruning drops no pair.
    // n = 3 (word trigrams): on this corpus's 31-word vocabulary,
    // bigrams are so common that NO exact algorithm has selective
    // prefixes (measured: 6M candidates, ~half of brute force) — the
    // n-gram order must outgrow the vocabulary for rarity to exist
    // (trigrams: 122k candidates at sf0.1, 50x less). Tuning note in
    // Dedup.ngramJaccardPairs scaladoc. The fixture has no byte dups
    // (dup branch empty here; q275 plants dups to exercise it).
    QEntry("q61_ngram_jaccard",
      (s, d) => Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, tNum = 4, tDen = 5)
        .orderBy(col("kind"), col("a_id"), col("b_id")),
      Some("""WITH grp AS (
                SELECT md5(text) AS h, min(doc_id) AS keep_id,
                  count(*) AS n_dups
                FROM documents GROUP BY 1),
              reps AS (
                SELECT d.doc_id, d.text, g.n_dups
                FROM documents d JOIN grp g ON g.keep_id = d.doc_id),
              members AS (
                SELECT g.keep_id AS rep_id, d.doc_id AS member_id
                FROM documents d JOIN grp g ON g.h = md5(d.text)
                WHERE d.doc_id <> g.keep_id),
              t AS (
                SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
                FROM reps),
              g AS (
                SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS gs
                FROM t WHERE len(toks) >= 3),
              e AS (SELECT doc_id, unnest(gs) AS tok FROM g),
              sz AS (SELECT doc_id, len(gs) AS ntok FROM g),
              inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
                FROM e a JOIN e b ON a.tok = b.tok AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
              near AS (
                SELECT 'near' AS kind, i.a_id, i.b_id, i.inter,
                  sa.ntok + sb.ntok - i.inter AS uni,
                  CAST(ra.n_dups * rb.n_dups AS BIGINT) AS implied_pairs
                FROM inter i
                JOIN sz sa ON sa.doc_id = i.a_id
                JOIN sz sb ON sb.doc_id = i.b_id
                JOIN reps ra ON ra.doc_id = i.a_id
                JOIN reps rb ON rb.doc_id = i.b_id
                WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
              dup AS (
                SELECT 'dup' AS kind, m.rep_id AS a_id,
                  m.member_id AS b_id, s.ntok AS inter, s.ntok AS uni,
                  CAST(1 AS BIGINT) AS implied_pairs
                FROM members m JOIN sz s ON s.doc_id = m.rep_id)
              SELECT * FROM near UNION ALL SELECT * FROM dup
              ORDER BY kind, a_id, b_id""")),

    // Multi-column exact COUNT(DISTINCT) without Expand
    // (operators/MultiDistinct.scala): per-column two-phase dedup joined
    // on the keys, vs Spark's (k+1)x input-row Expand plan.
    QEntry("q62_multi_distinct",
      (s, d) => MultiDistinct.exact(Tables.lineitem(s, d),
        keys = Seq("l_returnflag"),
        distincts = Seq("nd_part" -> "l_partkey", "nd_supp" -> "l_suppkey"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(*) AS cnt,
               count(DISTINCT l_partkey) AS nd_part,
               count(DISTINCT l_suppkey) AS nd_supp
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Frame sampling (Multimodal.sampleFrames): every 4th 64-byte
    // "frame" of each payload, iterator fan-out inside mapPartitions.
    // The stub chunking is deterministic, so unlike the metadata-only
    // q35 this gate covers the typed FAN-OUT path. Oracle chunks the
    // VARCHAR (fixture text is pure ASCII → same bytes; DuckDB 1.0 has
    // no BLOB substring).
    QEntry("q67_frame_sample",
      (s, d) => {
        import s.implicits._
        Multimodal.sampleFrames(
          Multimodal.asMediaTable(Tables.documents(s, d)).as[Multimodal.MediaCell],
          frameBytes = 64, everyK = 4)
          .toDF()
          .orderBy(col("media_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id AS media_id, i AS frame_idx,
               CAST(length(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS BIGINT) AS n_bytes,
               sha256(substr(text, CAST(i*64+1 AS BIGINT), 64)) AS sha256_hex
              FROM documents,
                unnest(range(0, CAST(ceil(length(text)/64.0) AS BIGINT), 4)) AS t(i)
              ORDER BY media_id, frame_idx""")),

    // The salted fact-dim join under the gate (SkewSpec pins plan shape;
    // this pins RESULTS == the plain join, via the unsalted oracle).
    QEntry("q68_skew_salted_join",
      (s, d) => Skew.saltedJoin(
        fact = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"),
          round(col("l_extendedprice") * 100, 0).cast("long").as("cents")),
        dim = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        factKey = "l_suppkey", dimKey = "s_suppkey",
        uniq = col("l_orderkey"), buckets = 16)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("cents")).cast("long").as("cents"))
        .orderBy(col("s_nationkey")),
      Some("""SELECT s_nationkey, count(*) AS cnt,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS cents
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              GROUP BY s_nationkey ORDER BY s_nationkey""")),

    // Sketch-family aggregation under an ACCURACY-CONTRACT oracle: the
    // query outputs the exact value plus a boolean tolerance claim about
    // the approximate twin; the oracle selects the exact value and
    // literal TRUE — so the driver's hash-compare FAILS if the sketch
    // estimate ever drifts outside the contract. (The estimate itself is
    // deterministic but engine-specific, so it can't be hash-compared
    // directly.) At 100 TB the sketch is the production path: HLL++
    // merges in fixed memory per group vs the exact rewrite's
    // per-column dedup shuffle (q62).
    QEntry("q65_approx_distinct",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(count_distinct(col("l_partkey")).as("nd_exact"),
          approx_count_distinct(col("l_partkey"), 0.05).as("nd_approx"))
        .select(col("l_returnflag"), col("nd_exact"),
          (abs(col("nd_approx") - col("nd_exact")) <= col("nd_exact") * 0.10)
            .as("within_10pct"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag, count(DISTINCT l_partkey) AS nd_exact,
               TRUE AS within_10pct
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Same contract for quantile sketches: GK-style percentile_approx
    // (rank error <= n/accuracy) against the exact interpolated
    // percentile (which DuckDB's quantile_cont reproduces exactly for
    // integer inputs at p=0.5 — memory: dyadic fractions).
    QEntry("q66_approx_percentile",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_returnflag"))
        .agg(percentile(col("l_quantity"), lit(0.5)).as("p50_exact"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("p50_approx"))
        .select(col("l_returnflag"), col("p50_exact"),
          (abs(col("p50_approx") - col("p50_exact")) <= lit(1.0)).as("within_1"))
        .orderBy(col("l_returnflag")),
      Some("""SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50_exact,
               TRUE AS within_1
              FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // BPE-ish subword token estimate (TextAnalysis.subwordCountApprox)
    // under the gate. The Spark side splits with a lookbehind regex
    // (pieces end after any 4-letter run or at non-alnum); DuckDB's RE2
    // has no lookbehind, so the oracle computes the equivalent closed
    // form: per maximal alnum run, 1 piece + one boundary per position
    // with 4 preceding letters (parity prototyped over edge cases:
    // digits break letter runs, boundary at run end adds nothing).
    QEntry("q64_subword_tokens",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          graft.pipeline.TextAnalysis.subwordCountApprox(col("text"))
            .cast("long").as("n_subword"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
               CAST(coalesce(list_sum(list_transform(
                 list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                             r -> length(r) > 0),
                 r -> 1 + len(list_filter(range(4, length(r)),
                   i -> regexp_matches(substr(r, CAST(i-3 AS INTEGER), 4),
                                       '^[a-z]{4}$'))))), 0) AS BIGINT)
                 AS n_subword
              FROM documents ORDER BY doc_id""")),

    // Exact heavy hitters (> n/20 of rows) over a deterministic
    // hot/long-tail key mix: Misra-Gries candidates per partition, exact
    // recount — output is exact, so the plain GROUP BY/HAVING oracle
    // pins it (operators/HeavyHitters.scala). Key derivation is md5-based
    // like q57 so both engines build the identical skew.
    QEntry("q63_heavy_hitters",
      (s, d) => {
        val res = conv(substring(md5(col("l_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long")
        val key = when(res % 100 < 40, concat(lit("hot_"), (res % 4).cast("string")))
          .otherwise(concat(lit("tail_"), (res % 50000).cast("string")))
        HeavyHitters.exact(Tables.lineitem(s, d).select(key.as("key")),
          col("key"), k = 20)
          .orderBy(col("key"))
      },
      Some("""WITH k AS (
                SELECT CASE WHEN r % 100 < 40
                         THEN 'hot_' || CAST(r % 4 AS VARCHAR)
                         ELSE 'tail_' || CAST(r % 50000 AS VARCHAR) END AS key
                FROM (SELECT ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8))::BIGINT AS r
                      FROM lineitem))
              SELECT key, count(*) AS cnt FROM k GROUP BY key
              HAVING count(*) * 20 > (SELECT count(*) FROM lineitem)
              ORDER BY key"""))
  )
}
