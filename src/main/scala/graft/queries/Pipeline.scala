package graft.queries

import org.apache.spark.sql.functions._

import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators over documents/embeddings
  * (BASELINE.json north star): dedup (exact / Jaccard / MinHash-LSH /
  * SimHash), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis, multimodal plumbing. Oracle-checked wherever DuckDB can
  * express the semantics — including the MinHash/SimHash LSH pipelines,
  * which run here with PORTABLE md5-based hashes (q37/q38/q51/q53) so
  * DuckDB recomputes signature → banding → candidate → verify
  * bit-for-bit; the fused xxhash64 production paths in
  * [[graft.pipeline.Dedup]] keep their spec coverage (DedupSpec recall /
  * differential twins). Only genuinely approximate ANN (q39/q47) is
  * rows-only checked.
  */
object Pipeline {

  /** The q37 md5-twin MinHash+LSH pair construction under the DEFAULT
    * collapsed contract (VERDICT r10 item 1, mirroring
    * [[Dedup.minhashNearDupPairs]]): exact md5 collapse → signature →
    * banding → capped in-group combinations → exact token-Jaccard
    * verify at 4/5 over reps. Returns (kind, a_id, b_id, inter, uni,
    * implied_pairs), unordered. */
  private[queries] def minhashPairsMd5(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val docs = Tables.documents(s, d)
    val (reps, dupEdges) = Dedup.collapseExactDocs(docs, "doc_id", "text")
    val near = Dedup.verifyJaccard(minhashCandidatesOver(reps),
        Dedup.tokenArrays(reps, "doc_id", "text"), 0.0)
      .filter(col("inter") * 5 >= col("uni") * 4)
    // dup-edge eligibility: the rep shingles (>= 3 raw tokens — shorter
    // docs never band-collide); self-pair inter/uni = distinct tokens.
    val dupSize = reps
      .filter(size(split(lower(col("text")), "\\s+")) >= 3)
      .select(col("doc_id"),
        size(array_distinct(split(lower(col("text")), "\\s+")))
          .cast("long").as("sz"))
    Dedup.assembleCollapsed(near,
      reps.select(col("doc_id"), col("n_dups")), dupEdges, dupSize)
  }

  /** The candidate stage of [[minhashPairsMd5]] alone — distinct
    * (a_id, b_id) band-collision pairs, before any verify. The q145
    * recall eval verifies these against the 3-GRAM gram sets the
    * signature actually indexes. */
  private[queries] def minhashCandidatesMd5(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    minhashCandidatesOver(Tables.documents(s, d))

  private[queries] val MinHashP = 4294967311L // smallest prime > 2^32; h*a < 2^61 — ANSI-safe

  /** (doc_id, sigs) md5-twin MinHash signature frame over a corpus frame
    * — factored out of [[minhashBucketsMd5Over]] in round 18 so the
    * two-knob q457 gate computes signatures ONCE and bands them per
    * chain. Fused kernel (round 17, guide §4): one codegen'd pass per
    * doc replaces the interpreted per-shingle md5 lambda plus
    * 16 × array_min(transform(...)) — bit-identical (Md5SigSpec).
    * Layout note (round 18): a defaultParallelism repartition in front
    * of this projection was measured NET-NEGATIVE at sf0.1 (q387/q394
    * +2-4 s) — the consumers already run several-hundred-ms tasks and
    * the 32-way layout only multiplied per-task overhead; callers that
    * DO have a serial hot stage repartition at their own checkpoint
    * (q192, q383, the q456/q457 spine). */
  private[queries] def minhashSigsOver(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
      .select(col("doc_id"),
        graft.expressions.functions.ngram_shingles(col("toks"), 3, distinct = true)
          .as("shingles"))
      .filter(size(col("shingles")) > 0) // short docs can't band-collide
      .select(col("doc_id"), graft.expressions.functions
        .md5_minhash_sigs(col("shingles"), MinHashPerms, MinHashP).as("sigs"))

  /** (doc_id, band, bkey) band rows from a (doc_id, sigs) frame —
    * checkpointed (every consumer re-reads the signature lineage
    * otherwise). */
  private[queries] def bandsFromSigs(
      sig: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val bands = 4
    val rows = MinHashPerms.size / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rows).map(r =>
          element_at(col("sigs"), b * rows + r + 1)): _*).as("bkey"))
    }
    sig
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
      .localCheckpoint()
  }

  /** The (doc_id, band, bkey) band-bucket frame of the md5-twin MinHash
    * index over an explicit corpus frame — the shared substrate of
    * [[minhashCandidatesOver]] (pair emission) and the q454 bucket-
    * occupancy census (the saturation planner). */
  private[queries] def minhashBucketsMd5Over(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    bandsFromSigs(minhashSigsOver(docs))

  /** [[minhashCandidatesMd5]] over an explicit corpus frame — shared
    * with the collapsed [[minhashPairsMd5]], whose input is the rep
    * set, not the raw table. */
  private[queries] def minhashCandidatesOver(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    minhashCandidatesFromBuckets(minhashBucketsMd5Over(docs))

  /** Capped in-group pair emission over an existing bucket frame —
    * factored so q455 can reuse ONE signature build for candidate
    * generation and both of its occupancy censuses. */
  private[queries] def minhashCandidatesFromBuckets(
      buckets: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    val grouped = Dedup.dropOversizedBuckets(buckets, Seq("band", "bkey"), 1000)
      .groupBy(col("band"), col("bkey"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.as("a_id"), b.as("b_id")))))
    grouped.select(explode(combos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"))
      .distinct()
  }

  private[queries] val MinHashPerms = Seq(
    (1L, 0L), (1299721L, 12345L), (15485863L, 54321L), (32452843L, 98765L),
    (49979687L, 11L), (67867967L, 222L), (86028121L, 3333L), (104395301L, 44444L),
    (122949823L, 5L), (141650939L, 66L), (160481183L, 777L), (179424673L, 8888L),
    (198491317L, 99L), (217645177L, 101L), (236887691L, 2027L), (256203161L, 30011L))

  private val stopList = TextAnalysis.Stopwords.map(s => s"'$s'").mkString(", ")

  /** Portable 32-bit SimHash over the doc's token multiset: token hash =
    * first 8 md5 hex chars as uint32 (the q51 convention), bit j of the
    * signature set iff strictly more than half the tokens have bit j set
    * (ties → 0). Explode + 32 conditional sums: one map-side-combined
    * hash aggregate, fully codegen'd — the portable twin of the fused
    * zero-shuffle [[graft.pipeline.Dedup.simhash64]] (xxhash64), which
    * DuckDB cannot recompute. Both engines evaluate this formulation
    * bit-for-bit (q38 pins it; q53 builds its LSH on top).
    *
    * Non-null invariant (ADVICE r17): the fixture `documents.text` is
    * never null, and every caller feeds non-null text. NOTE the fused
    * kernel KEEPS a null-text row (null simhash) where the old explode
    * formulation (and the DuckDB unnest twin) dropped it — if a nullable
    * corpus ever reaches this, add `.filter(col(textCol).isNotNull)` at
    * the caller or the q38/q53/q387/q394 oracles will flag the drift. */
  private[queries] val SimBits = 32

  private[queries] def portableSimhash32(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    // Fused kernel (round 17, guide §2.4/§4): the explode + 33-aggregate
    // hash aggregation shuffled every TOKEN of the corpus just to count
    // per-doc hash bits; the signature is a pure per-row function of the
    // token multiset, so it now computes in one codegen'd pass with ZERO
    // shuffle — bit-identical (ties → 0, duplicates counted; see
    // expressions/Md5Sig.simhash32), q38/q53 oracles pin it.
    docs.select(col("doc_id"),
      graft.expressions.functions.md5_simhash32(
        split(lower(col("text")), "\\s+")).as("simhash"))

  /** DuckDB twin of [[portableSimhash32]] — CTEs ending in `sig(doc_id,
    * simhash)`, generated with the same bit constants. `from` lets the
    * collapsed q53 run it over the rep CTE instead of the raw table. */
  private def portableSimhashSql(from: String = "documents"): String = {
    val ones = (0 until SimBits).map(j =>
      s"CAST(sum((h>>$j)&1) AS BIGINT) AS o$j").mkString(", ")
    val sig = (0 until SimBits).map(j =>
      s"(CASE WHEN 2*o$j > n THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""tk AS (
          SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
          FROM $from),
        th AS (
          SELECT doc_id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h FROM tk),
        ag AS (
          SELECT doc_id, count(*) AS n, $ones FROM th GROUP BY doc_id),
        sig AS (
          SELECT doc_id, CAST($sig AS BIGINT) AS simhash FROM ag)"""
  }

  val entries: Seq[QEntry] = Seq(

    // Deterministic train/val/test assignment by md5 bucket of the key —
    // the sharding/sampling primitive every training pipeline needs
    // (seeded-RNG sampling isn't cross-engine reproducible; a hash of
    // the key is, and rebalances identically on any cluster size).
    QEntry("q57_hash_split",
      (s, d) => {
        val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
          .cast("long") % 100
        Tables.documents(s, d)
          .select(col("doc_id"),
            when(bucket < 80, "train").when(bucket < 90, "val")
              .otherwise("test").as("split"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
               CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
                    ELSE 'test' END AS split
              FROM (SELECT doc_id,
                      ('0x' || substr(md5(cast(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
                    FROM documents)
              ORDER BY doc_id""")),

    // Per-domain document cap (dedup-adjacent data curation: at most k
    // docs per (lang, source), deterministic keep order) — a partitioned
    // window, no global sort.
    QEntry("q58_per_group_cap",
      (s, d) => Tables.documents(s, d)
        .withColumn("rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("lang"), col("source")).orderBy(col("doc_id"))))
        .filter(col("rn") <= 5)
        .select(col("lang"), col("source"), col("doc_id"), col("rn"))
        .orderBy(col("lang"), col("source"), col("doc_id")),
      Some("""SELECT lang, source, doc_id, rn FROM (
                SELECT lang, source, doc_id,
                  row_number() OVER (PARTITION BY lang, source ORDER BY doc_id) AS rn
                FROM documents) WHERE rn <= 5
              ORDER BY lang, source, doc_id""")),

    QEntry("q30_dedup_exact",
      (s, d) => Dedup.exactGroups(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("text_md5")),
      Some("""SELECT md5(text) AS text_md5, min(doc_id) AS keep_id,
               count(*) AS n_dups
              FROM documents GROUP BY md5(text) ORDER BY text_md5""")),

    // Exact token-Jaccard on a defined candidate set (adjacent doc ids) —
    // integer-exact. The unbounded-candidate version is q37 (LSH).
    QEntry("q31_jaccard_adjacent",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val pairs = docs.select(col("doc_id").as("a_id"),
          (col("doc_id") + 1).as("b_id"))
        Dedup.verifyJaccard(pairs, Dedup.tokenArrays(docs, "doc_id", "text"), 0.0)
          // jaccard-0 pairs are never near-dup candidates; dropping them
          // also aligns with the oracle's inner join on shared tokens
          // (first diverges at sf0.1 — 3 adjacent pairs share no token)
          .filter(col("inter") > 0)
          .orderBy(col("a_id"))
      },
      Some("""WITH tok AS (
                SELECT doc_id,
                       unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS tok
                FROM documents),
              sizes AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
              inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
                FROM tok a JOIN tok b
                  ON a.tok = b.tok AND b.doc_id = a.doc_id + 1
                GROUP BY a.doc_id, b.doc_id)
              SELECT i.a_id, i.b_id, i.inter,
                     sa.ntok + sb.ntok - i.inter AS uni
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.a_id
              JOIN sizes sb ON sb.doc_id = i.b_id
              ORDER BY i.a_id""")),

    QEntry("q32_text_stats",
      (s, d) => {
        val f = TextAnalysis.qualityFacets(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"),
            f.getField("n_chars").as("n_chars"),
            f.getField("n_tokens").as("n_tokens"),
            f.getField("n_distinct").as("n_distinct"),
            f.getField("n_stop").as("n_stop"),
            f.getField("n_digits").as("n_digits"),
            f.getField("n_punct").as("n_punct"))
          .orderBy(col("doc_id"))
      },
      Some(s"""SELECT doc_id,
                length(text) AS n_chars,
                len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
                len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS n_distinct,
                len(list_filter(string_split_regex(lower(text), '\\s+'),
                    t -> t IN ($stopList))) AS n_stop,
                length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS n_digits,
                length(text) - length(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g')) AS n_punct
               FROM documents ORDER BY doc_id""")),

    QEntry("q33_lang_id",
      (s, d) => {
        val ls = TextAnalysis.langScores(col("text"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("lang").as("labeled"),
            ls.getField("en").as("en"), ls.getField("es").as("es"),
            ls.getField("de").as("de"), ls.getField("fr").as("fr"),
            ls.getField("pred").as("pred"))
          .orderBy(col("doc_id"))
      },
      Some {
        def occ(m: String) =
          s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INTEGER)"
        val en = s"${occ(" the ")} + ${occ(" and ")} + ${occ(" with ")}"
        val es = s"${occ(" el ")} + ${occ(" los ")} + ${occ(" con ")}"
        val de = s"${occ(" der ")} + ${occ(" und ")} + ${occ(" mit ")}"
        val fr = s"${occ(" le ")} + ${occ(" les ")} + ${occ(" avec ")}"
        s"""WITH padded AS (
              SELECT doc_id, lang, concat(' ', lower(text), ' ') AS p FROM documents)
            SELECT doc_id, lang AS labeled,
              $en AS en, $es AS es, $de AS de, $fr AS fr,
              CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
                   WHEN $es >= $de AND $es >= $fr THEN 'es'
                   WHEN $de >= $fr THEN 'de'
                   ELSE 'fr' END AS pred
            FROM padded ORDER BY doc_id"""
      }),

    QEntry("q34_fingerprint",
      (s, d) => TextAnalysis.fingerprint(Tables.documents(s, d), "doc_id", "text")
        .orderBy(col("doc_id")),
      Some("""WITH sh AS (
                SELECT doc_id,
                       unnest(generate_series(1, greatest(length(text) - 7, 1))) AS i,
                       text
                FROM documents)
              SELECT doc_id, min(md5(substr(text, CAST(i AS INTEGER), 8))) AS fingerprint
              FROM sh GROUP BY doc_id ORDER BY doc_id""")),

    QEntry("q35_multimodal_meta",
      (s, d) => Tables.documents(s, d)
        .select(col("doc_id"),
          length(encode(col("text"), "UTF-8")).as("n_bytes"),
          sha2(encode(col("text"), "UTF-8"), 256).as("sha256_hex"),
          (lit(64) + length(encode(col("text"), "UTF-8")) % 577).as("width"),
          (lit(64) + (length(encode(col("text"), "UTF-8")) * 7) % 417).as("height"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               sha256(text) AS sha256_hex,
               64 + octet_length(encode(text)) % 577 AS width,
               64 + (octet_length(encode(text)) * 7) % 417 AS height
              FROM documents ORDER BY doc_id""")),

    // Brute-force cosine top-k, quantized-exact (SURVEY.md §7 ext.).
    QEntry("q36_embed_cosine_topk",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        Similarity.cosineTopK(queries, emb, 5)
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH qz AS (
                SELECT vec_id AS q_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings WHERE vec_id % 100 = 0),
              cz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS ce
                FROM embeddings),
              scored AS (
                SELECT q_id, vec_id,
                  CAST(list_sum(list_transform(range(len(qe)),
                       i -> qe[i+1] * ce[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(ce, x -> x*x)) AS BIGINT) AS nb
                FROM qz, cz),
              ranked AS (
                SELECT q_id, vec_id, dot,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM scored)
              SELECT q_id, vec_id, dot, rn FROM ranked
              WHERE rn <= 5 ORDER BY q_id, rn""")),

    // MinHash+LSH near-dup pairs with PORTABLE hashes, under the FULL
    // oracle and the DEFAULT collapsed contract (VERDICT r10 item 1):
    // exact md5 collapse to reps → md5-prefix shingle hashes + 16 affine
    // permutations (q51's convention) → 4 bands of 4 → per-bucket
    // in-group combinations (the minhashNearDupPairs candidate scheme:
    // no self-join, degenerate buckets capped) → exact-Jaccard verify at
    // 4/5 in pure int64 → near rep pairs + dup membership edges. DuckDB
    // recomputes collapse → signature → banding → candidates → verify
    // bit-for-bit, so the whole pipeline is hash-compared, not
    // rows-only. The fused xxhash64 production path
    // (Dedup.minhashNearDupPairs) keeps its DedupSpec recall coverage.
    QEntry("q37_minhash_pairs",
      (s, d) => minhashPairsMd5(s, d)
        .orderBy(col("kind"), col("a_id"), col("b_id")),
      Some {
        val P = 4294967311L
        val perms = Seq(
          (1L, 0L), (1299721L, 12345L), (15485863L, 54321L), (32452843L, 98765L),
          (49979687L, 11L), (67867967L, 222L), (86028121L, 3333L), (104395301L, 44444L),
          (122949823L, 5L), (141650939L, 66L), (160481183L, 777L), (179424673L, 8888L),
          (198491317L, 99L), (217645177L, 101L), (236887691L, 2027L), (256203161L, 30011L))
        val sigList = perms.map { case (a, b) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
        }.mkString("[", ",\n                  ", "]")
        s"""WITH grp AS (
              SELECT md5(text) AS h0, min(doc_id) AS keep_id,
                count(*) AS n_dups
              FROM documents GROUP BY 1),
            reps AS (
              SELECT d.doc_id, d.text, g.n_dups
              FROM documents d JOIN grp g ON g.keep_id = d.doc_id),
            members AS (
              SELECT g.keep_id AS rep_id, d.doc_id AS member_id
              FROM documents d JOIN grp g ON g.h0 = md5(d.text)
              WHERE d.doc_id <> g.keep_id),
            t AS (
              SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
              FROM reps),
            sh AS (
              SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 1),
                i -> array_to_string(toks[i:i+2], ' '))) AS shingles
              FROM t),
            h AS (
              SELECT doc_id, list_transform(shingles,
                s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM sh WHERE len(shingles) > 0),
            sig AS (
              SELECT doc_id, $sigList AS sig
              FROM h),
            bands AS (
              SELECT doc_id, band,
                array_to_string(list_transform(sig[band*4+1:band*4+4],
                  x -> CAST(x AS VARCHAR)), ',') AS bkey
              FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
            ok AS (
              SELECT band, bkey FROM bands
              GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
            cand AS (
              SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
              FROM bands a
              JOIN bands b ON b.band = a.band AND b.bkey = a.bkey
                          AND b.doc_id > a.doc_id
              JOIN ok ON ok.band = a.band AND ok.bkey = a.bkey),
            tok AS (
              SELECT doc_id,
                unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS tok
              FROM reps),
            sizes AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
            inter AS (
              SELECT c.a_id, c.b_id, count(*) AS inter
              FROM cand c
              JOIN tok a ON a.doc_id = c.a_id
              JOIN tok b ON b.doc_id = c.b_id AND b.tok = a.tok
              GROUP BY c.a_id, c.b_id),
            near AS (
              SELECT 'near' AS kind, i.a_id, i.b_id, i.inter,
                sa.ntok + sb.ntok - i.inter AS uni,
                CAST(ra.n_dups * rb.n_dups AS BIGINT) AS implied_pairs
              FROM inter i
              JOIN sizes sa ON sa.doc_id = i.a_id
              JOIN sizes sb ON sb.doc_id = i.b_id
              JOIN reps ra ON ra.doc_id = i.a_id
              JOIN reps rb ON rb.doc_id = i.b_id
              WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
            dup AS (
              SELECT 'dup' AS kind, m.rep_id AS a_id, m.member_id AS b_id,
                s.ntok AS inter, s.ntok AS uni,
                CAST(1 AS BIGINT) AS implied_pairs
              FROM members m
              JOIN h ON h.doc_id = m.rep_id
              JOIN sizes s ON s.doc_id = m.rep_id)
            SELECT * FROM near UNION ALL SELECT * FROM dup
            ORDER BY kind, a_id, b_id"""
      }),

    // SimHash signatures with the portable 32-bit md5 formulation —
    // hash-compared value-by-value (the fused 64-bit xxhash64 production
    // signature, Dedup.simhash64, stays spec-covered via DedupSpec).
    QEntry("q38_simhash",
      (s, d) => portableSimhash32(Tables.documents(s, d))
        .orderBy(col("doc_id")),
      Some(s"""WITH ${portableSimhashSql()}
               SELECT doc_id, simhash FROM sig ORDER BY doc_id""")),

    // Near-dup pairs → dedup GROUPS: connected components by min-label
    // propagation over the jaccard-adjacent edge graph (threshold 0.8 as
    // exact integer math, inter*5 >= uni*4). Full DuckDB oracle via a
    // recursive CTE computing min-reachable-id per node.
    QEntry("q55_dedup_components",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val adj = docs.select(col("doc_id").as("a_id"), (col("doc_id") + 1).as("b_id"))
        val edges = Dedup.verifyJaccard(adj, Dedup.tokenArrays(docs, "doc_id", "text"), 0.0)
          .filter(col("inter") * 5 >= col("uni") * 4)
          .select(col("a_id"), col("b_id"))
        Dedup.components(edges, docs.select(col("doc_id").as("id")))
          .orderBy(col("id"))
      },
      Some("""WITH RECURSIVE tok AS (
                SELECT doc_id,
                       unnest(list_distinct(string_split_regex(lower(text), '\s+'))) AS tok
                FROM documents),
              sizes AS (SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
              inter AS (
                SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
                FROM tok a JOIN tok b
                  ON a.tok = b.tok AND b.doc_id = a.doc_id + 1
                GROUP BY a.doc_id, b.doc_id),
              e AS (
                SELECT i.a_id, i.b_id
                FROM inter i
                JOIN sizes sa ON sa.doc_id = i.a_id
                JOIN sizes sb ON sb.doc_id = i.b_id
                WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
              edges AS (SELECT a_id AS src, b_id AS dst FROM e
                        UNION ALL SELECT b_id, a_id FROM e),
              comp(id, lbl) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT edges.dst, comp.lbl
                FROM comp JOIN edges ON edges.src = comp.id)
              SELECT id, min(lbl) AS component
              FROM comp GROUP BY id ORDER BY id""")),

    // SimHash banded hamming pair join on the portable signature (q38) —
    // the simhashPairs candidate scheme (band-bucket group-emit, no
    // self-join, capped buckets, bit_count verify BEFORE the distinct)
    // under the full oracle and the DEFAULT collapsed contract (VERDICT
    // r10 item 1): exact md5 collapse first (identical docs share every
    // band slice — the bucket fan-out squares in duplicate density),
    // then 4 bands of 8 bits over the 32-bit portable simhash of REPS;
    // by pigeonhole hamming<=3 pairs always share a band, and DuckDB
    // rebuilds collapse + banding + xor/bit_count verify exactly. The
    // 64-bit xxhash64 production operator (Dedup.simhashPairs) keeps
    // DedupSpec's planted-near-dup recall coverage.
    QEntry("q53_simhash_pairs",
      (s, d) => {
        val width = SimBits / 4
        val mask = (1L << width) - 1
        val bandCols = (0 until 4).map { b =>
          struct(lit(b).as("band"),
            shiftrightunsigned(col("simhash"), b * width).bitwiseAND(lit(mask))
              .as("bval"))
        }
        val (reps, dupEdges) = Dedup.collapseExactDocs(
          Tables.documents(s, d), "doc_id", "text")
        // Two-pass cap (Dedup.dropOversizedBuckets): oversized buckets
        // leave via count + anti-join BEFORE the collect_list, so no
        // aggregation buffer ever holds a degenerate membership — same
        // result set as the old size-filter, same oracle.
        // round 18 note (VERDICT r17 item 1 re-measured at 32c): q53 is
        // 2.46 s on the scan layout and 3.25 s with a defaultParallelism
        // repartition before this checkpoint — the r17 "regression" was
        // an 8-core-lane artifact (q51 1.13 s, q53 2.46 s at 32c match
        // their r16 walls), and the repartition is pure overhead here.
        val buckets = portableSimhash32(reps)
          .select(col("doc_id"), col("simhash"), explode(array(bandCols: _*)).as("bk"))
          .select(col("doc_id"), col("simhash"),
            col("bk.band").as("band"), col("bk.bval").as("bval"))
          .localCheckpoint()
        val grouped = graft.pipeline.Dedup
          .dropOversizedBuckets(buckets, Seq("band", "bval"), 1000)
          .groupBy(col("band"), col("bval"))
          .agg(sort_array(collect_list(struct(col("doc_id"), col("simhash")))).as("ids"))
          .filter(size(col("ids")) >= 2)
        val combos = flatten(transform(col("ids"), (a, i) =>
          transform(slice(col("ids"), i + 2, size(col("ids"))),
            b => struct(
              a.getField("doc_id").as("a_id"), b.getField("doc_id").as("b_id"),
              a.getField("simhash").as("ha"), b.getField("simhash").as("hb")))))
        val nd = reps.select(col("doc_id"), col("n_dups"))
        val near = grouped.select(explode(combos).as("p"))
          .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
            expr("bit_count(p.ha ^ p.hb)").cast("int").as("hamming"))
          .filter(col("hamming") <= 3)
          .distinct()
          .join(nd.select(col("doc_id").as("a_id"), col("n_dups").as("__na")), "a_id")
          .join(nd.select(col("doc_id").as("b_id"), col("n_dups").as("__nb")), "b_id")
          .select(lit("near").as("kind"), col("a_id"), col("b_id"),
            col("hamming"), (col("__na") * col("__nb")).as("implied_pairs"))
        val dup = dupEdges.select(lit("dup").as("kind"),
          col("rep_id").as("a_id"), col("member_id").as("b_id"),
          lit(0).as("hamming"), lit(1L).as("implied_pairs"))
        near.union(dup).orderBy(col("kind"), col("a_id"), col("b_id"))
      },
      Some(s"""WITH grp AS (
              SELECT md5(text) AS h0, min(doc_id) AS keep_id,
                count(*) AS n_dups
              FROM documents GROUP BY 1),
            reps AS (
              SELECT d.doc_id, d.text, g.n_dups
              FROM documents d JOIN grp g ON g.keep_id = d.doc_id),
            members AS (
              SELECT g.keep_id AS rep_id, d.doc_id AS member_id
              FROM documents d JOIN grp g ON g.h0 = md5(d.text)
              WHERE d.doc_id <> g.keep_id),
            ${portableSimhashSql("reps")},
            bands AS (
              SELECT doc_id, simhash, band, (simhash >> (band*8)) & 255 AS bval
              FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
            ok AS (
              SELECT band, bval FROM bands
              GROUP BY band, bval HAVING count(*) BETWEEN 2 AND 1000),
            near AS (
              SELECT DISTINCT 'near' AS kind, a.doc_id AS a_id,
                b.doc_id AS b_id,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming,
                CAST(ra.n_dups * rb.n_dups AS BIGINT) AS implied_pairs
              FROM bands a
              JOIN bands b ON b.band = a.band AND b.bval = a.bval
                          AND b.doc_id > a.doc_id
              JOIN ok ON ok.band = a.band AND ok.bval = a.bval
              JOIN reps ra ON ra.doc_id = a.doc_id
              JOIN reps rb ON rb.doc_id = b.doc_id
              WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
            dup AS (
              SELECT 'dup' AS kind, rep_id AS a_id, member_id AS b_id,
                CAST(0 AS INTEGER) AS hamming,
                CAST(1 AS BIGINT) AS implied_pairs
              FROM members)
            SELECT * FROM near UNION ALL SELECT * FROM dup
            ORDER BY kind, a_id, b_id""")),

    // Embedding-cosine near-dup on a defined candidate set (adjacent vec
    // ids) — quantized-exact, oracle-backed; the unbounded-candidate
    // scale path is the LSH-bucketed q39.
    QEntry("q43_embed_neardup_adjacent",
      (s, d) => {
        import graft.expressions.functions.{dot_long, quantize_vec}
        val emb = Tables.embeddings(s, d)
          .select(col("vec_id"), quantize_vec(col("embedding"), 10000.0).as("qe"))
        val a = emb.select(col("vec_id").as("a_id"), col("qe").as("qa"))
        val b = emb.select(col("vec_id").as("b_id"), col("qe").as("qb"))
        a.join(b, col("b_id") === col("a_id") + 1)
          .select(col("a_id"), col("b_id"),
            dot_long(col("qa"), col("qb")).as("dot"),
            round(dot_long(col("qa"), col("qb")) /
              (sqrt(dot_long(col("qa"), col("qa"))) * sqrt(dot_long(col("qb"), col("qb")))), 4)
              .as("cos4"))
          .filter(col("cos4") > -2) // keep all; cos4 exposes the score
          .orderBy(col("a_id"))
      },
      Some("""WITH q AS (
                SELECT vec_id,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings)
              SELECT a.vec_id AS a_id, b.vec_id AS b_id,
                CAST(list_sum(list_transform(range(len(a.qe)), i -> a.qe[i+1]*b.qe[i+1])) AS BIGINT) AS dot,
                round(CAST(list_sum(list_transform(range(len(a.qe)), i -> a.qe[i+1]*b.qe[i+1])) AS BIGINT) /
                  (sqrt(CAST(list_sum(list_transform(a.qe, x -> x*x)) AS BIGINT)) *
                   sqrt(CAST(list_sum(list_transform(b.qe, x -> x*x)) AS BIGINT))), 4) AS cos4
              FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
              ORDER BY a_id""")),

    // Sessionization. Batch runs the window formulation (lag → gap marker
    // → cumulative session id — spill-safe per-user sort, no in-memory
    // group materialization); the typed flatMapGroupsWithState operator
    // serves the streaming path and is spec-pinned equivalent
    // (EventsProfileSpec). Full DuckDB oracle: same sessions, same
    // open/closed flags (closed = not the user's last session).
    QEntry("q42_sessionize",
      (s, d) => graft.streaming.EventsProfile.sessionizeBatch(
        Tables.events(s, d), gapUs = 60L * 1000 * 1000)
        .orderBy(col("user_id"), col("durationUs"), col("nEvents"), col("closed")),
      Some("""WITH e AS (
                SELECT user_id, epoch_us(ts) AS us FROM events),
              marked AS (
                SELECT user_id, us,
                  CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                            > 60000000
                       THEN 1 ELSE 0 END AS new_s
                FROM e),
              sess AS (
                SELECT user_id, us,
                  sum(new_s) OVER (PARTITION BY user_id ORDER BY us
                    ROWS UNBOUNDED PRECEDING) AS sid
                FROM marked),
              grouped AS (
                SELECT user_id, sid, count(*) AS n, max(us) - min(us) AS dur
                FROM sess GROUP BY user_id, sid)
              SELECT user_id, n AS "nEvents", dur AS "durationUs",
                sid <> max(sid) OVER (PARTITION BY user_id) AS closed
              FROM grouped
              ORDER BY user_id, "durationUs", "nEvents", closed""")),

    // LSH-bucketed ANN. Approximate vs exact search (recall < 1 across
    // bucket borders), but deterministic: the float bucket is a strict
    // left-to-right ±v double sum (HashSig.lshBucket) that DuckDB's
    // sequential list_sum reproduces (float→double widening is exact),
    // and scores are integer dots ranked by IEEE-deterministic
    // sqrt/division — so the oracle replays bucketing → in-bucket
    // top-k and hash-pins the whole pipeline.
    QEntry("q39_ann_bucketed",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        Similarity.cosineTopKBucketed(queries, emb, dim = 64, k = 5, nBits = 4)
          .orderBy(col("q_id"), col("rn"))
      },
      Some {
        val bits = (0 until 4).map { b =>
          s"""(CASE WHEN list_sum(list_transform(range(64),
             |  i -> CASE WHEN (i*2654435761 + $b*40503)%97 < 48
             |       THEN CAST(embedding[i+1] AS DOUBLE)
             |       ELSE -CAST(embedding[i+1] AS DOUBLE) END)) >= 0
             |  THEN ${1 << b} ELSE 0 END)""".stripMargin
        }.mkString(" + ")
        s"""WITH bkt AS (
              SELECT vec_id, $bits AS bucket,
                list_transform(embedding,
                  v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
              FROM embeddings),
            cand AS (
              SELECT q.vec_id AS q_id, c.vec_id,
                CAST(list_sum(list_transform(range(len(q.qe)),
                     i -> q.qe[i+1]*c.qe[i+1])) AS BIGINT) AS dot,
                CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
              FROM bkt q JOIN bkt c ON c.bucket = q.bucket
              WHERE q.vec_id % 100 = 0),
            ranked AS (
              SELECT q_id, vec_id, dot,
                row_number() OVER (PARTITION BY q_id
                  ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
              FROM cand)
            SELECT q_id, vec_id, dot, rn FROM ranked WHERE rn <= 5
            ORDER BY q_id, rn"""
      }),

    // The shingling stage of the MinHash pipeline, oracle-pinned: 3-gram
    // word shingles per doc (the signature hash itself is xxhash64 —
    // Spark-specific, rows-only via q37 — but shingle generation must
    // agree cross-engine or every downstream hash diverges).
    QEntry("q50_shingles",
      (s, d) => {
        // Production path: the fused NgramShingles expression (one
        // codegen'd loop; empty array for short docs). The staged-HOF
        // formulation it replaced — materialize toks, then
        // transform(sequence, get/get/get), then array_distinct, each
        // in its own projection — survives as the differential-spec
        // reference (ExactJoinSpec), same pattern as lshBucket.
        Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .select(col("doc_id"), size(col("toks")).as("n_tokens"),
            size(graft.expressions.functions.ngram_shingles(
              col("toks"), 3, distinct = true)).as("n_shingles"))
          .orderBy(col("doc_id"))
      },
      Some("""SELECT doc_id,
               len(string_split_regex(lower(text), '\s+')) AS n_tokens,
               len(list_distinct(list_transform(
                 range(1, len(string_split_regex(lower(text), '\s+')) - 1),
                 i -> array_to_string(string_split_regex(lower(text), '\s+')[i:i+2], ' '))))
                 AS n_shingles
              FROM documents
              ORDER BY doc_id""")),

    // MinHash with a PORTABLE hash (md5-prefix → uint32, affine
    // permutations mod a >2^32 prime): slower than the fused xxhash64
    // expression the production path uses (q37), but both engines can
    // compute it — so the complete MinHash math (shingle → hash →
    // permute → min) is hash-compared value-by-value against DuckDB.
    QEntry("q51_minhash_md5", {
      val P = 4294967311L // smallest prime > 2^32
      val perms = Seq((1L, 0L), (1299721L, 12345L), (15485863L, 54321L), (32452843L, 98765L))
      (s, d) => {
        // Round 18 (guide §4): rewired to the fused md5_minhash_sigs
        // kernel (round 17, Md5SigSpec-pinned bit-identical to the
        // staged-HOF formulation this query carried): the shingle
        // multiset's per-permutation minima are invariant under
        // duplicates, and an empty shingle array (docs under 3 tokens)
        // yields a NULL sig array, so element_at(sigs, j) is null —
        // exactly array_min over the empty transform. Oracle re-verified
        // at sf0.001/sf0.01.
        val n = size(col("toks"))
        val shingles = when(n >= 3, transform(sequence(lit(0), n - 3),
            i => concat_ws(" ", get(col("toks"), i), get(col("toks"), i + 1),
              get(col("toks"), i + 2))))
          .otherwise(array().cast("array<string>"))
        val sigCols = perms.indices.map(j =>
          element_at(col("sigs"), j + 1).as(s"sig$j"))
        Tables.documents(s, d)
          .select(col("doc_id"), split(lower(col("text")), "\\s+").as("toks"))
          .select(col("doc_id"), shingles.as("shingles"))
          .select(col("doc_id"), graft.expressions.functions
            .md5_minhash_sigs(col("shingles"), perms, P).as("sigs"))
          .select((col("doc_id") +: sigCols): _*)
          .orderBy(col("doc_id"))
      }
    },
      Some {
        val P = 4294967311L
        val perms = Seq((1L, 0L), (1299721L, 12345L), (15485863L, 54321L), (32452843L, 98765L))
        val sigCols = perms.zipWithIndex.map { case ((a, b), j) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P)) AS sig$j"
        }.mkString(",\n                ")
        s"""WITH t AS (
              SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
              FROM documents),
            sh AS (
              SELECT doc_id, list_transform(range(1, len(toks) - 1),
                i -> array_to_string(toks[i:i+2], ' ')) AS shingles
              FROM t),
            h AS (
              SELECT doc_id, list_transform(shingles,
                s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM sh)
            SELECT doc_id,
                $sigCols
            FROM h ORDER BY doc_id"""
      }),

    // IVF ANN: coarse-quantizer cluster lists, nProbe-limited search.
    // Approximate vs EXACT search (recall < 1 across unprobed lists) —
    // but the algorithm is deterministic, and every quantity is either
    // an exact int64 dot or a double derived from exact ints by
    // IEEE-deterministic sqrt/division, so the oracle replays the whole
    // dataflow (centroids → assignment → probes → in-list top-k) and
    // hash-pins it. The orderings tie-break exactly like the Spark
    // side (max_by struct(cscore, -cid) == ORDER BY cscore DESC, cid).
    QEntry("q47_ann_ivf",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        graft.pipeline.Similarity.cosineTopKIvf(queries, emb, k = 5,
          nList = 16, nProbe = 4)
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              cseeds AS (
                SELECT vec_id AS cid_src, row_number() OVER (ORDER BY vec_id) AS rk
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
              cent AS (
                SELECT cs.cid_src AS cid, qz.qe AS cente,
                  CAST(list_sum(list_transform(qz.qe, x -> x*x)) AS BIGINT) AS nc
                FROM cseeds cs JOIN qz ON qz.vec_id = cs.cid_src),
              cfit AS (
                SELECT qz.vec_id, cent.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       i -> qz.qe[i+1]*cent.cente[i+1])) AS BIGINT)
                    / sqrt(cent.nc) AS cscore
                FROM qz CROSS JOIN cent),
              assigned AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS arn
                  FROM cfit) WHERE arn = 1),
              probes AS (
                SELECT vec_id AS q_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS prn
                  FROM cfit WHERE vec_id % 100 = 0) WHERE prn <= 4),
              scored AS (
                SELECT p.q_id, a.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       i -> q.qe[i+1]*c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM probes p
                JOIN assigned a ON a.cluster = p.cluster
                JOIN qz q ON q.vec_id = p.q_id
                JOIN qz c ON c.vec_id = a.vec_id),
              ranked AS (
                SELECT q_id, vec_id, dot,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM scored)
              SELECT q_id, vec_id, dot, rn FROM ranked WHERE rn <= 5
              ORDER BY q_id, rn""")),

    // IVF ANN over EXACT-TRAINED coarse centroids — the q47 search with
    // its quantizer first refined by one oracle-replayable Lloyd step
    // (full-vector k-means = PQ training with m=1; q106's integer
    // round-half-up mean convention). The oracle replays seed → train →
    // assign → probe → in-list top-k, so quantizer TRAINING and the
    // search built on it are pinned together.
    QEntry("q108_ann_ivf_trained",
      (s, d) => {
        val emb = Tables.embeddings(s, d)
        val queries = emb.filter(col("vec_id") % 100 === 0)
          .select(col("vec_id").as("q_id"), col("embedding"))
        val cent = graft.pipeline.Similarity
          .ivfCentroidsTrainedExact(emb, nList = 16, dim = 64, iters = 1)
        graft.pipeline.Similarity.cosineTopKIvf(queries, emb, k = 5,
          nList = 16, nProbe = 4, centroids = Some(cent))
          .orderBy(col("q_id"), col("rn"))
      },
      Some("""WITH qz AS (
                SELECT vec_id,
                       list_transform(embedding,
                         v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT)) AS qe
                FROM embeddings),
              seeds AS (
                SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
                FROM (SELECT vec_id FROM embeddings ORDER BY vec_id LIMIT 16)),
              cb0 AS (
                SELECT seeds.cid, qz.qe AS cv FROM seeds JOIN qz USING (vec_id)),
              tdots AS (
                SELECT qz.vec_id, cb0.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1] * cb0.cv[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(cb0.cv, x -> x*x)) AS BIGINT) AS ncv
                FROM qz CROSS JOIN cb0),
              tassign AS (
                SELECT vec_id, cid FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY 2*dot - ncv DESC, cid) AS arn
                  FROM tdots) WHERE arn = 1),
              tmeans AS (
                SELECT a.cid, CAST(t.i AS INTEGER) AS pos,
                  CAST(floor((2*sum(qz.qe[t.i+1]) + count(*))
                       / (2.0*count(*))) AS BIGINT) AS mv
                FROM tassign a
                JOIN qz ON qz.vec_id = a.vec_id
                CROSS JOIN range(64) t(i)
                GROUP BY a.cid, t.i),
              seedc AS (
                SELECT cid, CAST(t.i AS INTEGER) AS pos, cv[t.i+1] AS seedv
                FROM cb0 CROSS JOIN range(64) t(i)),
              cent AS (
                SELECT sc.cid,
                  list(COALESCE(m.mv, sc.seedv) ORDER BY sc.pos) AS cente
                FROM seedc sc
                LEFT JOIN tmeans m ON m.cid = sc.cid AND m.pos = sc.pos
                GROUP BY sc.cid),
              centn AS (
                SELECT cid, cente,
                  CAST(list_sum(list_transform(cente, x -> x*x)) AS BIGINT) AS nc
                FROM cent),
              cfit AS (
                SELECT qz.vec_id, centn.cid,
                  CAST(list_sum(list_transform(range(len(qz.qe)),
                       j -> qz.qe[j+1]*centn.cente[j+1])) AS BIGINT)
                    / sqrt(centn.nc) AS cscore
                FROM qz CROSS JOIN centn),
              assigned AS (
                SELECT vec_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS arn
                  FROM cfit) WHERE arn = 1),
              probes AS (
                SELECT vec_id AS q_id, cid AS cluster FROM (
                  SELECT vec_id, cid,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY cscore DESC, cid) AS prn
                  FROM cfit WHERE vec_id % 100 = 0) WHERE prn <= 4),
              scored AS (
                SELECT p.q_id, a.vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                       j -> q.qe[j+1]*c.qe[j+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM probes p
                JOIN assigned a ON a.cluster = p.cluster
                JOIN qz q ON q.vec_id = p.q_id
                JOIN qz c ON c.vec_id = a.vec_id),
              ranked AS (
                SELECT q_id, vec_id, dot,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM scored)
              SELECT q_id, vec_id, dot, rn FROM ranked WHERE rn <= 5
              ORDER BY q_id, rn""")),

    // Skew-safe two-phase (salted) aggregation — same answer as a direct
    // GROUP BY, pinned by the direct SQL oracle; the salt spreads any one
    // hot key over `buckets` reducers (see pipeline/Skew.scala).
    QEntry("q45_skew_twophase_agg",
      (s, d) => graft.pipeline.Skew.twoPhaseSumCount(
        Tables.lineitem(s, d),
        keys = Seq("l_suppkey"),
        sums = Seq("revenue_cents" ->
          round(col("l_extendedprice") * 100, 0).cast("long")),
        uniq = col("l_orderkey"),
        buckets = 16)
        .orderBy(col("l_suppkey")),
      Some("""SELECT l_suppkey,
               CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
               count(*) AS cnt
              FROM lineitem
              GROUP BY l_suppkey
              ORDER BY l_suppkey"""))
  )
}
