package graft.queries

import org.apache.spark.sql.functions._

/** Round-14 pack, fourth batch — corpus-composition diligence: the
  * exact cross-source mirror census (the doc-grain exact twin of
  * q189's shingle Jaccard and q200's KMV containment).
  */
object Pipeline77 {

  /** Shared DuckDB replay of BOTH detectors over the doc CTE
    * `src(doc_id, text)` — MinHash (3-gram shingles, 16 perms, 4
    * bands, capped buckets, exact-Jaccard 4/5 verify) and banded
    * 32-bit SimHash (4x8-bit bands, capped, Hamming <= 3) — ending at
    * `audit(a_id, b_id, flagged_by)` + the evidence CTEs (`ainter`,
    * `sizes`, `ssig`, `tok`) left open for the caller's final select:
    * q387 reads them at pair grain, q394 (Pipeline80) aggregates them
    * to rep-grain disagreement cells after an exact collapse. */
  private[queries] def detectorAuditSql(src: String): String = {
    val P = 4294967311L
    val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
      s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
    }.mkString("[", ",\n                  ", "]")
    val ones = (0 until 32).map(j =>
      s"CAST(sum((h>>$j)&1) AS BIGINT) AS o$j").mkString(", ")
    val simSig = (0 until 32).map(j =>
      s"(CASE WHEN 2*o$j > n THEN CAST(${1L << j} AS BIGINT) ELSE 0 END)")
      .mkString(" + ")
    s"""t AS (
          SELECT doc_id,
            string_split_regex(lower(text), '\\s+') AS toks
          FROM $src),
        shl AS (
          SELECT doc_id,
            list_distinct(list_transform(range(1, len(toks) - 1),
              i -> array_to_string(toks[i:i+2], ' '))) AS shingles
          FROM t),
        hh AS (
          SELECT doc_id, list_transform(shingles,
            s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
          FROM shl WHERE len(shingles) > 0),
        msig AS (
          SELECT doc_id, $sigList AS sig FROM hh),
        mbands AS (
          SELECT doc_id, band,
            array_to_string(list_transform(sig[band*4+1:band*4+4],
              x -> CAST(x AS VARCHAR)), ',') AS bkey
          FROM msig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
        mok AS (
          SELECT band, bkey FROM mbands
          GROUP BY band, bkey HAVING count(*) BETWEEN 2 AND 1000),
        mcand AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM mbands a
          JOIN mbands b ON b.band = a.band AND b.bkey = a.bkey
            AND b.doc_id > a.doc_id
          JOIN mok ON mok.band = a.band AND mok.bkey = a.bkey),
        tok AS (
          SELECT doc_id, unnest(list_distinct(
            string_split_regex(lower(text), '\\s+'))) AS tok
          FROM $src),
        sizes AS (
          SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
        minter AS (
          SELECT c.a_id, c.b_id, count(*) AS inter
          FROM mcand c
          JOIN tok a ON a.doc_id = c.a_id
          JOIN tok b ON b.doc_id = c.b_id AND b.tok = a.tok
          GROUP BY c.a_id, c.b_id),
        mh AS (
          SELECT i.a_id, i.b_id
          FROM minter i
          JOIN sizes sa ON sa.doc_id = i.a_id
          JOIN sizes sb ON sb.doc_id = i.b_id
          WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
        stk AS (
          SELECT doc_id, unnest(
            string_split_regex(lower(text), '\\s+')) AS tok
          FROM $src),
        sth AS (
          SELECT doc_id,
            ('0x' || substr(md5(tok), 1, 8))::BIGINT AS h
          FROM stk),
        sag AS (
          SELECT doc_id, count(*) AS n, $ones FROM sth
          GROUP BY doc_id),
        ssig AS (
          SELECT doc_id, CAST($simSig AS BIGINT) AS simhash
          FROM sag),
        sbands AS (
          SELECT doc_id, simhash, band,
            (simhash >> (band*8)) & 255 AS bval
          FROM ssig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band)),
        sok AS (
          SELECT band, bval FROM sbands
          GROUP BY band, bval HAVING count(*) BETWEEN 2 AND 1000),
        sh AS (
          SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sbands a
          JOIN sbands b ON b.band = a.band AND b.bval = a.bval
            AND b.doc_id > a.doc_id
          JOIN sok ON sok.band = a.band AND sok.bval = a.bval
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 3),
        audit AS (
          SELECT coalesce(mh.a_id, sh.a_id) AS a_id,
            coalesce(mh.b_id, sh.b_id) AS b_id,
            CASE WHEN mh.a_id IS NOT NULL AND sh.a_id IS NOT NULL
                 THEN 'both'
                 WHEN mh.a_id IS NOT NULL THEN 'minhash_only'
                 ELSE 'simhash_only' END AS flagged_by
          FROM mh FULL JOIN sh
            ON sh.a_id = mh.a_id AND sh.b_id = mh.b_id),
        ainter AS (
          SELECT au.a_id, au.b_id, count(*) AS inter
          FROM audit au
          JOIN tok a ON a.doc_id = au.a_id
          JOIN tok b ON b.doc_id = au.b_id AND b.tok = a.tok
          GROUP BY au.a_id, au.b_id)"""
  }

  /** Doc-grain detector-disagreement audit over an explicit
    * (doc_id, text) corpus — q387's body, callable by the scale
    * harness (tools.DisagreeScale) on synthetic dup-dense corpora.
    * Output: one row per disagreeing-or-agreeing candidate pair with
    * exact-Jaccard + Hamming evidence; grows with true duplicate
    * mass (the eval arm — q394's cell census is the production arm). */
  private[graft] def auditPairsDocGrain(corpusIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    // round 18 note: a defaultParallelism key-hash repartition before
    // this checkpoint was MEASURED NET-NEGATIVE here (q387 4.5 -> 8.3 s
    // at 32c): unlike q192/q383 no downstream stage is serial — they
    // already run 3-6 tasks of ~100-300 ms — so 32-way layout only
    // multiplied per-task overhead across ~24 tiny stages. Left at the
    // scan layout deliberately (OPTIMIZATION_r18.md "measured and
    // reverted").
    val corpus = corpusIn.localCheckpoint() // both detectors + evidence joins
    val toks = graft.pipeline.Dedup
      .tokenArrays(corpus, "doc_id", "text")
      .localCheckpoint() // minhash verify + audit enrichment
    val mh = graft.pipeline.Dedup.verifyJaccard(
        Pipeline.minhashCandidatesOver(corpus), toks, 0.0)
      .filter(col("inter") * 5 >= col("uni") * 4)
      .select(col("a_id"), col("b_id"), lit(1L).as("m"))
    val sig = Pipeline.portableSimhash32(corpus)
      .localCheckpoint() // bands + per-pair hamming evidence
    val width = Pipeline.SimBits / 4
    val mask = (1L << width) - 1
    val bandCols = (0 until 4).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * width)
          .bitwiseAND(lit(mask)).as("bval"))
    }
    val buckets = sig
      .select(col("doc_id"), col("simhash"),
        explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"),
        col("bk.band").as("band"), col("bk.bval").as("bval"))
      .localCheckpoint()
    val grouped = graft.pipeline.Dedup
      .dropOversizedBuckets(buckets, Seq("band", "bval"), 1000)
      .groupBy(col("band"), col("bval"))
      .agg(sort_array(collect_list(struct(col("doc_id"),
        col("simhash")))).as("ids"))
      .filter(size(col("ids")) >= 2)
    val combos = flatten(transform(col("ids"), (a, i) =>
      transform(slice(col("ids"), i + 2, size(col("ids"))),
        b => struct(a.getField("doc_id").as("a_id"),
          b.getField("doc_id").as("b_id"),
          a.getField("simhash").as("ha"),
          b.getField("simhash").as("hb")))))
    val sh = grouped.select(explode(combos).as("p"))
      .select(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
        expr("bit_count(p.ha ^ p.hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= 3L)
      .select(col("a_id"), col("b_id")).distinct()
      .withColumn("sm", lit(1L))
    val audit = mh.join(sh, Seq("a_id", "b_id"), "full_outer")
      .select(col("a_id"), col("b_id"),
        when(col("m").isNotNull && col("sm").isNotNull, "both")
          .when(col("m").isNotNull, "minhash_only")
          .otherwise(lit("simhash_only")).as("flagged_by"))
    graft.pipeline.Dedup.verifyJaccard(audit, toks, 0.0)
      .join(audit, Seq("a_id", "b_id"))
      .join(sig.select(col("doc_id").as("a_id"),
        col("simhash").as("ha")), "a_id")
      .join(sig.select(col("doc_id").as("b_id"),
        col("simhash").as("hb")), "b_id")
      .select(col("a_id"), col("b_id"), col("flagged_by"),
        expr("inter * 10000 div uni").as("jaccard_bp"),
        expr("CAST(bit_count(ha ^ hb) AS BIGINT)").as("hamming"))
      .orderBy(col("a_id"), col("b_id"))
  }

  val entries: Seq[QEntry] = Seq(

    // Cross-source mirror census: which source PAIRS ship byte-
    // identical documents, and how much of each side is mirrored —
    // the exact-dup complement of q189 (shingle overlap) and q200
    // (KMV containment): a full mirror scores 10000 bp here while its
    // shingle Jaccard can stay tiny. Corpus: an md5-drawn ~1/5 of each
    // source re-published under `mirror_<source>` and the ~1/25 nested
    // inside that draw additionally syndicated into one `agg` feed
    // (the planted crawl topology — h%25=0 ⊂ h%5=0, so agg docs mirror
    // twice and the (src, mirror_src, agg) triangle shows up in the
    // census; a hash draw, not id arithmetic, because the fixture's
    // round-robin id↔source layout would silently restrict an id-mod
    // plant to 4 of the 20 sources). One digest
    // projection → distinct (source, h) → h-keyed pair join (each
    // digest lives in ≤ 3 sources, so the join fan-out is bounded by
    // the mirror topology, never corpus²) → pair counts + directional
    // shares against each side's distinct-text census.
    QEntry("q386_mirror_census",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("source"), col("doc_id"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val corpus = base
          .union(base.filter(draw % 5 === 0)
            .select(concat(lit("mirror_"), col("source")).as("source"),
              (col("doc_id") + 10000000L).as("doc_id"), col("text")))
          .union(base.filter(draw % 25 === 0)
            .select(lit("agg").as("source"),
              (col("doc_id") + 20000000L).as("doc_id"), col("text")))
        val st = corpus.select(col("source"), md5(col("text")).as("h"))
          .distinct()
          .localCheckpoint() // digest dim: sizes + both pair-join sides
        val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("n"))
        st.select(col("source").as("sa"), col("h"))
          .join(st.select(col("source").as("sb"), col("h")), "h")
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa"), col("sb"))
          .agg(count(lit(1)).as("n_shared"))
          .join(broadcast(sizes.select(col("source").as("sa"),
            col("n").as("na"))), "sa")
          .join(broadcast(sizes.select(col("source").as("sb"),
            col("n").as("nb"))), "sb")
          .select(col("sa"), col("sb"), col("n_shared"), col("na"),
            col("nb"),
            expr("n_shared * 10000 div na").as("share_a_bp"),
            expr("n_shared * 10000 div nb").as("share_b_bp"))
          .orderBy(col("sa"), col("sb"))
      },
      Some("""WITH base AS (
                SELECT source, doc_id, text FROM documents),
              corpus AS (
                SELECT source, text FROM base
                UNION ALL
                SELECT 'mirror_' || source, text FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 5 = 0
                UNION ALL
                SELECT 'agg', text FROM base
                WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
                  1, 4))::BIGINT % 25 = 0),
              st AS (
                SELECT DISTINCT source, md5(text) AS h FROM corpus),
              sizes AS (
                SELECT source, count(*) AS n FROM st GROUP BY source),
              pairs AS (
                SELECT a.source AS sa, b.source AS sb,
                  count(*) AS n_shared
                FROM st a JOIN st b ON b.h = a.h AND a.source < b.source
                GROUP BY 1, 2)
              SELECT p.sa, p.sb, p.n_shared,
                za.n AS na, zb.n AS nb,
                p.n_shared * 10000 // za.n AS share_a_bp,
                p.n_shared * 10000 // zb.n AS share_b_bp
              FROM pairs p
              JOIN sizes za ON za.source = p.sa
              JOIN sizes zb ON zb.source = p.sb
              ORDER BY p.sa, p.sb""")),

    // Detector disagreement audit — the pair-grain EVAL arm (the
    // production default is q394's collapse-first cell census,
    // Pipeline80; this arm's output grows with true duplicate mass —
    // run it on samples or eval slices): MinHash+LSH (q37's md5 chain,
    // exact-Jaccard verify at 4/5) and banded SimHash (q53's 32-bit
    // portable chain, Hamming ≤ 3) run over the SAME corpus, their
    // pair sets full-outer-joined into a calibration census — the
    // "which near-dup detector do I trust where" question every dedup
    // rollout asks, answered at pair grain with both detectors'
    // native evidence (exact Jaccard bp + signature Hamming) on every
    // row. Corpus: every 10th doc gets a MILD planted edit (~1/12 of
    // tokens swapped → token Jaccard ≈ 0.85, above the MinHash
    // threshold; SimHash flips 0–8 boundary bits, splitting the pairs
    // between `both` and `minhash_only`) and every 15th a STRONG edit
    // (~1/5 swapped → Jaccard ≈ 0.67, below threshold; the multiset
    // signature sometimes still lands within Hamming 3 →
    // `simhash_only`). Corpus is exact-dup-free by construction
    // (every edit changes the text), so the detectors run at doc
    // grain — the collapse stage both operators carry is an identity
    // here, and the audit inherits their capped-bucket band joins.
    QEntry("q387_detector_disagreement",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        def edit(m: Int, phaseMod: Int) = expr(
          s"""array_join(transform(split(lower(text), '\\\\s+'),
              (w, i) -> CASE WHEN i % $m = doc_id % $phaseMod
                THEN concat('zz', CAST(i AS STRING)) ELSE w END), ' ')""")
        auditPairsDocGrain(base
          .union(base.filter(col("doc_id") % 10 === 0)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              edit(12, 5).as("text")))
          .union(base.filter(col("doc_id") % 15 === 0)
            .select((col("doc_id") + 20000000L).as("doc_id"),
              edit(5, 3).as("text"))))
      },
      Some(
        s"""WITH base AS (SELECT doc_id, text FROM documents),
            corpus AS (
              SELECT doc_id, text FROM base
              UNION ALL
              SELECT doc_id + 10000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 12 = doc_id % 5
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 10 = 0
              UNION ALL
              SELECT doc_id + 20000000,
                array_to_string(list_transform(
                  string_split_regex(lower(text), '\\s+'),
                  (w, i) -> CASE WHEN (i - 1) % 5 = doc_id % 3
                    THEN 'zz' || CAST(i - 1 AS VARCHAR) ELSE w END), ' ')
              FROM base WHERE doc_id % 15 = 0),
            ${detectorAuditSql("corpus")}
            SELECT au.a_id, au.b_id, au.flagged_by,
              i.inter * 10000 // (sa.ntok + sb.ntok - i.inter)
                AS jaccard_bp,
              CAST(bit_count(xor(ga.simhash, gb.simhash)) AS BIGINT)
                AS hamming
            FROM audit au
            JOIN ainter i ON i.a_id = au.a_id AND i.b_id = au.b_id
            JOIN sizes sa ON sa.doc_id = au.a_id
            JOIN sizes sb ON sb.doc_id = au.b_id
            JOIN ssig ga ON ga.doc_id = au.a_id
            JOIN ssig gb ON gb.doc_id = au.b_id
            ORDER BY au.a_id, au.b_id"""
      )),

    // Leave-one-out source influence: for each source, the corpus
    // token-length profile (mean, σ in milli-tokens — q380's exact
    // integer-moment discipline: one corpus scan to per-source
    // (n, Σx, Σx²), LOO values in closed form from the complement
    // sums, one rounded sqrt per row) WITHOUT that source, and the
    // delta against the full-corpus profile — the influence-function
    // answer to "which source is dragging the corpus length profile",
    // read per source at dimension grain with zero re-scans.
    QEntry("q388_source_influence",
      (s, d) => {
        val m = Tables.documents(s, d)
          .select(col("source"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("x"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
            sum(col("x").cast("decimal(38,0)") * col("x")).as("s2"))
          .localCheckpoint() // source dim: totals + LOO rows
        val tot = m.agg(sum(col("n")).as("tn"),
          sum(col("s1")).as("ts1"), sum(col("s2")).as("ts2"))
        m.crossJoin(broadcast(tot))
          .select(col("source"), col("n").as("n_docs"),
            expr("(ts1 - s1) * 1000 div (tn - n)").as("mean_milli_loo"),
            expr("""CAST(round(sqrt(CAST((CAST(tn - n AS DECIMAL(38,0))
              * (ts2 - s2) - CAST(ts1 - s1 AS DECIMAL(38,0)) *
              (ts1 - s1)) AS DOUBLE)) * 1000.0 / (tn - n)) AS BIGINT)""")
              .as("sigma_milli_loo"),
            expr("ts1 * 1000 div tn").as("mean_milli_full"),
            expr("""CAST(round(sqrt(CAST((CAST(tn AS DECIMAL(38,0))
              * ts2 - CAST(ts1 AS DECIMAL(38,0)) * ts1) AS DOUBLE))
              * 1000.0 / tn) AS BIGINT)""").as("sigma_milli_full"))
          .withColumn("delta_mean_milli",
            col("mean_milli_loo") - col("mean_milli_full"))
          .withColumn("delta_sigma_milli",
            col("sigma_milli_loo") - col("sigma_milli_full"))
          .orderBy(col("source"))
      },
      Some("""WITH x AS (
                SELECT source,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS x
                FROM documents),
              m AS (
                SELECT source, count(*) AS n, sum(x) AS s1,
                  sum(CAST(x AS HUGEINT) * x) AS s2
                FROM x GROUP BY source),
              tot AS (
                SELECT sum(n) AS tn, sum(s1) AS ts1, sum(s2) AS ts2
                FROM m)
              SELECT source, CAST(n AS BIGINT) AS n_docs,
                CAST((ts1 - s1) * 1000 // (tn - n) AS BIGINT)
                  AS mean_milli_loo,
                CAST(round(sqrt(CAST((tn - n) * (ts2 - s2)
                  - (ts1 - s1) * (ts1 - s1) AS DOUBLE)) * 1000.0
                  / (tn - n)) AS BIGINT) AS sigma_milli_loo,
                CAST(ts1 * 1000 // tn AS BIGINT) AS mean_milli_full,
                CAST(round(sqrt(CAST(tn * ts2 - ts1 * ts1 AS DOUBLE))
                  * 1000.0 / tn) AS BIGINT) AS sigma_milli_full,
                CAST((ts1 - s1) * 1000 // (tn - n) - ts1 * 1000 // tn
                  AS BIGINT) AS delta_mean_milli,
                CAST(round(sqrt(CAST((tn - n) * (ts2 - s2)
                  - (ts1 - s1) * (ts1 - s1) AS DOUBLE)) * 1000.0
                  / (tn - n))
                  - round(sqrt(CAST(tn * ts2 - ts1 * ts1 AS DOUBLE))
                  * 1000.0 / tn) AS BIGINT) AS delta_sigma_milli
              FROM m, tot
              ORDER BY source"""))
  )
}
