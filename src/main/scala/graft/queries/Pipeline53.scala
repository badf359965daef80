package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expressions.JaroWinkler

/** Round-13 pack, first batch — the record-linkage composition
  * (VERDICT r12 item 5): q322 blocks, q318 compares, q329 weighs,
  * q192 resolves — one end-to-end pipeline, one oracle replaying the
  * whole chain.
  */
object Pipeline53 {

  private val SdxMap = "01230120022455012623010202"

  /** Simplified Soundex of one WORD (the q322/q329 kernel). */
  private def sdxWord(w0: Column): Column = {
    val w = upper(w0)
    val codes = translate(w, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", SdxMap)
    val collapsed = regexp_replace(codes, "([0-9])\\1+", "$1")
    val tail =
      regexp_replace(collapsed.substr(lit(2), length(collapsed)), "0", "")
    rpad(substring(concat(w.substr(1, 1), tail), 1, 4), 4, "0")
  }

  /** Head-word Soundex — the q329 comparison FEATURE. */
  private def sdx(c: Column): Column = sdxWord(split(c, " ").getItem(0))

  /** Last-word Soundex — the second blocking pass. */
  private def sdxLast(c: Column): Column =
    sdxWord(element_at(split(c, " "), -1))

  /** The three comparison features of q329, on arbitrary name pairs:
    * jw_hi (JW ≥ 0.95 after the q318 round-to-4), sdx_eq (head-word
    * Soundex agrees), len_eq (byte lengths agree — deletions shift
    * length, so this is NON-match evidence for the planted typos). */
  private def features(a: Column, b: Column): Seq[(String, Column)] = Seq(
    "jw_hi" -> (round(JaroWinkler(a, b), 4) >= 0.95).cast("long"),
    "sdx_eq" -> (sdx(a) === sdx(b)).cast("long"),
    "len_eq" -> (length(a) === length(b)).cast("long"))

  /** Deterministic single-char deletion at position (key div 10) mod
    * len — the q192/q318/q329 planted-typo convention, on part names. */
  private def typo(key: Column, name: Column): Column = {
    val p = (expr("p_partkey div 10") % length(name)).cast("int")
    concat(name.substr(lit(1), p), name.substr(p + 2, length(name)))
  }

    // End-to-end probabilistic record linkage over part names:
    //  1. FILES — clean file A = part, dirty file B = every 100th part
    //     re-keyed (+10M) with a planted single-char deletion;
    //  2. TRAIN — Fellegi–Sunter m/u per feature in ppm from labeled
    //     pairs (every 10th part + its typo = matches, adjacent-key
    //     name pairs = non-matches; the q329 estimator verbatim) — a
    //     3-row broadcast dim;
    //  3. BLOCK — multi-pass Soundex blocking A×B on head-word OR
    //     last-word keys (the q322 kernel twice): one deletion breaks
    //     at most one word, so every planted typo stays reachable;
    //  4. SCORE — per candidate the exact integer likelihood ratio
    //     Π(agree ? m : 1e6−m) div Π(agree ? u : 1e6−u) (each factor
    //     ≤ 1e6, 3 factors < 2^63 — no logs, no libm, no cross-engine
    //     parity risk; zero denominator floors at 1);
    //  5. RESOLVE — ratio ≥ 100 (100:1 posterior odds): clean typo
    //     matches score ≈ 812 (jw agree × sdx agree × len disagree)
    //     and auto-link; typos whose deletion broke the HEAD word
    //     score ≈ 49 (sdx disagrees) — reachable thanks to the
    //     last-word blocking pass, but routed to q336's clerical
    //     band instead of auto-linking; block-mate non-matches land
    //     at 0. →
    //     pointer-doubling components over the matched records only
    //     (singletons are the uninteresting 99%); emit
    //     (record_id, canonical_id, cluster_size) per linked record.
    // The whole chain — Soundex, JW round, ppm estimation, ratio
    // arithmetic, recursive min-label components — replays in the
    // oracle; hash equality proves every stage.
  /** Stages 1–4 of the linkage chain (files → train → block →
    * score), shared by q332 (resolve) and q336 (decision bands).
    *
    * COLLAPSES byte-equal names to min-id reps BEFORE blocking (the
    * q321/q288 discipline): the Soundex key space is FIXED (~100
    * color-word blocks), so at 10× name duplication the record-grain
    * block join squared — measured 5.1 s → 41.5 s on the sf≈1 replica
    * (10 byte-identical copies of every clean name). At name grain the
    * clean side stays flat as the corpus replicates; group sizes ride
    * along, so both consumers reconstruct record-grain answers exactly
    * and the oracle stays at RAW id grain as the losslessness proof.
    *
    * Returns (scored, aMap, bMap):
    *  - scored: (a_rep, b_rep, a_n, b_n, ratio) — one row per blocked
    *    NAME pair, ratio = the exact integer likelihood ratio;
    *  - aMap/bMap: (record_id, rep) — record→name-rep membership for
    *    expansion. */
  private def linkage(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {

        val part = Tables.part(s, d)
          .select(col("p_partkey"), col("p_name"))
          .localCheckpoint() // A-side, B-side, train pairs, controls
        val dirty = part.filter(col("p_partkey") % 100 === 0)
          .select((col("p_partkey") + 10000000L).as("id"),
            typo(col("p_partkey"), col("p_name")).as("name"))
          .localCheckpoint() // feeds collapse + membership map
        // --- stage 2: m/u in ppm from labeled pairs (q329 estimator)
        val planted = part.filter(col("p_partkey") % 10 === 0)
          .select(col("p_name").as("a"),
            typo(col("p_partkey"), col("p_name")).as("b"),
            lit(1).as("is_match"))
        val ctrl = part.filter(col("p_partkey") % 10 === 0)
          .join(part.select((col("p_partkey") - 1).as("p_partkey"),
            col("p_name").as("b")), "p_partkey")
          .select(col("p_name").as("a"), col("b"), lit(0).as("is_match"))
        val labeled = planted.union(ctrl)
          .select(col("is_match") +: features(col("a"), col("b"))
            .map { case (n, c) => c.as(n) }: _*)
        val mu = labeled
          .select(col("is_match"), explode(array(
            features(lit(""), lit("")).map { case (n, _) =>
              struct(lit(n).as("feature"), col(n).as("agree"))
            }: _*)).as("f"))
          .select(col("is_match"), col("f.feature"), col("f.agree"))
          .groupBy(col("feature"))
          .agg(
            expr("sum(agree * is_match) * 1000000 div sum(is_match)")
              .as("m_ppm"),
            expr("sum(agree * (1 - is_match)) * 1000000 div " +
              "sum(1 - is_match)").as("u_ppm"))
          .localCheckpoint() // 3-row dim, broadcast into the score
        // --- stage 3a: name-grain collapse (min-id reps + group sizes)
        val aN = part.groupBy(col("p_name"))
          .agg(min(col("p_partkey")).as("a_rep"),
            count(lit(1)).as("a_n"))
          .select(col("p_name").as("an"), col("a_rep"), col("a_n"))
          .localCheckpoint() // blocked twice (H/L) + the record map
        val bN = dirty.groupBy(col("name"))
          .agg(min(col("id")).as("b_rep"), count(lit(1)).as("b_n"))
          .select(col("name").as("bn"), col("b_rep"), col("b_n"))
          .localCheckpoint()
        // --- stage 3b: multi-pass Soundex blocking at NAME grain —
        // head-word AND last-word keys (a name pair is a candidate if
        // EITHER key agrees — keys are pass-tagged H:/L: so head only
        // ever meets head). A single deletion breaks at most one of
        // the two words, so every planted typo stays reachable — the
        // single-pass head-word block lost the p=0 deletions (the q336
        // band census made that measurable).
        def blkKeys(c: Column) = explode(array(
          concat(lit("H:"), sdx(c)), concat(lit("L:"), sdxLast(c))))
        val aSide = aN.select(col("a_rep"), col("an"), col("a_n"),
          blkKeys(col("an")).as("blk"))
        val bSide = bN.select(col("b_rep"), col("bn"), col("b_n"),
          blkKeys(col("bn")).as("blk"))
        val cand = aSide.join(bSide, "blk")
          .select(col("a_rep"), col("an"), col("a_n"),
            col("b_rep"), col("bn"), col("b_n"))
          .distinct() // a pair can collide on both keys
        // --- stage 4: exact integer likelihood ratio per name pair
        val scored = cand
          .select(Seq(col("a_rep"), col("b_rep"), col("a_n"),
            col("b_n")) ++
            features(col("an"), col("bn")).map { case (n, c) =>
              c.as(n) }: _*)
          .join(broadcast(mu.groupBy().pivot("feature")
            .agg(first(col("m_ppm")).as("m"), first(col("u_ppm")).as("u"))))
          .select(col("a_rep"), col("b_rep"), col("a_n"), col("b_n"),
            expr("""(CASE WHEN jw_hi = 1 THEN jw_hi_m
                     ELSE 1000000 - jw_hi_m END *
                    CASE WHEN sdx_eq = 1 THEN sdx_eq_m
                     ELSE 1000000 - sdx_eq_m END *
                    CASE WHEN len_eq = 1 THEN len_eq_m
                     ELSE 1000000 - len_eq_m END) div
                   greatest(1L,
                    CASE WHEN jw_hi = 1 THEN jw_hi_u
                     ELSE 1000000 - jw_hi_u END *
                    CASE WHEN sdx_eq = 1 THEN sdx_eq_u
                     ELSE 1000000 - sdx_eq_u END *
                    CASE WHEN len_eq = 1 THEN len_eq_u
                     ELSE 1000000 - len_eq_u END)""").as("ratio"))
        val aMap = part.join(aN, part("p_name") === aN("an"))
          .select(col("p_partkey").as("record_id"),
            col("a_rep").as("rep"))
        val bMap = dirty.join(bN, dirty("name") === bN("bn"))
          .select(col("id").as("record_id"), col("b_rep").as("rep"))
        (scored, aMap, bMap)
  }

  /** Oracle CTE chain up to `scored`, shared by the q332 and q336
    * oracles (same stages, same arithmetic). */
  private def scoredSql: String = s"""part_t AS (SELECT p_partkey, p_name FROM part),
              names AS (
                SELECT p_name AS nm FROM part_t
                UNION
                SELECT substr(p_name, 1,
                    CAST((p_partkey // 10) % length(p_name) AS BIGINT)) ||
                  substr(p_name,
                    CAST((p_partkey // 10) % length(p_name) AS BIGINT) + 2)
                FROM part_t WHERE p_partkey % 10 = 0),
              sdx_in AS (
                SELECT DISTINCT upper(w) AS w FROM (
                  SELECT split_part(nm, ' ', 1) AS w FROM names
                  UNION
                  SELECT list_extract(string_split(nm, ' '),
                    len(string_split(nm, ' '))) FROM names)),
              sdx_t AS (
                SELECT w,
                  rpad(substr(substr(w, 1, 1) ||
                    replace(substr(cl, 2), '0', ''), 1, 4), 4, '0') AS sdx
                FROM (
                  SELECT w,
                    regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(
                          translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            '$SdxMap'),
                          '00+', '0', 'g'), '11+', '1', 'g'),
                        '22+', '2', 'g'), '33+', '3', 'g'),
                      '44+', '4', 'g'), '55+', '5', 'g'),
                    '66+', '6', 'g') AS cl
                  FROM sdx_in)),
              dirty AS (
                SELECT p_partkey + 10000000 AS id,
                  substr(p_name, 1,
                    CAST((p_partkey // 10) % length(p_name) AS BIGINT)) ||
                  substr(p_name,
                    CAST((p_partkey // 10) % length(p_name) AS BIGINT) + 2)
                    AS name
                FROM part_t WHERE p_partkey % 100 = 0),
              lab AS (
                SELECT p.p_name AS a,
                  substr(p.p_name, 1,
                    CAST((p.p_partkey // 10) % length(p.p_name) AS BIGINT)) ||
                  substr(p.p_name,
                    CAST((p.p_partkey // 10) % length(p.p_name) AS BIGINT) + 2)
                    AS b,
                  1 AS is_match
                FROM part_t p WHERE p.p_partkey % 10 = 0
                UNION ALL
                SELECT p.p_name, q.p_name, 0
                FROM part_t p JOIN part_t q
                  ON q.p_partkey = p.p_partkey + 1
                WHERE p.p_partkey % 10 = 0),
              labf AS (
                SELECT is_match,
                  CASE WHEN round(jaro_winkler_similarity(a, b), 4) >= 0.95
                    THEN 1 ELSE 0 END AS jw_hi,
                  CASE WHEN
                    (SELECT sdx FROM sdx_t
                      WHERE w = upper(split_part(a, ' ', 1))) =
                    (SELECT sdx FROM sdx_t
                      WHERE w = upper(split_part(b, ' ', 1)))
                    THEN 1 ELSE 0 END AS sdx_eq,
                  CASE WHEN length(a) = length(b) THEN 1 ELSE 0 END AS len_eq
                FROM lab),
              mu AS (
                SELECT f.feature,
                  sum(CASE f.feature WHEN 'jw_hi' THEN jw_hi
                      WHEN 'sdx_eq' THEN sdx_eq ELSE len_eq END * is_match)
                    * 1000000 // sum(is_match) AS m_ppm,
                  sum(CASE f.feature WHEN 'jw_hi' THEN jw_hi
                      WHEN 'sdx_eq' THEN sdx_eq ELSE len_eq END
                      * (1 - is_match))
                    * 1000000 // sum(1 - is_match) AS u_ppm
                FROM labf, (SELECT unnest(['jw_hi', 'sdx_eq', 'len_eq'])
                  AS feature) f
                GROUP BY f.feature),
              muw AS (
                SELECT
                  max(CASE WHEN feature = 'jw_hi' THEN m_ppm END) AS jw_m,
                  max(CASE WHEN feature = 'jw_hi' THEN u_ppm END) AS jw_u,
                  max(CASE WHEN feature = 'sdx_eq' THEN m_ppm END) AS sx_m,
                  max(CASE WHEN feature = 'sdx_eq' THEN u_ppm END) AS sx_u,
                  max(CASE WHEN feature = 'len_eq' THEN m_ppm END) AS ln_m,
                  max(CASE WHEN feature = 'len_eq' THEN u_ppm END) AS ln_u
                FROM mu),
              cand AS (
                SELECT a.p_partkey AS a_id, a.p_name AS an,
                  b.id AS b_id, b.name AS bn
                FROM part_t a
                JOIN sdx_t ha ON ha.w = upper(split_part(a.p_name, ' ', 1))
                JOIN sdx_t la ON la.w = upper(list_extract(
                  string_split(a.p_name, ' '),
                  len(string_split(a.p_name, ' '))))
                JOIN dirty b ON TRUE
                JOIN sdx_t hb ON hb.w = upper(split_part(b.name, ' ', 1))
                JOIN sdx_t lb ON lb.w = upper(list_extract(
                  string_split(b.name, ' '),
                  len(string_split(b.name, ' '))))
                WHERE ha.sdx = hb.sdx OR la.sdx = lb.sdx),
              candf AS (
                SELECT a_id, b_id,
                  CASE WHEN (SELECT sdx FROM sdx_t
                        WHERE w = upper(split_part(an, ' ', 1))) =
                       (SELECT sdx FROM sdx_t
                        WHERE w = upper(split_part(bn, ' ', 1)))
                    THEN 1 ELSE 0 END AS sdx_eq,
                  CASE WHEN round(jaro_winkler_similarity(an, bn), 4)
                    >= 0.95 THEN 1 ELSE 0 END AS jw_hi,
                  CASE WHEN length(an) = length(bn) THEN 1 ELSE 0 END
                    AS len_eq
                FROM cand),
              scored AS (
                SELECT a_id, b_id,
                  (CASE WHEN jw_hi = 1
                      THEN muw.jw_m ELSE 1000000 - muw.jw_m END *
                   CASE WHEN sdx_eq = 1
                      THEN muw.sx_m ELSE 1000000 - muw.sx_m END *
                   CASE WHEN len_eq = 1
                      THEN muw.ln_m ELSE 1000000 - muw.ln_m END) //
                  greatest(1,
                   CASE WHEN jw_hi = 1
                      THEN muw.jw_u ELSE 1000000 - muw.jw_u END *
                   CASE WHEN sdx_eq = 1
                      THEN muw.sx_u ELSE 1000000 - muw.sx_u END *
                   CASE WHEN len_eq = 1
                      THEN muw.ln_u ELSE 1000000 - muw.ln_u END) AS ratio
                FROM candf, muw)"""

  val entries: Seq[QEntry] = Seq(

    QEntry("q332_linkage_pipeline",
      (s, d) => {
        val (scored, aMap, bMap) = linkage(s, d)
        val edges = scored.filter(col("ratio") >= 100L)
          .select(col("a_rep").as("a_id"), col("b_rep").as("b_id"))
          .localCheckpoint() // feeds nodes + components
        // --- stage 5: components at NAME-REP grain, then EXPAND to
        // records: every record inherits its name-rep's component
        // (equal-name records have identical adjacency, so this is
        // the raw record-grain component structure exactly — the
        // oracle stays at raw id grain and hash-proves it). Canonical
        // = min rep label = min record id of the cluster, since each
        // rep IS its group's min id.
        val nodes = edges.select(col("a_id").as("id"))
          .union(edges.select(col("b_id"))).distinct()
        val comp = graft.pipeline.Dedup.components(edges, nodes)
        val members = aMap.union(bMap)
          .join(comp.select(col("id").as("rep"), col("component")), "rep")
          .localCheckpoint() // feeds sizes + output
        val sizes = members.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        members.join(sizes, "component")
          .select(col("record_id"),
            col("component").as("canonical_id"), col("cluster_size"))
          .orderBy(col("record_id"))
      },
      Some(s"""WITH RECURSIVE ${scoredSql},
              e AS (
                SELECT a_id, b_id FROM scored WHERE ratio >= 100),
              edges AS (SELECT a_id AS src, b_id AS dst FROM e
                        UNION ALL SELECT b_id, a_id FROM e),
              nodes AS (SELECT DISTINCT src AS id FROM edges),
              comp(id, lbl) AS (
                SELECT id, id AS lbl FROM nodes
                UNION
                SELECT edges.dst, comp.lbl
                FROM comp JOIN edges ON edges.src = comp.id),
              cm AS (SELECT id, min(lbl) AS canonical_id
                     FROM comp GROUP BY id),
              sz AS (SELECT canonical_id, count(*) AS cluster_size
                     FROM cm GROUP BY canonical_id)
              SELECT cm.id AS record_id, cm.canonical_id,
                CAST(sz.cluster_size AS BIGINT) AS cluster_size
              FROM cm JOIN sz USING (canonical_id)
              ORDER BY record_id""")),

    // Fellegi–Sunter three-way decision bands over the same scored
    // candidates (the decision-theory readout q332's hard threshold
    // hides): match (ratio ≥ 100 — the q332 link threshold), possible
    // (1 ≤ ratio < 100 — the clerical-review queue a production
    // linkage routes to humans), non_match (< 1). Per band: candidate
    // count, distinct dirty records, ratio range — the operating
    // curve a reviewer reads before moving the thresholds. One extra
    // aggregate over the shared stage-1–4 plan; nothing recomputed
    // differently.
    QEntry("q336_linkage_bands",
      (s, d) => {
        val (scored, _, _) = linkage(s, d)
        // record-grain accounting from the name-grain plan: pair
        // counts weight by a_n·b_n, distinct-dirty counts sum b_n
        // over distinct dirty reps per band — equal-name records
        // score identically, so these are the raw numbers exactly
        // (the oracle computes them at raw id grain).
        val bands = scored.select(
            when(col("ratio") >= 100L, "match")
              .when(col("ratio") >= 1L, "possible")
              .otherwise("non_match").as("decision"),
            col("ratio"), col("a_n"), col("b_n"), col("b_rep"))
          .localCheckpoint() // pair agg + distinct-dirty agg
        val pairAgg = bands.groupBy(col("decision"))
          .agg(sum(col("a_n") * col("b_n")).as("n_pairs"),
            min(col("ratio")).as("min_ratio"),
            max(col("ratio")).as("max_ratio"))
        val dirtyAgg = bands.select(col("decision"), col("b_rep"),
            col("b_n")).distinct()
          .groupBy(col("decision")).agg(sum(col("b_n")).as("n_dirty"))
        pairAgg.join(dirtyAgg, "decision")
          .select(col("decision"), col("n_pairs"), col("n_dirty"),
            col("min_ratio"), col("max_ratio"))
          .orderBy(col("decision"))
      },
      Some(s"""WITH ${scoredSql}
              SELECT CASE WHEN ratio >= 100 THEN 'match'
                          WHEN ratio >= 1 THEN 'possible'
                          ELSE 'non_match' END AS decision,
                CAST(count(*) AS BIGINT) AS n_pairs,
                CAST(count(DISTINCT b_id) AS BIGINT) AS n_dirty,
                CAST(min(ratio) AS BIGINT) AS min_ratio,
                CAST(max(ratio) AS BIGINT) AS max_ratio
              FROM scored GROUP BY decision
              ORDER BY decision"""))
  )
}
