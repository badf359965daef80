package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Round-17 pack — the composed PREFERENCE-DATA (DPO/RLHF) release gate
  * (VERDICT r16 item 5): q449 gates SFT conversations; the preference-
  * pair artifact has its own failure modes, audited piecewise in rounds
  * 15–16 (q411 pair integrity, q437 label noise, q419 judge position
  * bias, q440 pool dedup, q448 diversity) and chained HERE at PAIR grain
  * with cross-stage rescoping and one keep/drop/reason manifest row per
  * pair — the q449 pattern, second instantiation. What is NEW versus
  * q449: two of the stages judge at a DIFFERENT grain than they drop —
  * the length-bias census convicts a whole SOURCE (feed) and the
  * binomial position-bias test convicts a whole JUDGE — and the
  * conviction set itself depends on the survivors of earlier stages,
  * which is exactly the rescoping the one-shot oracle must replay.
  */
object Pipeline96 {

  /** Long, stopword-free junk response (every word off the q437 scorer's
    * stopword list, so score(bad)=0) — strictly the LONGEST response
    * variant, so a feed that always picks it is length-biased by
    * construction while honest feeds read ~0 longer-chosen mass. */
  private val Bad = " placeholder filler response that never ends just" +
    " more padding words stretched well past any useful length without" +
    " meaning packed duplicated padding padding padding padding padding" +
    " padding padding padding padding padding padding padding padding" +
    " padding"

  /** Template filler for the mode-collapse plant (the q449 Filler
    * convention): stopword-rich so scripted responses outrank organic
    * ones in the margin-ranked pool cap, wordy enough that siblings
    * share almost every trigram. */
  private val Filler = " the answer to the question is always the same" +
    " and it is written here in the standard scripted form of the pool" +
    " template with no meaningful variation at all"

  val entries: Seq[QEntry] = Seq(

    // The preference release gate. Stages and drop reasons, in order:
    //  1. DEGENERATE (q411): chosen == rejected teaches nothing —
    //     plant draw % 17 = 4 copies chosen into rejected ->
    //     'degenerate_pair'.
    //  2. LENGTH-BIASED FEED (q411, SOURCE grain over stage-1
    //     survivors): a source whose chosen is the longer response in
    //     >= 9000 bp of its surviving pairs teaches verbosity, not
    //     quality — ALL its pairs drop as 'length_biased_feed'. Plant:
    //     sources with md5 % 5 = 1 always choose the long junk
    //     response; honest feeds accrue only the scripted-template
    //     mass (~300 bp).
    //  3. INVERTED LABEL (q437): margin = stopword-score(chosen) −
    //     score(rejected) < 0 -> 'inverted_label'. Plant: noisy-labeler
    //     sources (md5 % 12 = 9) swap chosen/rejected on an ~1/5 draw.
    //  4. BIASED JUDGE (q419, JUDGE grain over stage-3 survivors):
    //     each pair carries its judge's first-position verdict; the
    //     exact binomial flag (2·wins_a − n)² > 9·n (|z| > 3, integer-
    //     exact) over SURVIVING pairs convicts the judge and drops all
    //     its pairs as 'biased_judge'. Plant: judges with
    //     md5(judge) % 4 = 0 (rater2/rater3 of 8) prefer position A on
    //     ~19/20 draws; honest judges flip a fair md5 coin.
    //  5. POOL DEDUP (q440, cap 3): pairs collapse per (prompt,
    //     chosen-hash) to the min-id rep ('dup_dropped'); pools rank
    //     reps by (margin desc, hash) and rank > 3 drops as
    //     'overflow_dropped'.
    //  6. DIVERSITY (q448): surviving pools with >= 3 members whose
    //     chosen-trigram |union| / sum|types| < 5000 bp are one
    //     response in k costumes — every member but the min-id drops
    //     as 'mode_collapsed'. Plant: dedicated template pools
    //     (draw % 16 = 12 -> tpl_p0..2) emit scripted variants that
    //     differ in one token.
    // Pair synthesis: prompt pools follow q440's topology (draw % 4 =
    // 0 -> one of 50 shared prompts; draw % 8 = 0 -> byte-identical
    // canned chosen) plus the dedicated template pools; the good
    // response is content-derived ("ans <id> " + first 12 tokens), the
    // bad response is the long stopword-free junk, so margins and
    // lengths are real functions of the data on both engines.
    //
    // Scale shape: one corpus scan feeds the spine; stage frames are
    // slim lazily-persisted projections; the TWO aggregate-then-rejoin
    // stages (source census, judge census) broadcast their conviction
    // sets (a few feed/judge keys — dims by construction); the only
    // window partitions by prompt; the trigram explode runs on stage-5
    // survivors only. 100 TB: shuffles are prompt/digest keyed;
    // nothing driver-sided.
    QEntry("q453_preference_release_gate",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val draw = conv(substring(md5(col("doc_id").cast("string")),
          1, 4), 16, 10).cast("long")
        val sdraw = conv(substring(md5(col("source")), 1, 2), 16, 10)
          .cast("long")
        val judge = concat(lit("rater"), col("doc_id") % 8)
        val jbias = conv(substring(md5(judge), 1, 2), 16, 10)
          .cast("long") % 4 === 0
        val prompt = when(draw % 16 === 12,
          concat(lit("tpl_p"), draw % 3))
          .when(draw % 4 === 0, concat(lit("shared_p"), draw % 50))
          .otherwise(concat(lit("p"), col("doc_id")))
        val good = concat(lit("ans "), col("doc_id"), lit(" "),
          array_join(slice(split(lower(col("text")), "\\s+"), 1, 12), " "))
        val bad = concat(lit("ans "), col("doc_id"), lit(Bad))
        val chosen0 = when(draw % 16 === 12,
          concat(lit("standard scripted reply for "), prompt,
            lit(" variant "), draw % 9, lit(Filler)))
          .when(draw % 8 === 0, concat(lit("canned answer for "), prompt))
          .otherwise(good)
        val swap = sdraw % 5 === 1 ||
          (sdraw % 12 === 9 && draw % 5 === 0)
        val chosen = when(swap, bad).otherwise(chosen0)
        val rejected = when(draw % 17 === 4, chosen)
          .otherwise(when(swap, chosen0).otherwise(bad))
        val winsA = when(jbias, (draw % 20 =!= 7).cast("long"))
          .otherwise((draw % 2 === 0).cast("long"))
        val corpus = docs.select(col("doc_id").as("pair_id"),
            col("source"), judge.as("judge"), prompt.as("prompt"),
            chosen.as("chosen"), rejected.as("rejected"),
            winsA.as("wins_a"))
          .persist(StorageLevel.MEMORY_AND_DISK) // spine: stage 1 + manifest
        // stage 1: degenerate pairs
        val d1 = corpus.filter(col("chosen") === col("rejected"))
          .select(col("pair_id"), lit("degenerate_pair").as("stage"))
        val g1 = corpus.filter(col("chosen") =!= col("rejected"))
          .withColumn("longer",
            (length(col("chosen")) > length(col("rejected"))).cast("long"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        // stage 2: source-grain length-bias census over survivors,
        // conviction set broadcast back (sources are a dim)
        val lb = g1.groupBy(col("source"))
          .agg(count(lit(1)).as("n"), sum(col("longer")).as("lg"))
          .filter(expr("lg * 10000 div n >= 9000"))
          .select(col("source"), lit(true).as("lbf"))
        val g2 = g1.join(broadcast(lb), Seq("source"), "left")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val d2 = g2.filter(col("lbf"))
          .select(col("pair_id"), lit("length_biased_feed").as("stage"))
        // stage 3: label margin on feed survivors (q437 scorer)
        def score(c: String) = expr(
          s"CAST(size(filter(split(lower($c), '\\\\s+'), " +
            "w -> w IN ('the','a','of','and','to','in','is','on'," +
            "'for','with'))) AS BIGINT)")
        val g3 = g2.filter(col("lbf").isNull)
          .withColumn("margin", score("chosen") - score("rejected"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val d3 = g3.filter(col("margin") < 0L)
          .select(col("pair_id"), lit("inverted_label").as("stage"))
        // stage 4: judge-grain binomial position-bias test over label
        // survivors, conviction set broadcast back (judges are a dim)
        val s3 = g3.filter(col("margin") >= 0L)
        val bj = s3.groupBy(col("judge"))
          .agg(count(lit(1)).as("n"), sum(col("wins_a")).as("wa"))
          .filter(expr("(2 * wa - n) * (2 * wa - n) > 9 * n"))
          .select(col("judge"), lit(true).as("bjf"))
        val g4 = s3.join(broadcast(bj), Seq("judge"), "left")
          .persist(StorageLevel.MEMORY_AND_DISK)
        val d4 = g4.filter(col("bjf"))
          .select(col("pair_id"), lit("biased_judge").as("stage"))
        // stage 5: pool dedup + rank cap on judge survivors (q440)
        val rows = g4.filter(col("bjf").isNull)
          .withColumn("ph", md5(col("chosen")))
        val reps = rows.groupBy(col("prompt"), col("ph"))
          .agg(min(col("pair_id")).as("rep_id"),
            max(col("margin")).as("score"))
          .withColumn("rnk", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("prompt"))
              .orderBy(col("score").desc, col("ph"))))
        val g5 = rows
          .join(reps.select(col("prompt"), col("ph"), col("rep_id"),
            col("rnk")), Seq("prompt", "ph"))
          .withColumn("dstat",
            when(col("pair_id") =!= col("rep_id"), "dup_dropped")
              .when(col("rnk") > 3, "overflow_dropped"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val d5 = g5.filter(col("dstat").isNotNull)
          .select(col("pair_id"), col("dstat").as("stage"))
        // stage 6: chosen-trigram pool diversity on cap survivors
        // (q448, 512-start window)
        val s5 = g5.filter(col("dstat").isNull)
          .select(col("pair_id"), col("prompt"), col("chosen"))
        val tg = s5.select(col("prompt"), col("pair_id"),
            explode(graft.expressions.functions.ngram_shingles(
              slice(split(lower(col("chosen")), "\\s+"), 1, 514),
              3, distinct = true)).as("g"))
          .select(col("prompt"), col("pair_id"), md5(col("g")).as("gh"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val pools = tg.groupBy(col("prompt"), col("pair_id"))
          .agg(count(lit(1)).as("types"))
          .groupBy(col("prompt"))
          .agg(count(lit(1)).as("n_responses"),
            sum(col("types")).as("sum_types"),
            min(col("pair_id")).as("keep_id"))
          .join(tg.groupBy(col("prompt"))
            .agg(countDistinct(col("gh")).as("union_types")), "prompt")
          .filter(col("n_responses") >= 3L &&
            expr("union_types * 10000 div greatest(1L, sum_types)")
              < 5000L)
          .select(col("prompt"), col("keep_id"))
        val d6 = s5.join(pools, "prompt")
          .filter(col("pair_id") =!= col("keep_id"))
          .select(col("pair_id"), lit("mode_collapsed").as("stage"))
        // manifest: every pair, exactly one stage
        val drops = d1.union(d2).union(d3).union(d4).union(d5).union(d6)
        corpus.select(col("pair_id"), col("source"), col("judge"),
            col("prompt"))
          .join(drops, Seq("pair_id"), "left")
          .withColumn("stage", coalesce(col("stage"), lit("kept")))
          .withColumn("verdict",
            when(col("stage") === "kept", "keep").otherwise(lit("drop")))
          .select(col("pair_id"), col("source"), col("judge"),
            col("prompt"), col("verdict"), col("stage"))
          .orderBy(col("pair_id"))
      },
      Some(s"""WITH base AS (
                SELECT doc_id, source, text,
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                    )::BIGINT AS draw,
                  ('0x' || substr(md5(source), 1, 2))::BIGINT AS sdraw
                FROM documents),
              c0 AS (
                SELECT doc_id AS pair_id, source, draw,
                  'rater' || (doc_id % 8) AS judge,
                  sdraw % 5 = 1 OR (sdraw % 12 = 9 AND draw % 5 = 0)
                    AS swap,
                  CASE WHEN draw % 16 = 12 THEN 'tpl_p' || (draw % 3)
                    WHEN draw % 4 = 0 THEN 'shared_p' || (draw % 50)
                    ELSE 'p' || doc_id END AS prompt,
                  'ans ' || doc_id || ' ' ||
                    array_to_string(string_split_regex(lower(text),
                      '\\s+')[1:12], ' ') AS good,
                  'ans ' || doc_id || '$Bad' AS bad
                FROM base),
              c1 AS (
                SELECT *,
                  ('0x' || substr(md5(judge), 1, 2))::BIGINT % 4 = 0
                    AS jbias,
                  CASE WHEN draw % 16 = 12
                    THEN 'standard scripted reply for ' || prompt ||
                      ' variant ' || (draw % 9) || '$Filler'
                  WHEN draw % 8 = 0 THEN 'canned answer for ' || prompt
                  ELSE good END AS chosen0
                FROM c0),
              c2 AS (
                SELECT pair_id, source, judge, prompt, draw,
                  CASE WHEN swap THEN bad ELSE chosen0 END AS chosen,
                  CASE WHEN draw % 17 = 4
                    THEN (CASE WHEN swap THEN bad ELSE chosen0 END)
                    ELSE (CASE WHEN swap THEN chosen0 ELSE bad END)
                  END AS rejected,
                  CASE WHEN jbias
                    THEN (CASE WHEN draw % 20 != 7 THEN 1 ELSE 0 END)
                    ELSE (CASE WHEN draw % 2 = 0 THEN 1 ELSE 0 END)
                  END AS wins_a
                FROM c1),
              d1 AS (
                SELECT pair_id, 'degenerate_pair' AS stage
                FROM c2 WHERE chosen = rejected),
              g1 AS (
                SELECT *, CASE WHEN len(chosen) > len(rejected)
                  THEN 1 ELSE 0 END AS longer
                FROM c2 WHERE chosen != rejected),
              lb AS (
                SELECT source FROM (
                  SELECT source, count(*) AS n, sum(longer) AS lg
                  FROM g1 GROUP BY source)
                WHERE lg * 10000 // n >= 9000),
              d2 AS (
                SELECT pair_id, 'length_biased_feed' AS stage
                FROM g1 WHERE source IN (SELECT source FROM lb)),
              g2 AS (
                SELECT *,
                  CAST(len([w FOR w IN
                    string_split_regex(lower(chosen), '\\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT)
                  - CAST(len([w FOR w IN
                    string_split_regex(lower(rejected), '\\s+')
                    IF list_contains(['the','a','of','and','to','in',
                      'is','on','for','with'], w)]) AS BIGINT) AS margin
                FROM g1 WHERE source NOT IN (SELECT source FROM lb)),
              d3 AS (
                SELECT pair_id, 'inverted_label' AS stage
                FROM g2 WHERE margin < 0),
              s3 AS (SELECT * FROM g2 WHERE margin >= 0),
              bj AS (
                SELECT judge FROM (
                  SELECT judge, count(*) AS n, sum(wins_a) AS wa
                  FROM s3 GROUP BY judge)
                WHERE (2 * wa - n) * (2 * wa - n) > 9 * n),
              d4 AS (
                SELECT pair_id, 'biased_judge' AS stage
                FROM s3 WHERE judge IN (SELECT judge FROM bj)),
              rows_ AS (
                SELECT *, md5(chosen) AS ph
                FROM s3 WHERE judge NOT IN (SELECT judge FROM bj)),
              reps AS (
                SELECT prompt, ph, min(pair_id) AS rep_id,
                  max(margin) AS score
                FROM rows_ GROUP BY prompt, ph),
              ranked AS (
                SELECT prompt, ph, rep_id,
                  row_number() OVER (PARTITION BY prompt
                    ORDER BY score DESC, ph) AS rnk
                FROM reps),
              g4 AS (
                SELECT r.*, k.rep_id, k.rnk
                FROM rows_ r JOIN ranked k
                  ON k.prompt = r.prompt AND k.ph = r.ph),
              d5 AS (
                SELECT pair_id,
                  CASE WHEN pair_id != rep_id THEN 'dup_dropped'
                    ELSE 'overflow_dropped' END AS stage
                FROM g4 WHERE pair_id != rep_id OR rnk > 3),
              s5 AS (
                SELECT pair_id, prompt, chosen
                FROM g4 WHERE pair_id = rep_id AND rnk <= 3),
              t AS (
                SELECT prompt, pair_id,
                  string_split_regex(lower(chosen), '\\s+') AS toks
                FROM s5),
              tg AS (
                SELECT DISTINCT prompt, pair_id,
                  md5(array_to_string(toks[p.p + 1:p.p + 3], ' '))
                    AS gh
                FROM t, (SELECT unnest(generate_series(0, 511)) AS p) p
                WHERE p.p <= len(toks) - 3),
              pr AS (
                SELECT prompt, pair_id, count(*) AS types
                FROM tg GROUP BY prompt, pair_id),
              pa AS (
                SELECT prompt, count(*) AS n_responses,
                  sum(types) AS sum_types, min(pair_id) AS keep_id
                FROM pr GROUP BY prompt),
              pu AS (
                SELECT prompt, count(DISTINCT gh) AS union_types
                FROM tg GROUP BY prompt),
              coll AS (
                SELECT pa.prompt, keep_id
                FROM pa JOIN pu USING (prompt)
                WHERE n_responses >= 3
                  AND union_types * 10000 // greatest(1, sum_types)
                    < 5000),
              d6 AS (
                SELECT s5.pair_id, 'mode_collapsed' AS stage
                FROM s5 JOIN coll ON coll.prompt = s5.prompt
                WHERE s5.pair_id != coll.keep_id),
              drops AS (
                SELECT * FROM d1 UNION ALL SELECT * FROM d2
                UNION ALL SELECT * FROM d3 UNION ALL SELECT * FROM d4
                UNION ALL SELECT * FROM d5 UNION ALL SELECT * FROM d6)
              SELECT c.pair_id, c.source, c.judge, c.prompt,
                CASE WHEN d.stage IS NULL THEN 'keep' ELSE 'drop' END
                  AS verdict,
                coalesce(d.stage, 'kept') AS stage
              FROM c2 c LEFT JOIN drops d USING (pair_id)
              ORDER BY c.pair_id""")),

    // LSH bucket-occupancy census (VERDICT r16 item 3): the ×1000
    // suffix-replica probe filled a 77 GB disk because band buckets
    // saturated the cap and in-bucket candidates went quadratic
    // (SCALE.md §Round-16) — this is the planner that prices that run
    // BEFORE it happens. Pipeline.minhashBucketsMd5Over builds the q37
    // production index's bucket frame over the exact-collapsed corpus;
    // Dedup.bucketCensus rolls occupancy up per band: buckets/members/
    // max occupancy, saturated-bucket count and member mass, projected
    // in-bucket candidate pairs with and without the cap (the
    // quadratic blowup, priced), and an integer-exact recommendation
    // (run_as_is / cap_tail / ladder_first / escalate_resplit — see
    // the operator scaladoc for the decision rule). Plant: the probe's
    // adversarial shape in miniature — every doc_id % 97 = 0 seed
    // re-published 40× with a one-token suffix edit (distinct texts,
    // immune to exact collapse; near-identical shingle sets, so every
    // replica lands in its family's band buckets). Expected census:
    // 6 saturated buckets per band at cap 16, ~3000 bp saturated mass,
    // average saturated occupancy ~38 ≥ 2×cap -> 'ladder_first' on
    // every band (collapse the families BEFORE banding; a cap alone
    // would silently drop their true-duplicate pairs).
    QEntry("q454_lsh_bucket_census",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        val fam = base.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), lit(40))).as("i"))
          .select((col("doc_id") * 1000L + col("i") + 40000000L)
            .as("doc_id"),
            concat(col("text"), lit(" rep "), col("i")).as("text"))
        val corpus = base.union(fam)
        val (reps, _) = graft.pipeline.Dedup
          .collapseExactDocs(corpus, "doc_id", "text")
        val buckets = Pipeline.minhashBucketsMd5Over(
          reps.select(col("doc_id"), col("text")))
        graft.pipeline.Dedup.bucketCensus(buckets, 16L)
          .select(col("band").cast("long").as("band"),
            col("n_buckets"), col("n_members"), col("max_occ"),
            col("buckets_at_cap"), col("mass_at_cap"),
            col("uncapped_pairs"), col("capped_pairs"),
            col("sat_bp"), col("recommendation"))
      },
      Some {
        val P = 4294967311L
        val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
        }.mkString("[", ",\n                  ", "]")
        s"""WITH b0 AS (SELECT doc_id, text FROM documents),
            fam AS (
              SELECT doc_id * 1000 + i + 40000000 AS doc_id,
                text || ' rep ' || i AS text
              FROM b0, (SELECT unnest(generate_series(1, 40)) AS i) i
              WHERE doc_id % 97 = 0),
            corpus AS (
              SELECT * FROM b0 UNION ALL SELECT * FROM fam),
            grp AS (
              SELECT md5(text) AS h0, min(doc_id) AS keep_id
              FROM corpus GROUP BY 1),
            reps AS (
              SELECT c.doc_id, c.text
              FROM corpus c JOIN grp g ON g.keep_id = c.doc_id),
            t AS (
              SELECT doc_id,
                string_split_regex(lower(text), '\\s+') AS toks
              FROM reps),
            sh AS (
              SELECT doc_id, list_distinct(list_transform(
                range(1, len(toks) - 1),
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
              FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
            occ AS (
              SELECT band, bkey, count(*) AS occ
              FROM bands GROUP BY 1, 2),
            census AS (
              SELECT band, count(*) AS n_buckets, sum(occ) AS n_members,
                max(occ) AS max_occ,
                sum(CASE WHEN occ >= 16 THEN 1 ELSE 0 END)
                  AS buckets_at_cap,
                sum(CASE WHEN occ >= 16 THEN occ ELSE 0 END)
                  AS mass_at_cap,
                sum(occ * (occ - 1) // 2) AS uncapped_pairs,
                sum(least(occ, 16) * (least(occ, 16) - 1) // 2)
                  AS capped_pairs
              FROM occ GROUP BY band)
            SELECT CAST(band AS BIGINT) AS band,
              CAST(n_buckets AS BIGINT) AS n_buckets,
              CAST(n_members AS BIGINT) AS n_members,
              CAST(max_occ AS BIGINT) AS max_occ,
              CAST(buckets_at_cap AS BIGINT) AS buckets_at_cap,
              CAST(mass_at_cap AS BIGINT) AS mass_at_cap,
              CAST(uncapped_pairs AS BIGINT) AS uncapped_pairs,
              CAST(capped_pairs AS BIGINT) AS capped_pairs,
              CAST(mass_at_cap * 10000 // greatest(1, n_members)
                AS BIGINT) AS sat_bp,
              CASE WHEN buckets_at_cap = 0 THEN 'run_as_is'
                WHEN mass_at_cap * 10000 // greatest(1, n_members)
                  < 2000 THEN 'cap_tail'
                WHEN mass_at_cap // greatest(1, buckets_at_cap) >= 32
                  THEN 'ladder_first'
                ELSE 'escalate_resplit' END AS recommendation
            FROM census ORDER BY band"""
      }),

    // The q454 planner's recommendation, ACTED ON and re-measured — the
    // closed loop that proves the census is operational, not advisory:
    // same saturating plant, census reads 'ladder_first' on every band
    // (before phase); apply the ladder — exact collapse (already in the
    // q454 shape) + near-dup collapse at the q37 verify threshold
    // (J >= 4/5, min-id-keep: any doc with a verified smaller-id
    // neighbor drops — exact for the plant's clique families, the q30
    // convention); re-census the SAME bucket frame restricted to
    // survivors (after phase). Expected flip: every replica collapses
    // into its seed, zero saturated buckets remain, recommendation
    // reads 'run_as_is', and the projected uncapped pair mass drops
    // from ~4k per band to 0. ONE signature build feeds candidate
    // generation and BOTH censuses (minhashCandidatesFromBuckets over
    // the checkpointed bucket frame).
    QEntry("q455_census_replan",
      (s, d) => {
        val base = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
        val fam = base.filter(col("doc_id") % 97 === 0)
          .select(col("doc_id"), col("text"),
            explode(sequence(lit(1), lit(40))).as("i"))
          .select((col("doc_id") * 1000L + col("i") + 40000000L)
            .as("doc_id"),
            concat(col("text"), lit(" rep "), col("i")).as("text"))
        val corpus = base.union(fam)
        val (reps0, _) = graft.pipeline.Dedup
          .collapseExactDocs(corpus, "doc_id", "text")
        val reps = reps0.select(col("doc_id"), col("text"))
          .localCheckpoint() // buckets + token arrays + kept anti-join
        val buckets = Pipeline.minhashBucketsMd5Over(reps)
        val ver = graft.pipeline.Dedup.verifyJaccard(
            Pipeline.minhashCandidatesFromBuckets(buckets),
            graft.pipeline.Dedup.tokenArrays(reps, "doc_id", "text"), 0.0)
          .filter(col("inter") * 5 >= col("uni") * 4)
        val kept = reps.select(col("doc_id"))
          .join(ver.select(col("b_id").as("doc_id")), Seq("doc_id"),
            "left_anti")
        def census(b: org.apache.spark.sql.DataFrame, phase: String) =
          graft.pipeline.Dedup.bucketCensus(b, 16L)
            .select(lit(phase).as("phase"),
              col("band").cast("long").as("band"), col("n_buckets"),
              col("buckets_at_cap"), col("mass_at_cap"),
              col("uncapped_pairs"), col("recommendation"))
        census(buckets, "before")
          .union(census(buckets.join(kept, "doc_id"), "after"))
          .orderBy(col("phase").desc, col("band"))
      },
      Some {
        val P = 4294967311L
        val sigList = Pipeline.MinHashPerms.map { case (a, b) =>
          s"list_min(list_transform(hs, x -> (x*$a+$b)%$P))"
        }.mkString("[", ",\n                  ", "]")
        s"""WITH b0 AS (SELECT doc_id, text FROM documents),
            fam AS (
              SELECT doc_id * 1000 + i + 40000000 AS doc_id,
                text || ' rep ' || i AS text
              FROM b0, (SELECT unnest(generate_series(1, 40)) AS i) i
              WHERE doc_id % 97 = 0),
            corpus AS (
              SELECT * FROM b0 UNION ALL SELECT * FROM fam),
            grp AS (
              SELECT md5(text) AS h0, min(doc_id) AS keep_id
              FROM corpus GROUP BY 1),
            reps AS (
              SELECT c.doc_id, c.text
              FROM corpus c JOIN grp g ON g.keep_id = c.doc_id),
            t AS (
              SELECT doc_id,
                string_split_regex(lower(text), '\\s+') AS toks
              FROM reps),
            sh AS (
              SELECT doc_id, list_distinct(list_transform(
                range(1, len(toks) - 1),
                i -> array_to_string(toks[i:i+2], ' '))) AS shingles
              FROM t),
            h AS (
              SELECT doc_id, list_transform(shingles,
                s -> ('0x' || substr(md5(s), 1, 8))::BIGINT) AS hs
              FROM sh WHERE len(shingles) > 0),
            sig AS (SELECT doc_id, $sigList AS sig FROM h),
            bands AS (
              SELECT doc_id, band,
                array_to_string(list_transform(sig[band*4+1:band*4+4],
                  x -> CAST(x AS VARCHAR)), ',') AS bkey
              FROM sig CROSS JOIN (SELECT unnest([0,1,2,3]) AS band) b),
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
              SELECT doc_id, unnest(list_distinct(
                string_split_regex(lower(text), '\\s+'))) AS tok
              FROM reps),
            sizes AS (
              SELECT doc_id, count(*) AS ntok FROM tok GROUP BY doc_id),
            inter AS (
              SELECT c.a_id, c.b_id, count(*) AS inter
              FROM cand c
              JOIN tok a ON a.doc_id = c.a_id
              JOIN tok b ON b.doc_id = c.b_id AND b.tok = a.tok
              GROUP BY c.a_id, c.b_id),
            ver AS (
              SELECT i.a_id, i.b_id FROM inter i
              JOIN sizes sa ON sa.doc_id = i.a_id
              JOIN sizes sb ON sb.doc_id = i.b_id
              WHERE i.inter * 5 >= (sa.ntok + sb.ntok - i.inter) * 4),
            kept AS (
              SELECT doc_id FROM reps
              WHERE doc_id NOT IN (SELECT b_id FROM ver)),
            occ1 AS (
              SELECT band, bkey, count(*) AS occ
              FROM bands GROUP BY 1, 2),
            occ2 AS (
              SELECT band, bkey, count(*) AS occ
              FROM bands JOIN kept USING (doc_id) GROUP BY 1, 2),
            c1 AS (
              SELECT 'before' AS phase, band, count(*) AS n_buckets,
                sum(CASE WHEN occ >= 16 THEN 1 ELSE 0 END)
                  AS buckets_at_cap,
                sum(CASE WHEN occ >= 16 THEN occ ELSE 0 END)
                  AS mass_at_cap,
                sum(occ) AS n_members,
                sum(occ * (occ - 1) // 2) AS uncapped_pairs
              FROM occ1 GROUP BY band),
            c2 AS (
              SELECT 'after' AS phase, band, count(*) AS n_buckets,
                sum(CASE WHEN occ >= 16 THEN 1 ELSE 0 END)
                  AS buckets_at_cap,
                sum(CASE WHEN occ >= 16 THEN occ ELSE 0 END)
                  AS mass_at_cap,
                sum(occ) AS n_members,
                sum(occ * (occ - 1) // 2) AS uncapped_pairs
              FROM occ2 GROUP BY band),
            u AS (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
            SELECT phase, CAST(band AS BIGINT) AS band,
              CAST(n_buckets AS BIGINT) AS n_buckets,
              CAST(buckets_at_cap AS BIGINT) AS buckets_at_cap,
              CAST(mass_at_cap AS BIGINT) AS mass_at_cap,
              CAST(uncapped_pairs AS BIGINT) AS uncapped_pairs,
              CASE WHEN buckets_at_cap = 0 THEN 'run_as_is'
                WHEN mass_at_cap * 10000 // greatest(1, n_members)
                  < 2000 THEN 'cap_tail'
                WHEN mass_at_cap // greatest(1, buckets_at_cap) >= 32
                  THEN 'ladder_first'
                ELSE 'escalate_resplit' END AS recommendation
            FROM u ORDER BY phase DESC, band"""
      })
  )
}
