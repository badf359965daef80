package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 closing pack: distribution-stability monitoring and graph
  * analytics. Conventions unchanged (integer micro-nats, md5
  * determinism, total output orders).
  */
object Pipeline12 {

  val entries: Seq[QEntry] = Seq(

    // Population Stability Index between the first and second half of
    // the event stream, per event_type, over fixed value-decile
    // buckets: PSI = Σ_buckets (p−q)·ln(p/q) — THE model-monitoring
    // drift metric, in the suite's integer discipline: counts exact,
    // add-one smoothing, per-bucket ln rounded to micro-nats BEFORE
    // the (p−q)-weighted sum, the weight itself carried as exact
    // integer cross-products so the total is order-independent.
    // Scale shape: one corpus agg to (type, half, bucket) counts;
    // everything after is dimension-sized. Fixed bucket edges (cents
    // deciles of the fixture's [0, 500] value range) — data-
    // independent, so the operator streams.
    QEntry("q184_psi_drift",
      (s, d) => {
        val half = (col("event_id") % 2).as("half") // deterministic A/B split
        val bucket = least(lit(9L), expr("cents div 5000")).as("bucket")
        val cnt = Tables.events(s, d)
          .select(col("event_type"),
            expr("CAST(round(value * 100) AS BIGINT)").as("cents"), half)
          .select(col("event_type"), col("half"), bucket)
          .groupBy(col("event_type"), col("half"), col("bucket"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds grid + totals
        val grid = cnt.select(col("event_type")).distinct()
          .crossJoin(s.range(0, 10).select(col("id").as("bucket")))
          .crossJoin(s.range(0, 2).select(col("id").as("half")))
          .join(cnt, Seq("event_type", "half", "bucket"), "left")
          .select(col("event_type"), col("half"), col("bucket"),
            coalesce(col("c"), lit(0L)).as("c"))
        val tot = grid.groupBy(col("event_type"), col("half"))
          .agg(sum(col("c")).as("n"))
        val wide = grid.join(tot, Seq("event_type", "half"))
          .groupBy(col("event_type"), col("bucket"))
          .agg(sum(when(col("half") === 0, col("c")).otherwise(0L)).as("ca"),
            max(when(col("half") === 0, col("n"))).as("na"),
            sum(when(col("half") === 1, col("c")).otherwise(0L)).as("cb"),
            max(when(col("half") === 1, col("n"))).as("nb"))
        // p = (ca+1)/(na+10), q = (cb+1)/(nb+10); term: (p−q)·ln(p/q)
        // carried as integer cross-products: (ca+1)(nb+10) − (cb+1)(na+10)
        // over the common denominator, times the rounded micro-nat ln.
        wide.select(col("event_type"), col("bucket"),
            ((col("ca") + 1) * (col("nb") + 10) -
             (col("cb") + 1) * (col("na") + 10)).as("num"),
            ((col("na") + 10) * (col("nb") + 10)).as("den"),
            round(log(((col("ca") + 1) * (col("nb") + 10)).cast("double") /
              ((col("cb") + 1) * (col("na") + 10))) * 1e6, 0)
              .cast("long").as("lr_unats"))
          .groupBy(col("event_type"))
          .agg(max(col("den")).as("den"),
            sum(col("num") * col("lr_unats")).as("psi_num_unats"))
          .select(col("event_type"),
            // PSI in micro-nats: the exact integer numerator divided by
            // the common denominator, floored on the double quotient
            floor(col("psi_num_unats").cast("double") / col("den"))
              .cast("long").as("psi_unats"))
          .orderBy(col("event_type"))
      },
      Some("""WITH e AS (
                SELECT event_type, event_id % 2 AS half,
                  least(9, CAST(round(value * 100) AS BIGINT) // 5000)
                    AS bucket
                FROM events),
              cnt AS (
                SELECT event_type, half, bucket, count(*) AS c
                FROM e GROUP BY 1, 2, 3),
              ty AS (SELECT DISTINCT event_type FROM cnt),
              grid AS (
                SELECT ty.event_type, h.half, b.bucket,
                  coalesce(cnt.c, 0) AS c
                FROM ty
                CROSS JOIN (VALUES (0), (1)) h(half)
                CROSS JOIN range(10) b(bucket)
                LEFT JOIN cnt ON cnt.event_type = ty.event_type
                 AND cnt.half = h.half AND cnt.bucket = b.bucket),
              tot AS (
                SELECT event_type, half, sum(c) AS n
                FROM grid GROUP BY 1, 2),
              wide AS (
                SELECT g.event_type, g.bucket,
                  sum(CASE WHEN g.half = 0 THEN g.c ELSE 0 END) AS ca,
                  max(CASE WHEN g.half = 0 THEN t.n END) AS na,
                  sum(CASE WHEN g.half = 1 THEN g.c ELSE 0 END) AS cb,
                  max(CASE WHEN g.half = 1 THEN t.n END) AS nb
                FROM grid g JOIN tot t
                  ON t.event_type = g.event_type AND t.half = g.half
                GROUP BY 1, 2),
              term AS (
                SELECT event_type, bucket,
                  (ca + 1) * (nb + 10) - (cb + 1) * (na + 10) AS num,
                  (na + 10) * (nb + 10) AS den,
                  CAST(round(ln(CAST((ca + 1) * (nb + 10) AS DOUBLE) /
                    ((cb + 1) * (na + 10))) * 1e6) AS BIGINT) AS lr_unats
                FROM wide)
              SELECT event_type,
                CAST(floor(CAST(sum(num * lr_unats) AS DOUBLE) / max(den))
                  AS BIGINT) AS psi_unats
              FROM term GROUP BY event_type ORDER BY event_type""")),

    // Triangle counting by the degree-ordered "forward" algorithm
    // (Schank & Wagner 2005): orient every edge from the lower-rank
    // endpoint to the higher (rank = (degree, id) — the orientation
    // that bounds out-degrees by O(√E)), join the oriented edge set
    // with itself on the wedge vertex, and close each wedge against
    // the original edges. Two keyed joins, no vertex ever enumerates
    // its full neighborhood² unless it is genuinely high-degree in the
    // oriented graph. Same derived link graph as q178, symmetrized.
    QEntry("q185_triangles",
      (s, d) => {
        // shared synthetic link graph (DocGraph — also feeds q299)
        val (docs, und) = DocGraph.docsAndUnd(s, d)
        val deg = und.select(explode(array(col("u"), col("v"))).as("x"))
          .groupBy(col("x")).agg(count(lit(1)).as("dg"))
        // orient by (degree, id): a -> b iff (dg_a, a) < (dg_b, b)
        val oriented = und
          .join(deg.select(col("x").as("u"), col("dg").as("du")), "u")
          .join(deg.select(col("x").as("v"), col("dg").as("dv")), "v")
          .select(
            when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
              struct(col("u").as("a"), col("v").as("b")))
              .otherwise(struct(col("v").as("a"), col("u").as("b")))
              .as("e"))
          .select(col("e.a").as("a"), col("e.b").as("b"))
          .localCheckpoint() // two consumers of the wedge join
        val wedges = oriented.select(col("a"), col("b").as("w1"))
          .join(oriented.select(col("a"), col("b").as("w2")), "a")
          .filter(col("w1") < col("w2"))
        val tri = wedges.join(und,
          col("u") === col("w1") && col("v") === col("w2"))
        tri.select(explode(array(col("a"), col("w1"), col("w2"))).as("doc_id"))
          .groupBy(col("doc_id")).agg(count(lit(1)).as("n_triangles"))
          .join(docs, Seq("doc_id"), "right")
          .select(col("doc_id"),
            coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${DocGraph.undSql},
              deg AS (
                SELECT x, count(*) AS dg FROM (
                  SELECT u AS x FROM und UNION ALL SELECT v FROM und)
                GROUP BY x),
              ori AS (
                SELECT CASE WHEN (du.dg, und.u) < (dv.dg, und.v)
                       THEN und.u ELSE und.v END AS a,
                  CASE WHEN (du.dg, und.u) < (dv.dg, und.v)
                       THEN und.v ELSE und.u END AS b
                FROM und
                JOIN deg du ON du.x = und.u
                JOIN deg dv ON dv.x = und.v),
              wedge AS (
                SELECT o1.a, o1.b AS w1, o2.b AS w2
                FROM ori o1 JOIN ori o2 ON o1.a = o2.a
                WHERE o1.b < o2.b),
              tri AS (
                SELECT w.a, w.w1, w.w2
                FROM wedge w JOIN und ON und.u = w.w1 AND und.v = w.w2),
              pern AS (
                SELECT x AS doc_id, count(*) AS n_triangles FROM (
                  SELECT a AS x FROM tri
                  UNION ALL SELECT w1 FROM tri
                  UNION ALL SELECT w2 FROM tri)
                GROUP BY x)
              SELECT d.doc_id,
                coalesce(p.n_triangles, 0) AS n_triangles
              FROM documents d LEFT JOIN pern p ON p.doc_id = d.doc_id
              ORDER BY d.doc_id""")),

    // Semi-supervised pseudo-labeling: 2 rounds of majority-vote label
    // propagation over the mutual k-NN graph (q159's integer-exact
    // chain) — seeds (vec_id % 3 == 0) keep their true label (clamped),
    // the rest adopt the plurality of their labeled neighbors each
    // round (ties → smallest label; still-isolated nodes stay -1).
    // The cheap-label amplifier every classifier-filter pipeline runs
    // before training on weak labels. Per round: one edge-keyed join +
    // one (node, label) vote agg + one argmax window — the PageRank
    // round shape with votes instead of mass. On a dup-heavy corpus,
    // compose with the q172 collapse first (identical vectors carry
    // identical labels, so members inherit their rep's vote) — the
    // plain chain inherits q159's duplicate-bucket blowup, measured in
    // SCALE.md's sf≈1 table.
    QEntry("q186_label_propagation",
      (s, d) => {
        val corpusQ = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
              .as("qe"))
          .localCheckpoint()
        val knn = graft.pipeline.Similarity.cosineTopKBucketedQ(
            corpusQ.select(col("vec_id").as("q_id"), col("qe")),
            corpusQ.select(col("vec_id"), col("qe")), nBits = 4, k = 4,
            knownQueryCount = Some(Long.MaxValue))
          .filter(col("q_id") =!= col("vec_id"))
          .select(col("q_id").as("a"), col("vec_id").as("b"))
          .localCheckpoint()
        val mutual = knn
          .join(knn.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"))
        val seeds = corpusQ.select(col("vec_id"),
          (col("vec_id") % 3 === 0).as("is_seed"), col("label"))
        var lab = seeds.select(col("vec_id"),
          when(col("is_seed"), col("label")).otherwise(lit(-1L)).as("lab"))
        for (_ <- 1 to 2) {
          val votes = mutual
            .join(lab.select(col("vec_id").as("b"), col("lab")), "b")
            .filter(col("lab") =!= -1L)
            .groupBy(col("a"), col("lab")).agg(count(lit(1)).as("v"))
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window.partitionBy(col("a"))
                .orderBy(col("v").desc, col("lab"))))
            .filter(col("rn") === 1)
            .select(col("a").as("vec_id"), col("lab").as("voted"))
          lab = seeds.join(votes, Seq("vec_id"), "left")
            .select(col("vec_id"),
              when(col("is_seed"), col("label"))
                .otherwise(coalesce(col("voted"), lit(-1L))).as("lab"))
            .localCheckpoint()
        }
        seeds.join(lab, "vec_id")
          .select(col("vec_id"),
            when(col("is_seed"), col("label")).otherwise(-1L).as("seed_label"),
            col("lab").as("final_label"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH qz AS (
                SELECT vec_id, CAST(label AS BIGINT) AS label,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS qe
                FROM embeddings),
              bk AS (SELECT vec_id, label, qe,
                       ${Pipeline2.duckBucketBits(4)} AS bucket
                     FROM qz),
              cand AS (
                SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
                  CAST(list_sum(list_transform(range(len(q.qe)),
                    i -> q.qe[i+1] * c.qe[i+1])) AS BIGINT) AS dot,
                  CAST(list_sum(list_transform(q.qe, x -> x*x)) AS BIGINT) AS na,
                  CAST(list_sum(list_transform(c.qe, x -> x*x)) AS BIGINT) AS nb
                FROM bk q JOIN bk c ON q.bucket = c.bucket),
              ranked AS (
                SELECT q_id, vec_id,
                  row_number() OVER (PARTITION BY q_id
                    ORDER BY dot / (sqrt(na) * sqrt(nb)) DESC, vec_id) AS rn
                FROM cand),
              knn AS (
                SELECT q_id AS a, vec_id AS b FROM ranked
                WHERE rn <= 4 AND q_id <> vec_id),
              mu AS (
                SELECT k1.a, k1.b FROM knn k1
                JOIN knn k2 ON k1.a = k2.b AND k1.b = k2.a),
              sd AS (
                SELECT vec_id, (vec_id % 3 = 0) AS is_seed, label FROM qz),
              l0 AS (
                SELECT vec_id,
                  CASE WHEN is_seed THEN label ELSE -1 END AS lab
                FROM sd),
              v1 AS (
                SELECT mu.a, l0.lab, count(*) AS v
                FROM mu JOIN l0 ON l0.vec_id = mu.b
                WHERE l0.lab <> -1 GROUP BY 1, 2),
              w1 AS (
                SELECT a AS vec_id, lab AS voted,
                  row_number() OVER (PARTITION BY a
                    ORDER BY v DESC, lab) AS rn
                FROM v1),
              l1 AS (
                SELECT sd.vec_id,
                  CASE WHEN sd.is_seed THEN sd.label
                       ELSE coalesce(w1.voted, -1) END AS lab
                FROM sd LEFT JOIN w1
                  ON w1.vec_id = sd.vec_id AND w1.rn = 1),
              v2 AS (
                SELECT mu.a, l1.lab, count(*) AS v
                FROM mu JOIN l1 ON l1.vec_id = mu.b
                WHERE l1.lab <> -1 GROUP BY 1, 2),
              w2 AS (
                SELECT a AS vec_id, lab AS voted,
                  row_number() OVER (PARTITION BY a
                    ORDER BY v DESC, lab) AS rn
                FROM v2),
              l2 AS (
                SELECT sd.vec_id,
                  CASE WHEN sd.is_seed THEN sd.label
                       ELSE coalesce(w2.voted, -1) END AS lab
                FROM sd LEFT JOIN w2
                  ON w2.vec_id = sd.vec_id AND w2.rn = 1)
              SELECT sd.vec_id,
                CASE WHEN sd.is_seed THEN sd.label ELSE -1 END AS seed_label,
                l2.lab AS final_label
              FROM sd JOIN l2 ON l2.vec_id = sd.vec_id
              ORDER BY sd.vec_id""")),

    // Cross-source quantile normalization: each doc's score is
    // remapped to the GLOBAL score at its within-source percentile —
    // the rank-based calibration that makes per-domain quality scores
    // comparable before one global cut (a raw threshold keeps whole
    // domains whose scorer runs hot and drops domains whose scorer
    // runs cold). Within-source percentile via groupPercentileRank;
    // global value-at-rank via the GlobalRank two-pass; one keyed join
    // on the integer rank index — no single-partition window anywhere.
    QEntry("q187_quantile_normalize",
      (s, d) => {
        val scored = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            col("n_chars").cast("long").as("score"))
          .localCheckpoint() // feeds both rank passes + the count
        val n = scored.count()
        val ranked = graft.pipeline.Curation.groupPercentileRank(
          scored, "source", "score", "doc_id")
        val globalAt = graft.operators.GlobalRank.rowNumber(
            scored.select(col("score"), col("doc_id")),
            "grk", col("score"), col("doc_id"))
          .select(col("grk").cast("long").as("gidx"),
            col("score").as("norm_score"))
        ranked.select(col("grp").as("source"), col("id").as("doc_id"),
            col("score"), col("pct_bp"),
            (expr(s"(pct_bp * ${n - 1}) div 10000") + 1).as("gidx"))
          .join(globalAt, "gidx")
          .select(col("doc_id"), col("source"), col("score"),
            col("pct_bp"), col("norm_score"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (
                SELECT doc_id, source, CAST(n_chars AS BIGINT) AS score
                FROM documents),
              nn AS (SELECT count(*) AS n FROM t),
              r AS (
                SELECT doc_id, source, score,
                  row_number() OVER (PARTITION BY source
                    ORDER BY score, doc_id) AS rk,
                  count(*) OVER (PARTITION BY source) AS ng
                FROM t),
              p AS (
                SELECT doc_id, source, score,
                  CASE WHEN ng > 1
                    THEN CAST(floor((rk - 1) * 10000 / (ng - 1)) AS BIGINT)
                    ELSE 0 END AS pct_bp
                FROM r),
              g AS (
                SELECT CAST(row_number() OVER (ORDER BY score, doc_id)
                    AS BIGINT) AS gidx,
                  score AS norm_score
                FROM t)
              SELECT p.doc_id, p.source, p.score, p.pct_bp, g.norm_score
              FROM p JOIN g
                ON g.gidx = (p.pct_bp * (SELECT n - 1 FROM nn)) // 10000 + 1
              ORDER BY p.doc_id""")),

    // Deterministic Poissonized bootstrap: 8 resampling replicas of the
    // per-source mean doc length — the uncertainty bars a corpus report
    // puts on its metrics. Each (replica, doc) draws a Poisson(1)-ish
    // weight from an md5 bucket through the inverse-CDF table
    // {0: .3679, 1: .7358, 2: .9197, 3: .9810, 4: 1} (the streaming
    // bootstrap trick: independent per-row weights, no global
    // resample pass); replica means are exact integer ratios. One
    // corpus-×-8 projection + one keyed agg; fully replayable because
    // the "randomness" is md5.
    QEntry("q188_bootstrap_ci",
      (s, d) => {
        val u = conv(substring(md5(concat(col("r").cast("string"), lit(":"),
          col("doc_id").cast("string"))), 1, 8), 16, 10).cast("long")
        val w = when(col("u") < 1580030169L, 0L)   // 0.36788 * 2^32
          .when(col("u") < 3160060338L, 1L)        // 0.73576 * 2^32
          .when(col("u") < 3949913977L, 2L)        // 0.91970 * 2^32
          .when(col("u") < 4213198523L, 3L)        // 0.98101 * 2^32
          .otherwise(4L)
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"),
            explode(sequence(lit(0), lit(7))).as("r"))
          .withColumn("u", u).withColumn("w", w)
          .groupBy(col("source"), col("r"))
          .agg(sum(col("w")).as("n_eff"),
            sum(col("w") * col("n_chars")).as("sum_chars"))
          .select(col("source"), col("r"), col("n_eff"),
            expr("(sum_chars * 100) div n_eff").as("mean_chars_c"))
          .orderBy(col("source"), col("r"))
      },
      Some("""WITH x AS (
                SELECT doc_id, source, n_chars, r.r
                FROM documents CROSS JOIN range(8) r(r)),
              uw AS (
                SELECT source, r,
                  ('0x' || substr(md5(r || ':' || doc_id), 1, 8))::BIGINT AS u,
                  n_chars
                FROM x),
              w AS (
                SELECT source, r, n_chars,
                  CASE WHEN u < 1580030169 THEN 0
                       WHEN u < 3160060338 THEN 1
                       WHEN u < 3949913977 THEN 2
                       WHEN u < 4213198523 THEN 3
                       ELSE 4 END AS w
                FROM uw)
              SELECT source, CAST(r AS INT) AS r,
                CAST(sum(w) AS BIGINT) AS n_eff,
                CAST((sum(w * n_chars) * 100) // sum(w) AS BIGINT)
                  AS mean_chars_c
              FROM w GROUP BY source, r ORDER BY source, r""")),

    // Source-overlap matrix: exact 3-gram-shingle Jaccard between every
    // source pair — "how much do my sources duplicate each other", the
    // corpus-composition diligence before weighting a mixture (two
    // mirrors of the same crawl would otherwise be double-counted).
    // Distinct (source, shingle) collapses FIRST; the pair join is
    // keyed on the shingle and emits source-pair counts (dimension² ≤
    // a few hundred rows) — the corpus never self-joins at doc grain.
    QEntry("q189_source_overlap",
      (s, d) => {
        val sh = Tables.documents(s, d)
          .select(col("source"), explode(
            graft.expressions.functions.ngram_shingles(
              split(lower(col("text")), "\\s+"), 3, distinct = true)).as("g"))
          .distinct()
          .localCheckpoint() // feeds sizes + both sides of the pair join
        val sizes = sh.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val inter = sh.select(col("source").as("sa"), col("g"))
          .join(sh.select(col("source").as("sb"), col("g")), "g")
          .filter(col("sa") < col("sb"))
          .groupBy(col("sa"), col("sb")).agg(count(lit(1)).as("inter"))
        inter
          .join(sizes.select(col("source").as("sa"), col("n").as("na")), "sa")
          .join(sizes.select(col("source").as("sb"), col("n").as("nb")), "sb")
          .select(col("sa"), col("sb"), col("inter"), col("na"), col("nb"),
            expr("(inter * 10000) div (na + nb - inter)").as("jaccard_bp"))
          .orderBy(col("sa"), col("sb"))
      },
      Some("""WITH t AS (
                SELECT source, string_split_regex(lower(text), '\s+') AS toks
                FROM documents),
              sh AS (
                SELECT DISTINCT source,
                  unnest(list_distinct(list_transform(
                    range(1, len(toks) - 1),
                    i -> array_to_string(toks[i:i+2], ' ')))) AS g
                FROM t WHERE len(toks) >= 3),
              sz AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
              it AS (
                SELECT a.source AS sa, b.source AS sb, count(*) AS inter
                FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
                GROUP BY 1, 2)
              SELECT it.sa, it.sb, it.inter,
                za.n AS na, zb.n AS nb,
                (it.inter * 10000) // (za.n + zb.n - it.inter) AS jaccard_bp
              FROM it
              JOIN sz za ON za.source = it.sa
              JOIN sz zb ON zb.source = it.sb
              ORDER BY it.sa, it.sb""")),

    // Cohort retention: users bucketed by first-seen DAY (the cohort),
    // activity counted per (cohort, day-offset) as distinct active
    // users — the product-analytics table every activity dataset owes.
    // Two keyed aggs (first-seen per user, distinct (user, day)) + one
    // user-keyed join; day arithmetic in exact integer epoch-days.
    QEntry("q190_cohort_retention",
      (s, d) => {
        val day = expr("((ts div 1000) div 3600000000) div 24").as("day")
        val ev = Tables.events(s, d).select(col("user_id"), day)
          .distinct()
          .localCheckpoint() // feeds first-seen AND the activity join
        val first = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("cohort_day"))
        ev.join(first, "user_id")
          .groupBy(col("cohort_day"),
            (col("day") - col("cohort_day")).as("day_offset"))
          .agg(count_distinct(col("user_id")).as("n_users"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      Some("""WITH e AS (
                SELECT DISTINCT user_id,
                  (epoch_us(ts) // 3600000000) // 24 AS day
                FROM events),
              f AS (
                SELECT user_id, min(day) AS cohort_day
                FROM e GROUP BY user_id)
              SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
                CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users
              FROM e JOIN f USING (user_id)
              GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Ordered funnel: per user, the earliest strictly-ordered
    // view → click → purchase chain (each stage's time = the first
    // occurrence AFTER the previous stage — min-over-threshold, not
    // just min per type), with per-stage reach counts as the output.
    // The conversion diligence metric; one user-keyed agg collecting
    // per-type time arrays (bounded per user), the chain walk an
    // in-row fold over sorted arrays.
    QEntry("q191_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
          .filter(col("event_type").isin("view", "click", "purchase"))
          .select(col("user_id"), col("event_type"), col("ts"))
        val agged = ev.groupBy(col("user_id"))
          .agg(
            sort_array(collect_list(when(col("event_type") === "view",
              col("ts")))).as("tv"),
            sort_array(collect_list(when(col("event_type") === "click",
              col("ts")))).as("tc"),
            sort_array(collect_list(when(col("event_type") === "purchase",
              col("ts")))).as("tp"))
        val t1 = element_at(col("tv"), 1)
        val t2 = array_min(filter(col("tc"), x => x > col("t1")))
        val t3 = array_min(filter(col("tp"), x => x > col("t2")))
        agged
          .withColumn("t1", when(size(col("tv")) > 0, t1))
          .withColumn("t2", when(col("t1").isNotNull, t2))
          .withColumn("t3", when(col("t2").isNotNull, t3))
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("t1").isNotNull, 1L).otherwise(0L)).as("n_view"),
            sum(when(col("t2").isNotNull, 1L).otherwise(0L)).as("n_click_after"),
            sum(when(col("t3").isNotNull, 1L).otherwise(0L)).as("n_purchase_after"))
      },
      Some("""WITH e AS (
                SELECT user_id, event_type, epoch_us(ts) AS us
                FROM events
                WHERE event_type IN ('view', 'click', 'purchase')),
              t1 AS (
                SELECT user_id, min(us) AS t1 FROM e
                WHERE event_type = 'view' GROUP BY user_id),
              t2 AS (
                SELECT e.user_id, min(e.us) AS t2
                FROM e JOIN t1 USING (user_id)
                WHERE e.event_type = 'click' AND e.us > t1.t1
                GROUP BY e.user_id),
              t3 AS (
                SELECT e.user_id, min(e.us) AS t3
                FROM e JOIN t2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.us > t2.t2
                GROUP BY e.user_id),
              u AS (SELECT DISTINCT user_id FROM e)
              SELECT
                CAST((SELECT count(*) FROM u) AS BIGINT) AS n_users,
                CAST((SELECT count(*) FROM t1) AS BIGINT) AS n_view,
                CAST((SELECT count(*) FROM t2) AS BIGINT) AS n_click_after,
                CAST((SELECT count(*) FROM t3) AS BIGINT) AS n_purchase_after""")),

    // Entity resolution end to end: the record-linkage composition —
    // typo'd duplicate registrations (the q76 derivation: every 10th
    // customer re-registers under key+10⁷ with one char dropped) →
    // SymSpell deletion-signature blocking + exact edit-distance match
    // (FuzzyJoin, lossless blocking proven by q76's brute-force gate)
    // → connected components over the match graph (pointer-doubling
    // propagation) → canonical record = min key per cluster. Output:
    // every record with its canonical id and cluster size — the master
    // -data table a dedup'd CRM ships.
    QEntry("q192_entity_resolution",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))
        val p = (expr("c_custkey div 10") % length(col("c_name"))).cast("int")
        val typo = concat(col("c_name").substr(lit(1), p),
          col("c_name").substr(p + 2, length(col("c_name"))))
        val records = cust
          .union(cust.filter(col("c_custkey") % 10 === 0)
            .select((col("c_custkey") + 10000000L).as("c_custkey"),
              typo.as("c_name")))
          // Round 17 (guide §2.5 "input skew"/parallelism): the union of
          // two tiny parquet reads checkpoints as 2 partitions, and the
          // downstream deletion-signature explode — HALF this query's
          // task time — inherited that layout (8.5 s over 2 tasks with
          // 30 idle cores, JobProfile-measured). Key-hash repartition to
          // the session's parallelism BEFORE the checkpoint: one tiny
          // exchange of (key, name) rows, deterministic layout, every
          // consumer (both fuzzy-join sides, components, final join)
          // parallel. At real scale the scan has many splits and this
          // exchange is noise relative to the explode it feeds.
          .repartition(s.sparkContext.defaultParallelism, col("c_custkey"))
          .localCheckpoint() // both fuzzy-join sides + nodes + final join
        val pairs = graft.operators.FuzzyJoin.editDistance1(
            records.select(col("c_custkey").as("k"), col("c_name").as("n")),
            "k", "n", records, "c_custkey", "c_name")
          .filter(col("left_id") < col("right_id"))
          .select(col("left_id").as("a_id"), col("right_id").as("b_id"))
        val comp = graft.pipeline.Dedup.components(
          pairs, records.select(col("c_custkey").as("id")))
        val sizes = comp.groupBy(col("component"))
          .agg(count(lit(1)).as("cluster_size"))
        comp.join(sizes, "component")
          .select(col("id").as("record_id"),
            col("component").as("canonical_id"), col("cluster_size"))
          .orderBy(col("record_id"))
      },
      Some("""WITH RECURSIVE r AS (
                SELECT c_custkey, c_name FROM customer
                UNION ALL
                SELECT c_custkey + 10000000,
                  substr(c_name, 1,
                    CAST((c_custkey // 10) % length(c_name) AS BIGINT)) ||
                  substr(c_name,
                    CAST((c_custkey // 10) % length(c_name) AS BIGINT) + 2)
                FROM customer WHERE c_custkey % 10 = 0),
              e AS (
                SELECT a.c_custkey AS a_id, b.c_custkey AS b_id
                FROM r a JOIN r b
                  ON a.c_custkey < b.c_custkey
                 AND levenshtein(a.c_name, b.c_name) <= 1),
              edges AS (SELECT a_id AS src, b_id AS dst FROM e
                        UNION ALL SELECT b_id, a_id FROM e),
              comp(id, lbl) AS (
                SELECT c_custkey, c_custkey FROM r
                UNION
                SELECT edges.dst, comp.lbl
                FROM comp JOIN edges ON edges.src = comp.id),
              cm AS (
                SELECT id, min(lbl) AS canonical_id
                FROM comp GROUP BY id),
              sz AS (
                SELECT canonical_id, count(*) AS cluster_size
                FROM cm GROUP BY canonical_id)
              SELECT cm.id AS record_id, cm.canonical_id,
                CAST(sz.cluster_size AS BIGINT) AS cluster_size
              FROM cm JOIN sz USING (canonical_id)
              ORDER BY record_id"""))
  )
}
