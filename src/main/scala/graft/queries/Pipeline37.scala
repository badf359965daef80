package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, first batch: the rank/agreement/independence
  * statistics a data-quality owner runs over scorer and label columns
  * (Spearman, Kendall tau-b, Cohen's kappa, chi-square + Cramér's V) —
  * all on the suite's exact-integer dimension discipline — plus the
  * collapsed label-propagation composition (q288), the measured scale
  * answer to q186's duplicate-bucket pathology (SCALE.md), following
  * the q159 precedent: collapse identical quantized vectors to min-id
  * reps, propagate on the rep graph, members inherit their rep's
  * outcome.
  */
object Pipeline37 {

  def entries: Seq[QEntry] = Seq(

    // Label propagation over the COLLAPSED mutual k-NN graph — the
    // dup-dense composition q186's own scaladoc prescribes, gate-pinned
    // with its own oracle (like q159's collapsed contract): identical
    // quantized vectors collapse to min-id reps BEFORE bucketing, the
    // 2-round majority-vote propagation runs on the rep graph (rep
    // seed/label = the rep row's own), and every member inherits its
    // rep's final label. On duplication-dense corpora this restores
    // the q172/q159 cost line (the plain q186 chain squares inside
    // every LSH bucket — SCALE.md sf≈1: 31.4 s plain); on a dup-free
    // corpus reps == all nodes and this IS q186's propagation (the
    // Pipeline37Spec equality). Quantize/collapse/bucket/score/vote
    // are all int64 ⇒ the oracle replays the chain bit-for-bit.
    QEntry("q288_labelprop_collapsed",
      (s, d) => {
        val corpusQ = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("label"),
            graft.expressions.functions.quantize_vec(col("embedding"), 10000.0)
              .as("qe"))
          .localCheckpoint() // feeds collapse + both join sides
        val keyed = corpusQ.withColumn("k",
          md5(concat_ws(",", col("qe").cast("array<string>"))))
        val grp = keyed.groupBy(col("k"))
          .agg(min(col("vec_id")).as("rep_id"))
          .localCheckpoint()
        val membership = keyed.join(grp, "k")
          .select(col("vec_id"), col("rep_id"))
        val reps = keyed.join(grp, "k")
          .filter(col("vec_id") === col("rep_id"))
          .select(col("vec_id"), col("label"), col("qe"))
          .localCheckpoint()
        val knn = graft.pipeline.Similarity.cosineTopKBucketedQ(
            reps.select(col("vec_id").as("q_id"), col("qe")),
            reps.select(col("vec_id"), col("qe")), nBits = 4, k = 4,
            knownQueryCount = Some(Long.MaxValue))
          .filter(col("q_id") =!= col("vec_id"))
          .select(col("q_id").as("a"), col("vec_id").as("b"))
          .localCheckpoint() // feeds both sides of the mutual join
        val mutual = knn
          .join(knn.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"))
        val seeds = reps.select(col("vec_id"),
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
        membership
          .join(lab.select(col("vec_id").as("rep_id"), col("lab")), "rep_id")
          .select(col("vec_id"), col("rep_id"), col("lab").as("final_label"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH qz AS (
                SELECT vec_id, CAST(label AS BIGINT) AS label,
                  list_transform(embedding,
                    v -> CAST(round(CAST(v AS DOUBLE) * 10000.0) AS BIGINT))
                    AS qe
                FROM embeddings),
              kq AS (
                SELECT vec_id, label, qe,
                  md5(list_aggregate(list_transform(qe,
                    x -> CAST(x AS VARCHAR)), 'string_agg', ',')) AS k
                FROM qz),
              grp AS (SELECT k, min(vec_id) AS rep_id FROM kq GROUP BY k),
              membership AS (
                SELECT kq.vec_id, g.rep_id FROM kq JOIN grp g USING (k)),
              repv AS (
                SELECT g.rep_id AS vec_id, kq.label, kq.qe
                FROM grp g JOIN kq ON kq.vec_id = g.rep_id),
              bk AS (SELECT vec_id, label, qe,
                       ${Pipeline2.duckBucketBits(4)} AS bucket
                     FROM repv),
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
                SELECT vec_id, (vec_id % 3 = 0) AS is_seed, label FROM repv),
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
              SELECT m.vec_id, m.rep_id, l2.lab AS final_label
              FROM membership m JOIN l2 ON l2.vec_id = m.rep_id
              ORDER BY m.vec_id""")),

    // Spearman rank correlation between quantity and price: tie-aware
    // average ranks kept INTEGRAL by doubling (2·avgrank = 2·cum −
    // cnt + 1 on each value dimension, via the two-pass GlobalCumSum —
    // no corpus sort), ranks joined back (the 50-value quantity dim
    // broadcasts; the price dim is a keyed join), then q279's
    // moment-sum Pearson over the doubled ranks. rho is scale/shift
    // invariant, so the doubling cancels. The rank moments grow as 4n³
    // (past long near n ≈ 1e6 — the sf≈1 replica's 6M lineitem rows
    // overflow it, measured), so the second-order sums accumulate in
    // decimal(38,0): exact to 1e38 ⇒ safe past n = 1e12 rows, and
    // bit-identical to the DuckDB oracle's int128 sums. First-order
    // sums stay long (≤ 4n² — fine to n ≈ 1.5e9; they too go decimal
    // at true 100 TB grain).
    QEntry("q289_spearman",
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT) div 100")
              .as("y"))
          // lazy persist, not an eager localCheckpoint barrier: feeds
          // both rank dims + the joined moments in ONE action, and an
          // eviction under host pressure recomputes the deterministic
          // 2-long projection instead of rereading a cold disk block
          // (the BENCH_r15 six-outlier signature, VERDICT r15 item 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def rank2(c: String): org.apache.spark.sql.DataFrame = {
          val dim = base.groupBy(col(c)).agg(count(lit(1)).as("cnt"))
          graft.operators.GlobalCumSum
            .runningSum(dim, col("cnt"), "cum", col(c))
            .select(col(c),
              (lit(2L) * col("cum") - col("cnt") + 1L).as(s"r_$c"))
        }
        val m = base
          .join(broadcast(rank2("x")), "x")
          .join(rank2("y"), "y")
          .select(col("r_x").cast("decimal(19,0)").as("dx"),
            col("r_y").cast("decimal(19,0)").as("dy"))
          .agg(count(lit(1)).as("n"),
            sum(col("dx")).cast("long").as("sa"),
            sum(col("dy")).cast("long").as("sb"),
            sum(col("dx") * col("dx")).as("ssa"),
            sum(col("dy") * col("dy")).as("ssb"),
            sum(col("dx") * col("dy")).as("sab"))
        m.select(col("n"),
          expr("CAST(round((CAST(n AS DOUBLE) * sab - " +
            "CAST(sa AS DOUBLE) * sb) / " +
            "(sqrt(CAST(n AS DOUBLE) * ssa - CAST(sa AS DOUBLE) * sa) * " +
            "sqrt(CAST(n AS DOUBLE) * ssb - CAST(sb AS DOUBLE) * sb)) " +
            "* 1e6) AS BIGINT)").as("rho_ppm"))
      },
      Some("""WITH base AS (
                SELECT CAST(l_quantity AS BIGINT) AS x,
                  CAST(round(l_extendedprice * 100) AS BIGINT) // 100 AS y
                FROM lineitem),
              dx AS (
                SELECT x, count(*) AS cnt,
                  sum(count(*)) OVER (ORDER BY x
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM base GROUP BY x),
              rx AS (SELECT x, 2 * cum - cnt + 1 AS r_x FROM dx),
              dy AS (
                SELECT y, count(*) AS cnt,
                  sum(count(*)) OVER (ORDER BY y
                    ROWS UNBOUNDED PRECEDING) AS cum
                FROM base GROUP BY y),
              ry AS (SELECT y, 2 * cum - cnt + 1 AS r_y FROM dy),
              j AS (
                SELECT r_x, r_y FROM base
                JOIN rx USING (x) JOIN ry USING (y)),
              m AS (
                SELECT count(*) AS n, sum(r_x) AS sa, sum(r_y) AS sb,
                  sum(r_x * r_x) AS ssa, sum(r_y * r_y) AS ssb,
                  sum(r_x * r_y) AS sab
                FROM j)
              SELECT n,
                CAST(round((CAST(n AS DOUBLE) * sab -
                  CAST(sa AS DOUBLE) * sb) /
                  (sqrt(CAST(n AS DOUBLE) * ssa - CAST(sa AS DOUBLE) * sa) *
                   sqrt(CAST(n AS DOUBLE) * ssb - CAST(sb AS DOUBLE) * sb))
                  * 1e6) AS BIGINT) AS rho_ppm
              FROM m""")),

    // Kendall tau-b between quantity (50 values) and linenumber (7):
    // concordant/discordant pairs counted on the ≤350-cell contingency
    // DIMENSION — one broadcast self-join over cells with strict
    // inequality conditions (each unordered cell pair lands exactly
    // once under x1<x2), never an O(n²) row join. Tie corrections from
    // the marginals; everything integral except tau-b's two rounded
    // sqrts (the q283 discipline).
    QEntry("q290_kendall_tau",
      (s, d) => {
        val cells = Tables.lineitem(s, d)
          .select(expr("CAST(l_quantity AS BIGINT)").as("x"),
            expr("CAST(l_linenumber AS BIGINT)").as("y"))
          .groupBy(col("x"), col("y")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // bounded by construction: |qty|×|ln| ≤ 350
        val pairs = cells.select(col("x").as("x1"), col("y").as("y1"),
            col("cnt").as("n1"))
          .join(broadcast(cells.select(col("x").as("x2"), col("y").as("y2"),
            col("cnt").as("n2"))), col("x1") < col("x2"))
          .agg(
            sum(when(col("y1") < col("y2"), col("n1") * col("n2"))
              .otherwise(0L)).as("c_pairs"),
            sum(when(col("y1") > col("y2"), col("n1") * col("n2"))
              .otherwise(0L)).as("d_pairs"))
        val tiesX = cells.groupBy(col("x")).agg(sum(col("cnt")).as("tx"))
          .agg(expr("sum(tx * (tx - 1) div 2)").as("n1_ties"),
            sum(col("tx")).as("n"))
        val tiesY = cells.groupBy(col("y")).agg(sum(col("cnt")).as("ty"))
          .agg(expr("sum(ty * (ty - 1) div 2)").as("n2_ties"))
        pairs.crossJoin(broadcast(tiesX)).crossJoin(broadcast(tiesY))
          .select(col("n"), col("c_pairs"), col("d_pairs"),
            expr("n * (n - 1) div 2").as("n0"),
            col("n1_ties"), col("n2_ties"))
          .select(col("n"), col("c_pairs"), col("d_pairs"), col("n0"),
            col("n1_ties"), col("n2_ties"),
            expr("CAST(round((c_pairs - d_pairs) * 1e6 / " +
              "(sqrt(CAST(n0 - n1_ties AS DOUBLE)) * " +
              "sqrt(CAST(n0 - n2_ties AS DOUBLE)))) AS BIGINT)")
              .as("tau_b_ppm"))
      },
      Some("""WITH cells AS (
                SELECT CAST(l_quantity AS BIGINT) AS x,
                  CAST(l_linenumber AS BIGINT) AS y, count(*) AS cnt
                FROM lineitem GROUP BY 1, 2),
              cd AS (
                SELECT
                  CAST(sum(CASE WHEN a.y < b.y THEN a.cnt * b.cnt ELSE 0 END)
                    AS BIGINT) AS c_pairs,
                  CAST(sum(CASE WHEN a.y > b.y THEN a.cnt * b.cnt ELSE 0 END)
                    AS BIGINT) AS d_pairs
                FROM cells a JOIN cells b ON a.x < b.x),
              tx AS (
                SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n1_ties,
                  CAST(sum(t) AS BIGINT) AS n
                FROM (SELECT sum(cnt) AS t FROM cells GROUP BY x)),
              ty AS (
                SELECT CAST(sum(t * (t - 1) // 2) AS BIGINT) AS n2_ties
                FROM (SELECT sum(cnt) AS t FROM cells GROUP BY y))
              SELECT n, c_pairs, d_pairs,
                n * (n - 1) // 2 AS n0, n1_ties, n2_ties,
                CAST(round((c_pairs - d_pairs) * 1e6 /
                  (sqrt(CAST(n * (n - 1) // 2 - n1_ties AS DOUBLE)) *
                   sqrt(CAST(n * (n - 1) // 2 - n2_ties AS DOUBLE))))
                  AS BIGINT) AS tau_b_ppm
              FROM cd, tx, ty""")),

    // Cohen's kappa between the q169 lang-ID heuristic and the fixture
    // labels — chance-corrected agreement, the scalar the q169
    // confusion matrix feeds. Exact integers end to end: kappa_ppm =
    // (n·agree − Σ_k row_k·col_k)·1e6 div (n² − Σ_k row_k·col_k),
    // marginals full-outer-joined on the category union (a label the
    // classifier never predicts still counts in pe). n² · 1e6 caps the
    // exact form near n ≈ 3e6 docs; past that, divide shares first.
    QEntry("q291_cohens_kappa",
      (s, d) => {
        val ls = graft.pipeline.TextAnalysis.langScores(col("text"))
        val cells = Tables.documents(s, d)
          .select(col("lang").as("labeled"), ls.getField("pred").as("pred"))
          .groupBy(col("labeled"), col("pred"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // feeds n/agree + both marginals
        val tot = cells.agg(sum(col("cnt")).as("n"),
          sum(when(col("labeled") === col("pred"), col("cnt"))
            .otherwise(0L)).as("agree"))
        val rowM = cells.groupBy(col("labeled").as("cat"))
          .agg(sum(col("cnt")).as("r"))
        val colM = cells.groupBy(col("pred").as("cat"))
          .agg(sum(col("cnt")).as("c"))
        val pe = rowM.join(colM, Seq("cat"), "full_outer")
          .agg(sum(coalesce(col("r"), lit(0L)) * coalesce(col("c"), lit(0L)))
            .as("pe_num"))
        tot.crossJoin(broadcast(pe))
          .select(col("n"), col("agree"), col("pe_num"),
            expr("(n * agree - pe_num) * 1000000 div (n * n - pe_num)")
              .as("kappa_ppm"))
      },
      Some {
        def occ(m: String) =
          s"CAST((length(p) - length(replace(p, '$m', ''))) / ${m.length} AS INTEGER)"
        val en = s"${occ(" the ")} + ${occ(" and ")} + ${occ(" with ")}"
        val es = s"${occ(" el ")} + ${occ(" los ")} + ${occ(" con ")}"
        val de = s"${occ(" der ")} + ${occ(" und ")} + ${occ(" mit ")}"
        val fr = s"${occ(" le ")} + ${occ(" les ")} + ${occ(" avec ")}"
        s"""WITH padded AS (
              SELECT lang, concat(' ', lower(text), ' ') AS p
              FROM documents),
            pr AS (
              SELECT lang AS labeled,
                CASE WHEN $en >= $es AND $en >= $de AND $en >= $fr THEN 'en'
                     WHEN $es >= $de AND $es >= $fr THEN 'es'
                     WHEN $de >= $fr THEN 'de'
                     ELSE 'fr' END AS pred
              FROM padded),
            cells AS (
              SELECT labeled, pred, count(*) AS cnt FROM pr GROUP BY 1, 2),
            tot AS (
              SELECT CAST(sum(cnt) AS BIGINT) AS n,
                CAST(sum(CASE WHEN labeled = pred THEN cnt ELSE 0 END)
                  AS BIGINT) AS agree
              FROM cells),
            rm AS (SELECT labeled AS cat, sum(cnt) AS r FROM cells GROUP BY 1),
            cm AS (SELECT pred AS cat, sum(cnt) AS c FROM cells GROUP BY 1),
            pe AS (
              SELECT CAST(sum(coalesce(r, 0) * coalesce(c, 0)) AS BIGINT)
                AS pe_num
              FROM rm FULL OUTER JOIN cm USING (cat))
            SELECT n, agree, pe_num,
              CAST((n * agree - pe_num) * 1000000 // (n * n - pe_num)
                AS BIGINT) AS kappa_ppm
            FROM tot, pe"""
      }),

    // Chi-square independence of (event_type, day-of-week) + Cramér's
    // V — "does traffic mix shift by weekday", the categorical drift
    // test completing PSI (q184) and KS (q250). Exact integer cells
    // and marginals; expected counts held in CENTI-counts (E_c =
    // R·C·100 div N) so the per-cell term dev²  div E_c is an exact
    // integer in centi-chi2 units (doc'd bound: O·100 < ~3e9 keeps
    // dev² in int64 — fine past 1e7 events per cell); V takes the one
    // rounded sqrt. dow = epoch-day % 7 (label-free, engine-exact on
    // the int64-nanos ts).
    QEntry("q292_chi2_cramers_v",
      (s, d) => {
        val cells = Tables.events(s, d)
          .select(col("event_type"),
            expr("(ts div 86400000000000) % 7").as("dow"))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("o"))
          .localCheckpoint() // feeds marginals + the term sum
        val rowM = cells.groupBy(col("event_type"))
          .agg(sum(col("o")).as("r"))
        val colM = cells.groupBy(col("dow")).agg(sum(col("o")).as("c"))
        val tot = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("event_type")).as("nr"),
          countDistinct(col("dow")).as("nc"))
        val terms = cells
          .join(broadcast(rowM), "event_type")
          .join(broadcast(colM), "dow")
          .crossJoin(broadcast(tot))
          .select(
            // greatest(1,·) floors the centi-expected count (ADVICE
            // r12): a sparse cell with r*c*100 div n == 0 (rare type ×
            // rare dow in a huge corpus) would divide by zero → NULL,
            // which sum() silently drops, understating chi2. The floor
            // only binds when E < 0.01 — where the cell's true term is
            // dominated by dev² anyway — and is applied identically in
            // the oracle.
            expr("(o * 100 - (r * c * 100 div n)) * " +
              "(o * 100 - (r * c * 100 div n)) div " +
              "greatest(1L, r * c * 100 div n)")
              .as("term_centi"),
            col("n"), col("nr"), col("nc"))
        terms.groupBy(col("n"), col("nr"), col("nc"))
          .agg(sum(col("term_centi")).as("chi2_centi"),
            count(lit(1)).as("n_cells"))
          .select(col("n"), col("n_cells"),
            ((col("nr") - 1) * (col("nc") - 1)).as("dof"),
            col("chi2_centi"),
            expr("CAST(round(sqrt((chi2_centi / 100.0) / " +
              "(CAST(n AS DOUBLE) * least(nr - 1, nc - 1))) * 1e6) " +
              "AS BIGINT)").as("v_ppm"))
      },
      Some("""WITH cells AS (
                SELECT event_type,
                  (epoch_us(ts) // 86400000000) % 7 AS dow,
                  count(*) AS o
                FROM events GROUP BY 1, 2),
              rm AS (SELECT event_type, sum(o) AS r FROM cells GROUP BY 1),
              cm AS (SELECT dow, sum(o) AS c FROM cells GROUP BY 1),
              tot AS (
                SELECT CAST(sum(o) AS BIGINT) AS n,
                  count(DISTINCT event_type) AS nr,
                  count(DISTINCT dow) AS nc
                FROM cells),
              terms AS (
                SELECT
                  (o * 100 - (r * c * 100 // n)) *
                  (o * 100 - (r * c * 100 // n)) //
                    greatest(1, r * c * 100 // n)
                    AS term_centi,
                  n, nr, nc
                FROM cells
                JOIN rm USING (event_type) JOIN cm USING (dow), tot)
              SELECT n, count(*) AS n_cells,
                (nr - 1) * (nc - 1) AS dof,
                CAST(sum(term_centi) AS BIGINT) AS chi2_centi,
                CAST(round(sqrt((sum(term_centi) / 100.0) /
                  (CAST(n AS DOUBLE) * least(nr - 1, nc - 1))) * 1e6)
                  AS BIGINT) AS v_ppm
              FROM terms GROUP BY n, nr, nc"""))
  )
}
