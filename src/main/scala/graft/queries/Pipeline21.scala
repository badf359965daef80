package graft.queries

import org.apache.spark.sql.functions._

/** Round-10 session-4, first pack: the remaining sketch (Count–Min),
  * label-QA agreement (Cohen's kappa), preference fitting
  * (Bradley–Terry via the MM algorithm, all-integer fixed point), and
  * the bounded symmetric divergence (Jensen–Shannon) that completes
  * the KL (q127) / PSI (q184) drift family. Conventions unchanged:
  * integer fixed-point across every aggregation boundary, md5-derived
  * hashing replayed bit-for-bit by the DuckDB oracle, totally ordered
  * output on a unique key.
  */
object Pipeline21 {

  val entries: Seq[QEntry] = Seq(

    // Count–Min sketch token-frequency estimation, evaluated against
    // exact counts. d=4 rows x w=16 buckets (deliberately narrow so the
    // fixture vocabulary collides and the one-sided overestimate is
    // visible). The sketch completes the suite's sketch family: KMV
    // (distinct, q181), Misra–Gries (heavy hitters, q63), HLL (q65) —
    // CMS is the point-frequency member. Scale shape: the sketch is a
    // FIXED d·w-cell frame built by one keyed agg over the (distinct
    // token, count) table — cells merge by addition, so partial
    // aggregation, cross-partition merge, and streaming accumulation
    // are all the same cellwise sum; the probe is a dimension-sized
    // join (distinct tokens x d), never a corpus rescan.
    QEntry("q231_countmin_freq",
      (s, d) => {
        val exact = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy(col("tok")).agg(count(lit(1)).as("exact_cnt"))
          .localCheckpoint() // feeds sketch build AND probe AND report
        val keyed = exact
          .select(col("tok"), col("exact_cnt"),
            explode(sequence(lit(0), lit(3))).as("r"))
          .withColumn("b",
            conv(substring(md5(concat(col("tok"), lit(":"), col("r"))),
              1, 8), 16, 10).cast("long") % 16)
        val cells = keyed.groupBy(col("r"), col("b"))
          .agg(sum(col("exact_cnt")).as("cell"))
        val est = keyed.join(cells, Seq("r", "b"))
          .groupBy(col("tok")).agg(min(col("cell")).as("est_cnt"))
        exact.join(est, "tok")
          .select(col("tok"), col("exact_cnt"), col("est_cnt"),
            expr("((est_cnt - exact_cnt) * 10000) div exact_cnt")
              .as("over_bp"))
          .orderBy(col("exact_cnt").desc, col("tok"))
          .limit(15)
      },
      Some("""WITH exact AS (
                SELECT tok, count(*) AS exact_cnt FROM (
                  SELECT unnest(string_split_regex(lower(text), '\s+'))
                    AS tok
                  FROM documents) t
                WHERE len(tok) > 0 GROUP BY tok),
              keyed AS (
                SELECT tok, exact_cnt, r,
                  ('0x' || substr(md5(tok || ':' || CAST(r AS VARCHAR)),
                    1, 8))::BIGINT % 16 AS b
                FROM exact, range(4) u(r)),
              cells AS (
                SELECT r, b, sum(exact_cnt) AS cell
                FROM keyed GROUP BY r, b),
              est AS (
                SELECT k.tok, min(c.cell) AS est_cnt
                FROM keyed k JOIN cells c ON c.r = k.r AND c.b = k.b
                GROUP BY k.tok)
              SELECT e.tok, e.exact_cnt, CAST(est.est_cnt AS BIGINT)
                  AS est_cnt,
                CAST(((est.est_cnt - e.exact_cnt) * 10000) // e.exact_cnt
                  AS BIGINT) AS over_bp
              FROM exact e JOIN est ON est.tok = e.tok
              ORDER BY e.exact_cnt DESC, e.tok LIMIT 15""")),

    // Inter-annotator agreement (Cohen's kappa) — the label-QA gate a
    // training-data pipeline runs before trusting human or model
    // labels. Two deterministic pseudo-annotators read a 4-class gold
    // label (length bucket) through distinct md5-derived noise channels
    // (A flips +1 on 1/10 of docs, B flips +2 on 1/7); the report is
    // the observed agreement, the chance agreement from the marginals,
    // and kappa, all in ppm with integer div so both engines carry the
    // same integers. One corpus projection, one 16-cell agg.
    QEntry("q232_annotator_kappa",
      (s, d) => {
        val labeled = Tables.documents(s, d)
          .select(col("doc_id"),
            least(lit(3L), expr("n_chars div 150")).as("y"))
          .withColumn("ya", expr(
            "CASE WHEN CAST(conv(substring(md5(concat(CAST(doc_id AS " +
              "STRING), ':a')), 1, 8), 16, 10) AS BIGINT) % 10 = 0 " +
              "THEN (y + 1) % 4 ELSE y END"))
          .withColumn("yb", expr(
            "CASE WHEN CAST(conv(substring(md5(concat(CAST(doc_id AS " +
              "STRING), ':b')), 1, 8), 16, 10) AS BIGINT) % 7 = 0 " +
              "THEN (y + 2) % 4 ELSE y END"))
        val conf = labeled.groupBy(col("ya"), col("yb"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // feeds marginals + agreement + n
        val ma = conf.groupBy(col("ya")).agg(sum(col("c")).as("na"))
        val mb = conf.groupBy(col("yb")).agg(sum(col("c")).as("nb"))
        val n = conf.agg(sum(col("c")).as("n"))
        val agree = conf.filter(col("ya") === col("yb"))
          .agg(coalesce(sum(col("c")), lit(0L)).as("agree"))
        val chance = ma.join(mb, col("ya") === col("yb"))
          .agg(sum(col("na") * col("nb")).as("sum_ab"))
        agree.crossJoin(chance).crossJoin(n)
          .select(col("n"), col("agree"),
            expr("(agree * 1000000) div n").as("po_ppm"),
            expr("(sum_ab * 1000000) div (n * n)").as("pe_ppm"))
          .select(col("n"), col("agree"), col("po_ppm"), col("pe_ppm"),
            expr("((po_ppm - pe_ppm) * 1000000) div (1000000 - pe_ppm)")
              .as("kappa_ppm"))
      },
      Some("""WITH l AS (
                SELECT doc_id, least(3, n_chars // 150) AS y
                FROM documents),
              ann AS (
                SELECT doc_id,
                  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || ':a'), 1, 8))::BIGINT % 10 = 0
                    THEN (y + 1) % 4 ELSE y END AS ya,
                  CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                    || ':b'), 1, 8))::BIGINT % 7 = 0
                    THEN (y + 2) % 4 ELSE y END AS yb
                FROM l),
              conf AS (
                SELECT ya, yb, count(*) AS c FROM ann GROUP BY 1, 2),
              ma AS (SELECT ya, sum(c) AS na FROM conf GROUP BY ya),
              mb AS (SELECT yb, sum(c) AS nb FROM conf GROUP BY yb),
              tot AS (SELECT sum(c) AS n FROM conf),
              agr AS (
                SELECT coalesce(sum(c), 0) AS agree
                FROM conf WHERE ya = yb),
              ch AS (
                SELECT sum(na * nb) AS sum_ab
                FROM ma JOIN mb ON mb.yb = ma.ya),
              base AS (
                SELECT n, agree,
                  (agree * 1000000) // n AS po_ppm,
                  (sum_ab * 1000000) // (n * n) AS pe_ppm
                FROM agr, ch, tot)
              SELECT CAST(n AS BIGINT) AS n, CAST(agree AS BIGINT)
                  AS agree,
                CAST(po_ppm AS BIGINT) AS po_ppm,
                CAST(pe_ppm AS BIGINT) AS pe_ppm,
                CAST(((po_ppm - pe_ppm) * 1000000) //
                  (1000000 - pe_ppm) AS BIGINT) AS kappa_ppm
              FROM base""")),

    // Bradley–Terry preference strengths via 3 MM iterations
    // (Hunter 2004), ALL-INTEGER fixed point: strengths live in micro
    // units, each per-opponent MM term is one integer div, the
    // denominator is an integer sum (order-independent — no double ever
    // crosses an aggregation), and the update is one more integer div.
    // Games: each consecutive doc-id pair is a "duel" won by the longer
    // doc (tie → lower id), charged to the docs' sources; +1 pseudo-game
    // per direction per source pair keeps the comparison graph strongly
    // connected (the standard BT regularizer). Scale shape: the corpus
    // pass reduces to a 20x20 wins matrix; every MM iteration is
    // dimension-sized joins on that matrix — iteration cost is
    // independent of corpus size.
    QEntry("q233_bradley_terry",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
        val duels = docs.alias("a")
          .join(docs.alias("b"),
            col("b.doc_id") === col("a.doc_id") + 1)
          .select(
            when(col("a.n_chars") >= col("b.n_chars"),
              col("a.source")).otherwise(col("b.source")).as("w"),
            when(col("a.n_chars") >= col("b.n_chars"),
              col("b.source")).otherwise(col("a.source")).as("l"))
          .filter(col("w") =!= col("l"))
        val srcs = docs.select(col("source")).distinct()
        val pseudo = srcs.select(col("source").as("w"))
          .crossJoin(srcs.select(col("source").as("l")))
          .filter(col("w") =!= col("l"))
        val wins = duels.unionByName(pseudo)
          .groupBy(col("w"), col("l")).agg(count(lit(1)).as("n"))
          .localCheckpoint() // the whole corpus reduced to a 20x20 dim
        val games = wins
          .select(col("w").as("i"), col("l").as("j"), col("n"))
          .unionByName(
            wins.select(col("l").as("i"), col("w").as("j"), col("n")))
          .groupBy(col("i"), col("j")).agg(sum(col("n")).as("g"))
        val totW = wins.groupBy(col("w")).agg(sum(col("n")).as("wins"))
          .select(col("w").as("i"), col("wins"))
        var p = srcs.select(col("source").as("i"),
          lit(1000000L).as("p"))
        for (_ <- 1 to 3) {
          val pj = p.select(col("i").as("j"), col("p").as("pj"))
          val denom = games.join(p, "i").join(pj, "j")
            .select(col("i"),
              expr("(g * 1000000000000) div (p + pj)").as("term"))
            .groupBy(col("i")).agg(sum(col("term")).as("den"))
          p = totW.join(denom, "i")
            .select(col("i"),
              expr("(wins * 1000000000000) div den").as("p"))
        }
        val tot = p.agg(sum(col("p")).as("tp"))
        p.crossJoin(broadcast(tot))
          .join(totW, "i")
          .select(col("i").as("source"), col("wins"),
            expr("(p * 1000000) div tp").as("strength_ppm"))
          .orderBy(col("strength_ppm").desc, col("source"))
      },
      Some("""WITH docs AS (
                SELECT doc_id, source, n_chars FROM documents),
              duels AS (
                SELECT
                  CASE WHEN a.n_chars >= b.n_chars THEN a.source
                    ELSE b.source END AS w,
                  CASE WHEN a.n_chars >= b.n_chars THEN b.source
                    ELSE a.source END AS l
                FROM docs a JOIN docs b ON b.doc_id = a.doc_id + 1),
              duels2 AS (SELECT w, l FROM duels WHERE w <> l),
              srcs AS (SELECT DISTINCT source FROM docs),
              pseudo AS (
                SELECT a.source AS w, b.source AS l
                FROM srcs a, srcs b WHERE a.source <> b.source),
              wins AS (
                SELECT w, l, count(*) AS n FROM (
                  SELECT * FROM duels2
                  UNION ALL SELECT * FROM pseudo) GROUP BY w, l),
              games AS (
                SELECT i, j, sum(n) AS g FROM (
                  SELECT w AS i, l AS j, n FROM wins
                  UNION ALL SELECT l, w, n FROM wins) GROUP BY i, j),
              totw AS (SELECT w AS i, sum(n) AS wins FROM wins
                GROUP BY w),
              p0 AS (SELECT source AS i, 1000000::BIGINT AS p FROM srcs),
              d1 AS (
                SELECT g.i,
                  sum((g.g * 1000000000000) // (pi.p + pj.p)) AS den
                FROM games g JOIN p0 pi ON pi.i = g.i
                JOIN p0 pj ON pj.i = g.j GROUP BY g.i),
              p1 AS (
                SELECT t.i, (t.wins * 1000000000000) // d1.den AS p
                FROM totw t JOIN d1 ON d1.i = t.i),
              d2 AS (
                SELECT g.i,
                  sum((g.g * 1000000000000) // (pi.p + pj.p)) AS den
                FROM games g JOIN p1 pi ON pi.i = g.i
                JOIN p1 pj ON pj.i = g.j GROUP BY g.i),
              p2 AS (
                SELECT t.i, (t.wins * 1000000000000) // d2.den AS p
                FROM totw t JOIN d2 ON d2.i = t.i),
              d3 AS (
                SELECT g.i,
                  sum((g.g * 1000000000000) // (pi.p + pj.p)) AS den
                FROM games g JOIN p2 pi ON pi.i = g.i
                JOIN p2 pj ON pj.i = g.j GROUP BY g.i),
              p3 AS (
                SELECT t.i, (t.wins * 1000000000000) // d3.den AS p
                FROM totw t JOIN d3 ON d3.i = t.i),
              tot AS (SELECT sum(p) AS tp FROM p3)
              SELECT p3.i AS source, CAST(totw.wins AS BIGINT) AS wins,
                CAST((p3.p * 1000000) // tot.tp AS BIGINT)
                  AS strength_ppm
              FROM p3 JOIN totw ON totw.i = p3.i CROSS JOIN tot
              ORDER BY strength_ppm DESC, source""")),

    // Jensen–Shannon divergence matrix between per-source unigram
    // distributions — the bounded symmetric member of the drift family
    // (KL q127 is asymmetric and unbounded on disjoint support; PSI
    // q184 needs binning). Micro-nat discipline (q228): each token's
    // log-ratio ln(p/m) is rounded to integer micro-nats from exact
    // integer count ratios (p/m = 2·c_a·N_b / (c_a·N_b + c_b·N_a)),
    // the count-weighted sums are integer and order-independent, and
    // JSD_unats = sum_a div 2N_a + sum_b div 2N_b. Scale shape: one
    // corpus pass to (source, token) counts; the pair matrix is
    // dimension-sized (sources² · shared vocab), never corpus-sized.
    QEntry("q234_jsd_sources",
      (s, d) => {
        val cnt = Tables.documents(s, d)
          .select(col("source"),
            explode(split(lower(col("text")), "\\s+")).as("tok"))
          .filter(length(col("tok")) > 0)
          .groupBy(col("source"), col("tok"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // corpus reduced to the (source, tok) dim
        val totals = cnt.groupBy(col("source"))
          .agg(sum(col("c")).as("n"))
        val a = cnt.join(totals, "source")
          .select(col("source").as("sa"), col("tok"),
            col("c").as("ca"), col("n").as("na"))
        val b = cnt.join(totals, "source")
          .select(col("source").as("sb"), col("tok"),
            col("c").as("cb"), col("n").as("nb"))
        val joined = a.join(b, Seq("tok"), "inner")
          .filter(col("sa") < col("sb"))
        // full-outer support handling: tokens absent on one side enter
        // the OTHER side's mixture term via c=0 — emulate with two
        // one-sided anti contributions plus the shared part.
        val shared = joined.select(col("sa"), col("sb"),
          expr("ca * CAST(round(ln(2.0 * ca * nb / " +
            "(CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)) * 1e6) " +
            "AS BIGINT)").as("ta"),
          expr("cb * CAST(round(ln(2.0 * cb * na / " +
            "(CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na)) * 1e6) " +
            "AS BIGINT)").as("tb"))
        val sharedAgg = shared.groupBy(col("sa"), col("sb"))
          .agg(sum(col("ta")).as("suma"), sum(col("tb")).as("sumb"))
        // tokens only in a (vs b): p/m = 2 exactly -> ln2 micro-nats
        val ln2 = 693147L
        val pairsAll = a.select(col("sa")).distinct()
          .crossJoin(b.select(col("sb")).distinct())
          .filter(col("sa") < col("sb"))
        val exclA = a.crossJoin(b.select(col("sb")).distinct())
          .filter(col("sa") < col("sb"))
          .join(b.select(col("sb"), col("tok"), col("cb")),
            Seq("sb", "tok"), "left_anti")
          .groupBy(col("sa"), col("sb"))
          .agg(sum(col("ca") * ln2).as("xa"))
        val exclB = b.crossJoin(a.select(col("sa")).distinct())
          .filter(col("sa") < col("sb"))
          .join(a.select(col("sa"), col("tok"), col("ca")),
            Seq("sa", "tok"), "left_anti")
          .groupBy(col("sa"), col("sb"))
          .agg(sum(col("cb") * ln2).as("xb"))
        val na2 = totals.select(col("source").as("sa"),
          col("n").as("na"))
        val nb2 = totals.select(col("source").as("sb"),
          col("n").as("nb"))
        pairsAll
          .join(sharedAgg, Seq("sa", "sb"), "left")
          .join(exclA, Seq("sa", "sb"), "left")
          .join(exclB, Seq("sa", "sb"), "left")
          .join(na2, "sa").join(nb2, "sb")
          .select(col("sa"), col("sb"),
            // per-side sums are N*KL(P||M) >= 0 mathematically; clamp
            // so micro-nat rounding noise can't go negative and split
            // the engines on floor-vs-truncate integer division.
            expr("greatest(0L, coalesce(suma, 0) + coalesce(xa, 0)) " +
              "div (2 * na) + " +
              "greatest(0L, coalesce(sumb, 0) + coalesce(xb, 0)) " +
              "div (2 * nb)").as("jsd_unats"))
          .orderBy(col("jsd_unats").desc, col("sa"), col("sb"))
          .limit(30)
      },
      Some("""WITH cnt AS (
                SELECT source, tok, count(*) AS c FROM (
                  SELECT source,
                    unnest(string_split_regex(lower(text), '\s+')) AS tok
                  FROM documents) t
                WHERE len(tok) > 0 GROUP BY source, tok),
              totals AS (
                SELECT source, sum(c) AS n FROM cnt GROUP BY source),
              a AS (
                SELECT c.source AS sa, c.tok, c.c AS ca, t.n AS na
                FROM cnt c JOIN totals t ON t.source = c.source),
              b AS (
                SELECT c.source AS sb, c.tok, c.c AS cb, t.n AS nb
                FROM cnt c JOIN totals t ON t.source = c.source),
              shared AS (
                SELECT sa, sb,
                  sum(ca * CAST(round(ln(2.0 * ca * nb /
                    (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na))
                    * 1e6) AS BIGINT)) AS suma,
                  sum(cb * CAST(round(ln(2.0 * cb * na /
                    (CAST(ca AS DOUBLE) * nb + CAST(cb AS DOUBLE) * na))
                    * 1e6) AS BIGINT)) AS sumb
                FROM a JOIN b USING (tok) WHERE sa < sb
                GROUP BY sa, sb),
              pairs AS (
                SELECT DISTINCT a.sa, b.sb
                FROM (SELECT DISTINCT sa FROM a) a,
                     (SELECT DISTINCT sb FROM b) b
                WHERE a.sa < b.sb),
              excla AS (
                SELECT a.sa, p.sb, sum(a.ca * 693147) AS xa
                FROM a JOIN pairs p ON p.sa = a.sa
                WHERE NOT EXISTS (SELECT 1 FROM b
                  WHERE b.sb = p.sb AND b.tok = a.tok)
                GROUP BY a.sa, p.sb),
              exclb AS (
                SELECT p.sa, b.sb, sum(b.cb * 693147) AS xb
                FROM b JOIN pairs p ON p.sb = b.sb
                WHERE NOT EXISTS (SELECT 1 FROM a
                  WHERE a.sa = p.sa AND a.tok = b.tok)
                GROUP BY p.sa, b.sb)
              SELECT p.sa, p.sb,
                CAST(greatest(0, coalesce(s.suma, 0) +
                    coalesce(ea.xa, 0)) // (2 * ta.n) +
                  greatest(0, coalesce(s.sumb, 0) +
                    coalesce(eb.xb, 0)) // (2 * tb.n) AS BIGINT)
                  AS jsd_unats
              FROM pairs p
              LEFT JOIN shared s ON s.sa = p.sa AND s.sb = p.sb
              LEFT JOIN excla ea ON ea.sa = p.sa AND ea.sb = p.sb
              LEFT JOIN exclb eb ON eb.sa = p.sa AND eb.sb = p.sb
              JOIN totals ta ON ta.source = p.sa
              JOIN totals tb ON tb.source = p.sb
              ORDER BY jsd_unats DESC, p.sa, p.sb LIMIT 30"""))
  )
}
