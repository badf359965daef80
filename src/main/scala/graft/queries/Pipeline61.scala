package graft.queries

import org.apache.spark.sql.functions._

/** Round-13 pack, ninth batch — annotation governance and mixture
  * planning: Krippendorff's alpha (the multi-annotator generalization of
  * q291's two-rater kappa), the int8 embedding-quantization planner, and
  * iterative proportional fitting (raking) of the (source, lang) mixture.
  */
object Pipeline61 {

  val entries: Seq[QEntry] = Seq(

    // Krippendorff's alpha (nominal) over a deterministic 3-annotator
    // panel: annotator 1 is faithful, annotators 2/3 flip the base
    // class (n_chars mod 4) on 10%/20% md5-coin draws to a different
    // class. m_u = 3 for every unit, so the per-unit pair weight
    // 1/(m_u−1) = 1/2 is a GLOBAL factor and the coincidence matrix
    // stays integral doubled: o2[c,c'] = Σ_u ordered same/cross pairs.
    // Per-unit pair counting runs at (doc, class) grain (≤4 rows/doc —
    // a bounded self-join, never row-pairs). alpha = 1 − (N−1)·D_o/D_e
    // with D_o = Σ_{c≠c'} o[c,c'], D_e = Σ_{c≠c'} n_c·n_{c'}; n_c·n_{c'}
    // crosses int64 past n_c ≈ 3e9 judgments, so D_e accumulates in
    // decimal(38,0) (q289 discipline) — exact past 1e12 docs.
    QEntry("q347_krippendorff_alpha",
      (s, d) => {
        val labels = Tables.documents(s, d)
          .select(col("doc_id"), pmod(col("n_chars"), lit(4L)).as("base"))
          .select(col("doc_id"), col("base"),
            explode(array(lit(1L), lit(2L), lit(3L))).as("ann"))
          .select(col("doc_id"), col("ann"),
            expr("CAST(conv(substring(md5(concat('ann', " +
              "CAST(ann AS STRING), ':', CAST(doc_id AS STRING))), " +
              "1, 6), 16, 10) AS BIGINT) % 1000000").as("u"),
            col("base"))
          .withColumn("p_ppm",
            expr("CASE ann WHEN 1 THEN 0L WHEN 2 THEN 100000L " +
              "ELSE 200000L END"))
          .select(col("doc_id"),
            when(col("u") < col("p_ppm"),
              pmod(col("base") + 1L + pmod(col("u"), lit(3L)), lit(4L)))
              .otherwise(col("base")).as("lbl"))
          .localCheckpoint() // feeds unit counts + class marginals
        val unitCnt = labels.groupBy(col("doc_id"), col("lbl"))
          .agg(count(lit(1)).as("m"))
          .localCheckpoint() // ≤ 4 rows per doc by construction
        // doubled coincidence matrix: within-doc ordered pairs
        val o2 = unitCnt.select(col("doc_id"), col("lbl").as("c1"),
            col("m").as("m1"))
          .join(unitCnt.select(col("doc_id"), col("lbl").as("c2"),
            col("m").as("m2")), Seq("doc_id"))
          .select(col("c1"), col("c2"),
            when(col("c1") === col("c2"), col("m1") * (col("m1") - 1L))
              .otherwise(col("m1") * col("m2")).as("pairs"))
          .groupBy(col("c1"), col("c2")).agg(sum(col("pairs")).as("o2"))
        // densify over the 4x4 class grid so zero cells are explicit
        val grid = s.range(0, 4).select(col("id").as("c1"))
          .crossJoin(s.range(0, 4).select(col("id").as("c2")))
        val cells = broadcast(grid).join(o2, Seq("c1", "c2"), "left")
          .select(col("c1"), col("c2"),
            coalesce(col("o2"), lit(0L)).as("o2"))
          .localCheckpoint() // 16 rows
        val marg = labels.groupBy(col("lbl"))
          .agg(count(lit(1)).as("n_c"))
        val margFull = broadcast(s.range(0, 4).select(col("id").as("lbl")))
          .join(marg, Seq("lbl"), "left")
          .select(col("lbl"), coalesce(col("n_c"), lit(0L)).as("n_c"))
          .localCheckpoint() // 4 rows
        val scalars = cells
          .agg(sum(when(col("c1") =!= col("c2"), col("o2"))
            .otherwise(0L)).as("d_o2"))
          .crossJoin(broadcast(margFull
            .select(col("n_c").cast("decimal(19,0)").as("nd"))
            .agg(sum(col("nd") * col("nd")).as("ss"),
              sum(col("nd")).cast("decimal(19,0)").as("n_total"))))
          .select(col("d_o2"), col("n_total").cast("long").as("n_judge"),
            (col("n_total") * col("n_total") - col("ss")).as("d_e"))
          .select(col("n_judge"),
            (lit(1000000L) -
              expr("CAST((CAST(n_judge AS DECIMAL(38,0)) - 1) * " +
                "CAST(d_o2 AS DECIMAL(38,0)) * 1000000 div " +
                "(2 * d_e) AS BIGINT)")).as("alpha_ppm"))
        cells.join(broadcast(margFull),
            cells("c1") === margFull("lbl"))
          .select(col("c1"), col("c2"), col("o2"), col("n_c"))
          .crossJoin(broadcast(scalars))
          .select(col("c1"), col("c2"), col("o2"), col("n_c"),
            col("n_judge"), col("alpha_ppm"))
          .orderBy(col("c1"), col("c2"))
      },
      Some("""WITH labels AS (
                SELECT doc_id,
                  CASE WHEN u < p_ppm
                    THEN (base + 1 + (u % 3)) % 4 ELSE base END AS lbl
                FROM (
                  SELECT doc_id, ann,
                    ('0x' || substr(md5('ann' || CAST(ann AS VARCHAR)
                      || ':' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                      % 1000000 AS u,
                    n_chars % 4 AS base,
                    CASE ann WHEN 1 THEN 0 WHEN 2 THEN 100000
                      ELSE 200000 END AS p_ppm
                  FROM documents,
                    (SELECT unnest([1, 2, 3]) AS ann) a)),
              uc AS (
                SELECT doc_id, lbl, count(*) AS m
                FROM labels GROUP BY doc_id, lbl),
              o2 AS (
                SELECT a.lbl AS c1, b.lbl AS c2,
                  sum(CASE WHEN a.lbl = b.lbl THEN a.m * (a.m - 1)
                    ELSE a.m * b.m END) AS o2
                FROM uc a JOIN uc b USING (doc_id)
                GROUP BY a.lbl, b.lbl),
              grid AS (
                SELECT g1.c1, g2.c2
                FROM (SELECT unnest(range(4)) AS c1) g1,
                  (SELECT unnest(range(4)) AS c2) g2),
              cells AS (
                SELECT g.c1, g.c2, coalesce(o2.o2, 0) AS o2
                FROM grid g LEFT JOIN o2
                  ON o2.c1 = g.c1 AND o2.c2 = g.c2),
              marg AS (
                SELECT m.lbl, coalesce(x.n_c, 0) AS n_c
                FROM (SELECT unnest(range(4)) AS lbl) m
                LEFT JOIN (SELECT lbl, count(*) AS n_c
                  FROM labels GROUP BY lbl) x USING (lbl)),
              sc AS (
                SELECT
                  (SELECT sum(CASE WHEN c1 <> c2 THEN o2 ELSE 0 END)
                     FROM cells) AS d_o2,
                  (SELECT sum(n_c) FROM marg) AS n_judge,
                  (SELECT sum(a.n_c * b.n_c) FROM marg a, marg b
                     WHERE a.lbl <> b.lbl) AS d_e)
              SELECT CAST(c.c1 AS BIGINT) AS c1,
                CAST(c.c2 AS BIGINT) AS c2,
                CAST(c.o2 AS BIGINT) AS o2,
                CAST(m.n_c AS BIGINT) AS n_c,
                CAST(sc.n_judge AS BIGINT) AS n_judge,
                CAST(1000000 - (sc.n_judge - 1) * sc.d_o2 * 1000000
                  // (2 * sc.d_e) AS BIGINT) AS alpha_ppm
              FROM cells c JOIN marg m ON m.lbl = c.c1, sc
              ORDER BY c.c1, c.c2""")),

    // int8 affine-quantization planner for the embedding column: per
    // dimension min/max on the 1e4-quantized int64 grid (first scan,
    // 64-cell map-side-combined agg), then the asymmetric-affine round
    // trip q = (v−min)·255 div range, v̂ = min + q·range div 255
    // audited per dimension (second scan joined to the broadcast
    // 64-row stats): max |v−v̂| and the mean error in milli grid units.
    // The readout a serving stack needs before committing to int8
    // storage — which dimensions clip hardest and what error a 255-step
    // grid costs. All integer; (v−min)·255 ≤ 4e4·255 — no overflow.
    QEntry("q348_int8_quant_planner",
      (s, d) => {
        val q = Tables.embeddings(s, d)
          .select(posexplode(
            graft.pipeline.Similarity.quantize(col("embedding"))))
          .select(col("pos").cast("long").as("dim"), col("col").as("v"))
        val stats = q.groupBy(col("dim"))
          .agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
          .withColumn("range_q",
            greatest(lit(1L), col("vmax") - col("vmin")))
          .localCheckpoint() // 64 rows
        q.join(broadcast(stats), Seq("dim"))
          .withColumn("code",
            expr("(v - vmin) * 255 div range_q"))
          .withColumn("err",
            abs(col("v") - (col("vmin") +
              expr("code * range_q div 255"))))
          .groupBy(col("dim"))
          .agg(min(col("vmin")).as("vmin"), min(col("vmax")).as("vmax"),
            min(col("range_q")).as("range_q"),
            max(col("err")).as("max_err_q"),
            expr("sum(err) * 1000 div count(1)").as("mean_err_milli"))
          .orderBy(col("dim"))
      },
      Some("""WITH q AS (
                SELECT CAST(t.i AS BIGINT) AS dim,
                  CAST(round(CAST(embedding[t.i + 1] AS DOUBLE)
                    * 10000.0) AS BIGINT) AS v
                FROM embeddings, (SELECT unnest(range(64)) AS i) t),
              st AS (
                SELECT dim, min(v) AS vmin, max(v) AS vmax,
                  greatest(1, max(v) - min(v)) AS range_q
                FROM q GROUP BY dim),
              e AS (
                SELECT q.dim, st.vmin, st.vmax, st.range_q,
                  abs(q.v - (st.vmin +
                    ((q.v - st.vmin) * 255 // st.range_q)
                      * st.range_q // 255)) AS err
                FROM q JOIN st USING (dim))
              SELECT dim, CAST(min(vmin) AS BIGINT) AS vmin,
                CAST(min(vmax) AS BIGINT) AS vmax,
                CAST(min(range_q) AS BIGINT) AS range_q,
                CAST(max(err) AS BIGINT) AS max_err_q,
                CAST(sum(err) * 1000 // count(*) AS BIGINT)
                  AS mean_err_milli
              FROM e GROUP BY dim
              ORDER BY dim""")),

    // Iterative proportional fitting (raking) of the (source, lang)
    // mixture: start from observed cell shares in ppm, rake 3 rounds
    // toward a UNIFORM source marginal while preserving the observed
    // lang marginal — the "balance sources, keep languages" reweighting
    // planner. One corpus groupBy to the ≤|src|×|lang| cell dimension;
    // every iteration is dim-grain (marginal sums + a join), cost
    // independent of corpus size. Integer ppm with truncating division
    // throughout — bit-replayable; factor_ppm is the per-cell up/down-
    // sample the sampler applies.
    QEntry("q349_ipf_raking",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .groupBy(col("source"), col("lang"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint() // bounded: sources x langs
        val tot = cells.agg(sum(col("n")).as("nt"),
          countDistinct(col("source")).as("n_src"))
        val langT = cells.groupBy(col("lang"))
          .agg(sum(col("n")).as("lang_n"))
        val base = cells.crossJoin(broadcast(tot))
          .join(broadcast(langT), Seq("lang"))
          .select(col("source"), col("lang"), col("n"),
            expr("n * 1000000 div nt").as("w0"),
            expr("1000000 div n_src").as("src_t"),
            expr("lang_n * 1000000 div nt").as("lang_t"))
          .localCheckpoint()
        var w = base.withColumn("w", col("w0"))
        for (_ <- 1 to 3) {
          val ss = w.groupBy(col("source")).agg(sum(col("w")).as("ssum"))
          w = w.join(broadcast(ss), Seq("source"))
            .withColumn("w",
              expr("w * src_t div greatest(1L, ssum)"))
            .drop("ssum")
          val ls = w.groupBy(col("lang")).agg(sum(col("w")).as("lsum"))
          w = w.join(broadcast(ls), Seq("lang"))
            .withColumn("w",
              expr("w * lang_t div greatest(1L, lsum)"))
            .drop("lsum")
        }
        w.select(col("source"), col("lang"), col("n"), col("w0"),
            col("w").as("w3"),
            expr("w * 1000000 div greatest(1L, w0)").as("factor_ppm"))
          .orderBy(col("source"), col("lang"))
      },
      Some("""WITH cells AS (
                SELECT source, lang, count(*) AS n
                FROM documents GROUP BY source, lang),
              tot AS (
                SELECT sum(n) AS nt, count(DISTINCT source) AS n_src
                FROM cells),
              langt AS (
                SELECT lang, sum(n) AS lang_n FROM cells GROUP BY lang),
              base AS (
                SELECT c.source, c.lang, c.n,
                  c.n * 1000000 // t.nt AS w0,
                  1000000 // t.n_src AS src_t,
                  l.lang_n * 1000000 // t.nt AS lang_t
                FROM cells c, tot t JOIN langt l ON l.lang = c.lang),
              r1a AS (
                SELECT b.*, b.w0 * b.src_t // greatest(1,
                  sum(b.w0) OVER (PARTITION BY b.source)) AS w
                FROM base b),
              r1b AS (
                SELECT r.*, r.w * r.lang_t // greatest(1,
                  sum(r.w) OVER (PARTITION BY r.lang)) AS w2
                FROM r1a r),
              r2a AS (
                SELECT r.*, r.w2 * r.src_t // greatest(1,
                  sum(r.w2) OVER (PARTITION BY r.source)) AS w3a
                FROM r1b r),
              r2b AS (
                SELECT r.*, r.w3a * r.lang_t // greatest(1,
                  sum(r.w3a) OVER (PARTITION BY r.lang)) AS w4
                FROM r2a r),
              r3a AS (
                SELECT r.*, r.w4 * r.src_t // greatest(1,
                  sum(r.w4) OVER (PARTITION BY r.source)) AS w5
                FROM r2b r),
              r3b AS (
                SELECT r.*, r.w5 * r.lang_t // greatest(1,
                  sum(r.w5) OVER (PARTITION BY r.lang)) AS w6
                FROM r3a r)
              SELECT source, lang, CAST(n AS BIGINT) AS n,
                CAST(w0 AS BIGINT) AS w0, CAST(w6 AS BIGINT) AS w3,
                CAST(w6 * 1000000 // greatest(1, w0) AS BIGINT)
                  AS factor_ppm
              FROM r3b
              ORDER BY source, lang"""))
  )
}
