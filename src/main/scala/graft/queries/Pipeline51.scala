package graft.queries

import org.apache.spark.sql.functions._

import graft.expressions.JaroWinkler

/** Round-12 pack, fifteenth batch — probabilistic record linkage:
  * Fellegi–Sunter agreement weights estimated from labeled pairs (the
  * planted-typo truth as matches, adjacent-key controls as
  * non-matches), in exact integer ratios. Completes the linkage
  * toolkit: q321 blocks, q322 keys phonetically, q318 scores, q329
  * weighs the evidence, q192 resolves.
  */
object Pipeline51 {

  val entries: Seq[QEntry] = Seq(

    // Fellegi–Sunter m/u estimation: labeled pairs from the q318
    // construction (planted single-deletion typos = matches;
    // adjacent-key controls = non-matches), three comparison features:
    //   jw_hi   — Jaro–Winkler ≥ 0.95 (the q318 scorer)
    //   sdx_eq  — q322's simplified Soundex agrees on the head word
    //   len_eq  — byte lengths agree (deletions shift length; digit
    //             substitutions don't)
    // Per feature: m = P(agree | match), u = P(agree | non-match) in
    // ppm, and the evidence ratio m_ppm·1e6 div u_ppm (the log-weight's
    // integer-ratio form — no libm, so no cross-engine ln parity risk;
    // u = 0 reports ratio against a 1-ppm floor). The table a linkage
    // run reads to turn feature agreements into match scores.
    QEntry("q329_fellegi_sunter",
      (s, d) => {
        val cust = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_name"))
          .localCheckpoint() // three self-referencing pair constructions
        val p = (expr("c_custkey div 10") % length(col("c_name"))).cast("int")
        val typo = concat(col("c_name").substr(lit(1), p),
          col("c_name").substr(p + 2, length(col("c_name"))))
        val planted = cust.filter(col("c_custkey") % 10 === 0)
          .select(col("c_custkey"), col("c_name").as("a"), typo.as("b"),
            lit(1).as("is_match"))
        val ctrl = cust.filter(col("c_custkey") % 10 === 0)
          .join(cust.select((col("c_custkey") - 1).as("c_custkey"),
            col("c_name").as("b")), "c_custkey")
          .select(col("c_custkey"), col("c_name").as("a"), col("b"),
            lit(0).as("is_match"))
        def sdx(c: org.apache.spark.sql.Column) = {
          val w = upper(split(c, " ").getItem(0))
          val codes = translate(w, "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
            "01230120022455012623010202")
          val collapsed = regexp_replace(codes, "([0-9])\\1+", "$1")
          val tail = regexp_replace(
            collapsed.substr(lit(2), length(collapsed)), "0", "")
          rpad(substring(concat(w.substr(1, 1), tail), 1, 4), 4, "0")
        }
        val pairs = planted.union(ctrl)
          .select(col("is_match"),
            (round(JaroWinkler(col("a"), col("b")), 4) >= 0.95)
              .cast("long").as("jw_hi"),
            (sdx(col("a")) === sdx(col("b"))).cast("long").as("sdx_eq"),
            (length(col("a")) === length(col("b"))).cast("long")
              .as("len_eq"))
        pairs
          .select(col("is_match"), explode(array(
            struct(lit("jw_hi").as("feature"), col("jw_hi").as("agree")),
            struct(lit("sdx_eq").as("feature"), col("sdx_eq").as("agree")),
            struct(lit("len_eq").as("feature"), col("len_eq").as("agree"))
          )).as("f"))
          .select(col("is_match"), col("f.feature"), col("f.agree"))
          .groupBy(col("feature"))
          .agg(
            sum(col("is_match")).as("n_match"),
            sum(lit(1L) - col("is_match")).as("n_nonmatch"),
            sum(col("agree") * col("is_match")).as("agree_match"),
            sum(col("agree") * (lit(1L) - col("is_match")))
              .as("agree_nonmatch"))
          .select(col("feature"), col("n_match"), col("n_nonmatch"),
            expr("agree_match * 1000000 div n_match").as("m_ppm"),
            expr("agree_nonmatch * 1000000 div n_nonmatch").as("u_ppm"))
          .withColumn("weight_ratio",
            expr("m_ppm * 1000000 div greatest(1L, u_ppm)"))
          .orderBy(col("feature"))
      },
      Some("""WITH c AS (SELECT c_custkey, c_name FROM customer),
              t AS (
                SELECT c_custkey, c_name AS a,
                  substr(c_name, 1,
                    CAST((c_custkey // 10) % length(c_name) AS BIGINT)) ||
                  substr(c_name,
                    CAST((c_custkey // 10) % length(c_name) AS BIGINT) + 2)
                    AS b,
                  1 AS is_match
                FROM c WHERE c_custkey % 10 = 0),
              n AS (
                SELECT t2.c_custkey, t2.c_name AS a, c2.c_name AS b,
                  0 AS is_match
                FROM c t2 JOIN c c2 ON c2.c_custkey = t2.c_custkey + 1
                WHERE t2.c_custkey % 10 = 0),
              sx AS (
                SELECT *,
                  rpad(substr(substr(w, 1, 1) ||
                    replace(substr(cl, 2), '0', ''), 1, 4), 4, '0') AS sdx
                FROM (
                  SELECT w,
                    regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(regexp_replace(regexp_replace(
                        regexp_replace(
                          translate(w, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                            '01230120022455012623010202'),
                          '00+', '0', 'g'), '11+', '1', 'g'),
                        '22+', '2', 'g'), '33+', '3', 'g'),
                      '44+', '4', 'g'), '55+', '5', 'g'),
                    '66+', '6', 'g') AS cl
                  FROM (SELECT DISTINCT
                          upper(split_part(x, ' ', 1)) AS w
                        FROM (SELECT a AS x FROM t UNION
                              SELECT b FROM t UNION
                              SELECT a FROM n UNION SELECT b FROM n)))),
              pairs AS (
                SELECT is_match,
                  CASE WHEN round(jaro_winkler_similarity(a, b), 4)
                    >= 0.95 THEN 1 ELSE 0 END AS jw_hi,
                  CASE WHEN (SELECT sdx FROM sx WHERE sx.w =
                      upper(split_part(a, ' ', 1))) =
                    (SELECT sdx FROM sx WHERE sx.w =
                      upper(split_part(b, ' ', 1)))
                    THEN 1 ELSE 0 END AS sdx_eq,
                  CASE WHEN length(a) = length(b) THEN 1 ELSE 0 END
                    AS len_eq
                FROM (SELECT * FROM t UNION ALL SELECT * FROM n)),
              melted AS (
                SELECT is_match, 'jw_hi' AS feature, jw_hi AS agree
                FROM pairs
                UNION ALL
                SELECT is_match, 'sdx_eq', sdx_eq FROM pairs
                UNION ALL
                SELECT is_match, 'len_eq', len_eq FROM pairs)
              SELECT feature,
                CAST(sum(is_match) AS BIGINT) AS n_match,
                CAST(sum(1 - is_match) AS BIGINT) AS n_nonmatch,
                CAST(sum(agree * is_match) * 1000000 // sum(is_match)
                  AS BIGINT) AS m_ppm,
                CAST(sum(agree * (1 - is_match)) * 1000000 //
                  sum(1 - is_match) AS BIGINT) AS u_ppm,
                CAST((sum(agree * is_match) * 1000000 // sum(is_match))
                  * 1000000 // greatest(1,
                    sum(agree * (1 - is_match)) * 1000000 //
                      sum(1 - is_match)) AS BIGINT) AS weight_ratio
              FROM melted GROUP BY feature ORDER BY feature"""))
  )
}
