package graft.queries

import org.apache.spark.sql.functions._

/** Round-12 pack, eleventh batch — phonetic blocking and embedding
  * spectrum:
  *  - q322: Soundex phonetic blocking over part-name head words — the
  *    classic pre-LSH blocking key for name-shaped linkage (q318's JW
  *    scores what this blocks together);
  *  - q323: dominant principal direction of the embedding cloud via
  *    integer power iteration on the 16-dim matryoshka-prefix
  *    covariance — the "is my embedding space collapsing to one axis"
  *    diagnostic behind the q307 hubness readout.
  */
object Pipeline47 {

  /** Simplified Soundex (the common SQL formulation, identical on both
    * engines): code letters through one `translate`, collapse adjacent
    * equal digits, drop vowel-class zeros AFTER the collapse, first
    * letter + three digits padded with zeros. The h/w-bridging rule of
    * archival Soundex is deliberately omitted (h/w sit in the vowel
    * class) — a documented variant choice, consistent across the gate
    * and its oracle. */
  private val SdxMap = "01230120022455012623010202"

  val entries: Seq[QEntry] = Seq(

    // Phonetic blocking census: parts keyed by the Soundex of their
    // first name word — block size and distinct-word spread per code,
    // largest blocks first. The blocking twin of q321: where deletion
    // signatures catch typos, phonetic keys catch respellings; the
    // census is what you read before trusting the block sizes at join
    // time (a skewed block is a skewed join).
    QEntry("q322_soundex_blocking",
      (s, d) => {
        val w = upper(split(col("p_name"), " ").getItem(0))
        val codes = translate(w, "ABCDEFGHIJKLMNOPQRSTUVWXYZ", SdxMap)
        val collapsed = regexp_replace(codes, "([0-9])\\1+", "$1")
        val tail =
          regexp_replace(collapsed.substr(lit(2), length(collapsed)), "0", "")
        val sdx = rpad(substring(concat(w.substr(1, 1), tail), 1, 4), 4, "0")
        Tables.part(s, d)
          .select(w.as("word"), sdx.as("soundex"))
          .groupBy(col("soundex"))
          .agg(count(lit(1)).as("n_parts"),
            countDistinct(col("word")).as("n_words"),
            min(col("word")).as("sample_word"))
          .orderBy(col("n_parts").desc, col("soundex"))
      },
      Some("""WITH w AS (
                SELECT upper(split_part(p_name, ' ', 1)) AS word
                FROM part),
              coded AS (
                -- RE2 (DuckDB's regex engine) has no backreferences, so
                -- the run collapse chains one replace per digit — runs
                -- of distinct digits never interact, so the chain is
                -- order-independent and equals the gate's ([0-9])\1+
                SELECT word,
                  regexp_replace(regexp_replace(regexp_replace(
                    regexp_replace(regexp_replace(regexp_replace(
                      regexp_replace(
                        translate(word, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                          '01230120022455012623010202'),
                        '00+', '0', 'g'), '11+', '1', 'g'),
                      '22+', '2', 'g'), '33+', '3', 'g'),
                    '44+', '4', 'g'), '55+', '5', 'g'),
                  '66+', '6', 'g') AS collapsed
                FROM w),
              sdx AS (
                SELECT word,
                  rpad(substr(substr(word, 1, 1) ||
                    replace(substr(collapsed, 2), '0', ''), 1, 4),
                    4, '0') AS soundex
                FROM coded)
              SELECT soundex, CAST(count(*) AS BIGINT) AS n_parts,
                CAST(count(DISTINCT word) AS BIGINT) AS n_words,
                min(word) AS sample_word
              FROM sdx GROUP BY soundex
              ORDER BY n_parts DESC, soundex""")),

    // Dominant principal direction by power iteration, exact integers
    // end to end: 16-dim matryoshka prefix (the q237 convention) of the
    // quantized embeddings → integer-mean-centered covariance on the
    // 256-cell (i, j) DIMENSION (one posexplode of the per-row outer
    // product, map-side combined) → three iterations v' = (C·v) div
    // scale with max-|component| renormalization to the ±1e6 grid (no
    // sqrt, no doubles — deterministic sign from the all-ones seed).
    // λ estimate: with v max-normalized to 1e6, max|C·v| div 1e6 is the
    // Rayleigh-style eigenvalue readout; trace for the explained-share
    // denominator. At corpus grain the only O(rows) work is the outer
    // product scan — iterations run on the 256-cell dim.
    QEntry("q323_power_iteration",
      (s, d) => {
        val pre = Tables.embeddings(s, d)
          .select(slice(graft.pipeline.Similarity.quantize(col("embedding")),
            1, 16).as("v"))
        val tot = pre.agg(count(lit(1)).as("n"))
        val means = pre.select(posexplode(col("v")).as(Seq("i", "x")))
          .groupBy(col("i")).agg(sum(col("x")).as("sx"))
          .crossJoin(broadcast(tot))
          .select(col("i"), expr("sx div n").as("mu"))
        val prods = pre
          .select(posexplode(flatten(transform(col("v"),
            a => transform(col("v"), b => a * b)))).as(Seq("pos", "p")))
          .groupBy(expr("pos div 16").as("i"), expr("pos % 16").as("j"))
          .agg(sum(col("p")).as("sp"))
        val cov = prods
          .join(broadcast(means.select(col("i"), col("mu").as("mui"))), "i")
          .join(broadcast(means.select(col("i").as("j"),
            col("mu").as("muj"))), "j")
          .crossJoin(broadcast(tot))
          .select(col("i"), col("j"),
            expr("(sp - n * mui * muj) div n").as("cv"))
          .localCheckpoint() // 256-cell dim: 3 iterations + trace read it
        var v = means.select(col("i"), lit(1000000L).as("vv"))
        var lastW = v // replaced in the loop
        for (_ <- 1 to 3) {
          val w = cov
            .join(broadcast(v.select(col("i").as("j"), col("vv").as("vj"))),
              "j")
            .groupBy(col("i")).agg(sum(expr("cv * vj")).as("w"))
          val sc = w.agg(
            greatest(lit(1L), expr("max(abs(w)) div 1000000")).as("sc"))
          lastW = w.crossJoin(broadcast(sc))
          v = lastW.select(col("i"), expr("w div sc").as("vv"))
        }
        val lambda = lastW.agg(
          expr("max(abs(w)) div 1000000").as("lambda_unit"))
        val trace = cov.filter(col("i") === col("j"))
          .agg(sum(col("cv")).as("trace_unit"))
        v.crossJoin(broadcast(lambda)).crossJoin(broadcast(trace))
          .select(col("i"), col("vv").as("v_unit"),
            col("lambda_unit"), col("trace_unit"))
          .orderBy(col("i"))
      },
      Some("""WITH pre AS (
                SELECT list_transform(embedding, x -> CAST(round(
                    CAST(x AS DOUBLE) * 10000.0) AS BIGINT))[1:16] AS v
                FROM embeddings),
              tot AS (SELECT count(*) AS n FROM pre),
              m AS (
                SELECT r.i,
                  sum(v[r.i + 1]) // (SELECT n FROM tot) AS mu
                FROM pre, range(16) r(i) GROUP BY r.i),
              c AS (
                SELECT ri.i AS i, rj.j AS j,
                  (sum(p.v[ri.i + 1] * p.v[rj.j + 1]) -
                    (SELECT n FROM tot) * mi.mu * mj.mu) //
                    (SELECT n FROM tot) AS cv
                FROM pre p, range(16) ri(i), range(16) rj(j)
                JOIN m mi ON mi.i = ri.i
                JOIN m mj ON mj.i = rj.j
                GROUP BY ri.i, rj.j, mi.mu, mj.mu),
              v0 AS (SELECT i, CAST(1000000 AS BIGINT) AS vv
                     FROM range(16) r(i)),
              w1 AS (SELECT c.i, sum(c.cv * v0.vv) AS w
                     FROM c JOIN v0 ON v0.i = c.j GROUP BY c.i),
              s1 AS (SELECT greatest(1, max(abs(w)) // 1000000) AS sc
                     FROM w1),
              v1 AS (SELECT i, w // (SELECT sc FROM s1) AS vv FROM w1),
              w2 AS (SELECT c.i, sum(c.cv * v1.vv) AS w
                     FROM c JOIN v1 ON v1.i = c.j GROUP BY c.i),
              s2 AS (SELECT greatest(1, max(abs(w)) // 1000000) AS sc
                     FROM w2),
              v2 AS (SELECT i, w // (SELECT sc FROM s2) AS vv FROM w2),
              w3 AS (SELECT c.i, sum(c.cv * v2.vv) AS w
                     FROM c JOIN v2 ON v2.i = c.j GROUP BY c.i),
              s3 AS (SELECT greatest(1, max(abs(w)) // 1000000) AS sc
                     FROM w3),
              v3 AS (SELECT i, w // (SELECT sc FROM s3) AS vv FROM w3),
              lam AS (SELECT max(abs(w)) // 1000000 AS lambda_unit
                      FROM w3),
              tr AS (SELECT sum(cv) AS trace_unit FROM c WHERE i = j)
              SELECT CAST(v3.i AS INTEGER) AS i,
                CAST(v3.vv AS BIGINT) AS v_unit,
                CAST(lam.lambda_unit AS BIGINT) AS lambda_unit,
                CAST(tr.trace_unit AS BIGINT) AS trace_unit
              FROM v3, lam, tr ORDER BY v3.i"""))
  )
}
