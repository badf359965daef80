package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Round-12 pack, fifth batch: storage-layout and corpus-planning
  * advisors — a zone-map skip audit quantifying what a sort layout
  * buys (q302), the stationary mix of the activity Markov chain
  * (q303), a curriculum pacing schedule (q304), and the vocabulary
  * coverage curve (q305). All one-corpus-pass + dimension math; ranks
  * come from the two-pass GlobalRank/GlobalCumSum operators, never a
  * single-task sort.
  */
object Pipeline41 {

  def entries: Seq[QEntry] = Seq(

    // Zone-map (min/max per file) skip audit: assign rows to synthetic
    // 4096-row files under two layouts — arrival order vs shipdate
    // sort — then, for each year predicate, count files whose
    // [min_year, max_year] zone overlaps. The number every layout
    // advisor needs: arrival files span wide value ranges (no skips);
    // the sorted layout clusters years so most files prune. Ranks are
    // the two-pass GlobalRank (total-order keys ⇒ deterministic,
    // oracle row_number replays them); everything after the per-file
    // agg is dimension-sized.
    QEntry("q302_zonemap_audit",
      (s, d) => {
        val F = 4096
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("year(l_shipdate)").as("yr"),
            // l_shipdate is TIMESTAMP_NTZ; session TZ is UTC, so the
            // NTZ epoch diff equals DuckDB's epoch_us (Tables.events
            // precedent)
            expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 " +
              "00:00:00', l_shipdate) div 86400000000").as("ship_day"))
          .localCheckpoint() // feeds both layout rankings + the year dim
        def files(name: String, keys: Column*): DataFrame =
          graft.operators.GlobalRank.rowNumber(li, "rn", keys: _*)
            .select(lit(name).as("layout"),
              expr(s"CAST((rn - 1) AS BIGINT) div $F").as("file_id"),
              col("yr"))
            .groupBy(col("layout"), col("file_id"))
            .agg(min(col("yr")).as("min_yr"), max(col("yr")).as("max_yr"))
        val zones = files("arrival", col("l_orderkey"), col("l_linenumber"))
          .union(files("shipdate", col("ship_day"), col("l_orderkey"),
            col("l_linenumber")))
          .localCheckpoint() // file dimension, feeds totals + the probe join
        val years = li.select(col("yr")).distinct()
        val tot = zones.groupBy(col("layout"))
          .agg(count(lit(1)).as("files_total"))
        val hit = zones.join(broadcast(years),
            col("min_yr") <= col("yr") && col("yr") <= col("max_yr"))
          .groupBy(col("layout"), col("yr"))
          .agg(count(lit(1)).as("files_hit"))
          .select(col("layout").as("h_layout"), col("yr").as("h_yr"),
            col("files_hit"))
        tot.crossJoin(broadcast(years.withColumnRenamed("yr", "y")))
          .join(hit, col("layout") === col("h_layout") &&
            col("y") === col("h_yr"), "left")
          .select(col("layout"), col("y").cast("long").as("yr"),
            col("files_total"),
            coalesce(col("files_hit"), lit(0L)).as("files_hit"))
          .withColumn("skip_bp",
            expr("(files_total - files_hit) * 10000 div files_total"))
          .orderBy(col("layout"), col("yr"))
      },
      Some("""WITH li AS (
                SELECT l_orderkey, l_linenumber, year(l_shipdate) AS yr,
                  epoch_us(l_shipdate) // 86400000000 AS ship_day
                FROM lineitem),
              fa AS (
                SELECT 'arrival' AS layout,
                  (row_number() OVER (ORDER BY l_orderkey, l_linenumber)
                    - 1) // 4096 AS file_id, yr
                FROM li),
              fs AS (
                SELECT 'shipdate' AS layout,
                  (row_number() OVER (ORDER BY ship_day, l_orderkey,
                    l_linenumber) - 1) // 4096 AS file_id, yr
                FROM li),
              zones AS (
                SELECT layout, file_id, min(yr) AS min_yr, max(yr) AS max_yr
                FROM (SELECT * FROM fa UNION ALL SELECT * FROM fs)
                GROUP BY 1, 2),
              years AS (SELECT DISTINCT yr FROM li),
              tot AS (
                SELECT layout, count(*) AS files_total
                FROM zones GROUP BY 1),
              hit AS (
                SELECT z.layout, y.yr, count(*) AS files_hit
                FROM zones z JOIN years y
                  ON z.min_yr <= y.yr AND y.yr <= z.max_yr
                GROUP BY 1, 2)
              SELECT t.layout, CAST(y.yr AS BIGINT) AS yr,
                CAST(t.files_total AS BIGINT) AS files_total,
                CAST(coalesce(h.files_hit, 0) AS BIGINT) AS files_hit,
                CAST((t.files_total - coalesce(h.files_hit, 0)) * 10000
                  // t.files_total AS BIGINT) AS skip_bp
              FROM tot t CROSS JOIN years y
              LEFT JOIN hit h ON h.layout = t.layout AND h.yr = y.yr
              ORDER BY t.layout, yr""")),

    // Stationary mix of the event-type Markov chain: global transition
    // counts from per-user consecutive pairs (the q277 lag pattern,
    // aggregated across users), then 3 power-iteration rounds
    // π' = Σ_i (π_i·c(i,j)) div rowsum(i) in pico-scale integer
    // arithmetic (no damping — the raw chain). The "what the activity
    // stream converges to" monitor next to the observed mix. States
    // with no outgoing transitions leak their mass (documented; none
    // in the fixture). Transition dim ≤ |types|².
    // Int64 bound (ADVICE r12): inflow terms are (pi * c) div rs with
    // pi ≤ T = 1e12, so a single (src,dst) transition count c past
    // ~9.2e6 would overflow the product — i.e. the contract is
    // max-transition-count × T < 2^63; shrink T if an event log ever
    // concentrates >9M transitions on one ordered pair. ANSI mode
    // fails loudly rather than corrupting pi silently.
    QEntry("q303_markov_stationary",
      (s, d) => {
        val T = 1000000000000L
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val trans = Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .groupBy(col("prev").as("src"), col("event_type").as("dst"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint() // ≤|types|² dimension, feeds every round
        val rs = trans.groupBy(col("src")).agg(sum(col("c")).as("rs"))
        val states = trans.select(col("src").as("st"))
          .union(trans.select(col("dst"))).distinct()
          .localCheckpoint()
        val n = math.max(states.count(), 1L)
        var pi = states.select(col("st"), lit(T / n).as("pi"))
          .localCheckpoint()
        for (_ <- 1 to 3) {
          val inflow = trans
            .join(pi.select(col("st").as("src"), col("pi")), "src")
            .join(rs, "src")
            .select(col("dst"), expr("(pi * c) div rs").as("ctb"))
            .groupBy(col("dst")).agg(sum(col("ctb")).as("inflow"))
          pi = states
            .join(inflow.select(col("dst").as("st"), col("inflow")),
              Seq("st"), "left")
            .select(col("st"), coalesce(col("inflow"), lit(0L)).as("pi"))
            .localCheckpoint()
        }
        pi.select(col("st").as("event_type"), col("pi").as("pi_pico"))
          .orderBy(col("event_type"))
      },
      Some("""WITH seq AS (
                SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                    ORDER BY ts, event_id) AS prev
                FROM events),
              trans AS (
                SELECT prev AS src, event_type AS dst, count(*) AS c
                FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
              rs AS (SELECT src, sum(c) AS rs FROM trans GROUP BY 1),
              states AS (
                SELECT DISTINCT st FROM (
                  SELECT src AS st FROM trans
                  UNION SELECT dst FROM trans)),
              nn AS (SELECT count(*) AS n FROM states),
              p0 AS (
                SELECT st, 1000000000000 // (SELECT n FROM nn) AS pi
                FROM states),
              p1 AS (
                SELECT s.st, coalesce(f.inflow, 0) AS pi
                FROM states s LEFT JOIN (
                  SELECT t.dst, sum((p.pi * t.c) // r.rs) AS inflow
                  FROM trans t JOIN p0 p ON p.st = t.src
                  JOIN rs r ON r.src = t.src GROUP BY t.dst) f
                  ON f.dst = s.st),
              p2 AS (
                SELECT s.st, coalesce(f.inflow, 0) AS pi
                FROM states s LEFT JOIN (
                  SELECT t.dst, sum((p.pi * t.c) // r.rs) AS inflow
                  FROM trans t JOIN p1 p ON p.st = t.src
                  JOIN rs r ON r.src = t.src GROUP BY t.dst) f
                  ON f.dst = s.st),
              p3 AS (
                SELECT s.st, coalesce(f.inflow, 0) AS pi
                FROM states s LEFT JOIN (
                  SELECT t.dst, sum((p.pi * t.c) // r.rs) AS inflow
                  FROM trans t JOIN p2 p ON p.st = t.src
                  JOIN rs r ON r.src = t.src GROUP BY t.dst) f
                  ON f.dst = s.st)
              SELECT st AS event_type, CAST(pi AS BIGINT) AS pi_pico
              FROM p3 ORDER BY event_type""")),

    // Curriculum pacing schedule: documents ranked by difficulty
    // (token count — swap in any score), split into 4 equal-rank
    // stages, with per-stage doc/token totals and the cumulative token
    // budget a pacing loop consumes. Two-pass GlobalRank (no corpus
    // sort); the 4-row stage dim carries the windows.
    QEntry("q304_curriculum_schedule",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"))
        val n = docs.count()
        val staged = graft.operators.GlobalRank
          .rowNumber(docs, "rn", col("tok"), col("doc_id"))
          .select(col("doc_id"), col("tok"),
            expr(s"(CAST(rn AS BIGINT) - 1) * 4 div ${n}L").as("stage"))
        val dim = staged.groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"), sum(col("tok")).as("total_tok"),
            min(col("tok")).as("min_tok"), max(col("tok")).as("max_tok"))
        graft.pipeline.Stats.boundedDim(dim, "q304 stage dim", 1000)
          .withColumn("cum_tok",
            sum(col("total_tok")).over(
              org.apache.spark.sql.expressions.Window.orderBy(col("stage"))
                .rowsBetween(org.apache.spark.sql.expressions.Window
                  .unboundedPreceding, 0)))
          .orderBy(col("stage"))
      },
      Some("""WITH docs AS (
                SELECT doc_id,
                  CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok
                FROM documents),
              nn AS (SELECT count(*) AS n FROM docs),
              staged AS (
                SELECT doc_id, tok,
                  (row_number() OVER (ORDER BY tok, doc_id) - 1) * 4
                    // (SELECT n FROM nn) AS stage
                FROM docs),
              dim AS (
                SELECT stage, count(*) AS n_docs, sum(tok) AS total_tok,
                  min(tok) AS min_tok, max(tok) AS max_tok
                FROM staged GROUP BY 1)
              SELECT CAST(stage AS BIGINT) AS stage,
                CAST(n_docs AS BIGINT) AS n_docs,
                CAST(total_tok AS BIGINT) AS total_tok,
                CAST(min_tok AS BIGINT) AS min_tok,
                CAST(max_tok AS BIGINT) AS max_tok,
                CAST(sum(total_tok) OVER (ORDER BY stage
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum_tok
              FROM dim ORDER BY stage""")),

    // Vocabulary coverage curve: what share of token OCCURRENCES the
    // top-k most frequent words cover, k ∈ {100, 1000, 10000} — the
    // Zipf readout behind every vocab-size decision. Word dim ranked
    // by (count desc, word) via GlobalRank, running coverage via
    // GlobalCumSum over the rank order, then one broadcast probe of
    // the k dim. Integer ppm.
    QEntry("q305_vocab_coverage",
      (s, d) => {
        val wc = Tables.documents(s, d)
          .select(explode(split(lower(col("text")), "\\s+")).as("w"))
          .filter(length(col("w")) > 0)
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          .localCheckpoint() // word dimension
        val total = wc.agg(sum(col("cnt"))).head().getLong(0)
        val ranked = graft.operators.GlobalRank
          .rowNumber(wc, "rn", col("cnt").desc, col("w"))
        val cum = graft.operators.GlobalCumSum
          .runningSum(ranked, col("cnt"), "cum", col("rn"))
          .localCheckpoint()
        import s.implicits._
        val ks = Seq(100L, 1000L, 10000L).toDF("k")
        broadcast(ks).join(cum, col("rn") <= col("k"))
          .groupBy(col("k"))
          .agg(max(col("rn")).cast("long").as("vocab_words"),
            max(col("cum")).as("covered"))
          .select(col("k"), col("vocab_words"), col("covered"),
            lit(total).as("total"),
            expr(s"covered * 1000000 div ${total}L").as("coverage_ppm"))
          .orderBy(col("k"))
      },
      Some("""WITH wc AS (
                SELECT w, count(*) AS cnt FROM (
                  SELECT unnest(string_split_regex(lower(text), '\s+')) AS w
                  FROM documents)
                WHERE len(w) > 0 GROUP BY w),
              tt AS (SELECT sum(cnt) AS total FROM wc),
              ranked AS (
                SELECT w, cnt,
                  row_number() OVER (ORDER BY cnt DESC, w) AS rn,
                  sum(cnt) OVER (ORDER BY cnt DESC, w
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS cum
                FROM wc),
              ks AS (SELECT unnest([100, 1000, 10000]) AS k)
              SELECT CAST(ks.k AS BIGINT) AS k,
                CAST(max(r.rn) AS BIGINT) AS vocab_words,
                CAST(max(r.cum) AS BIGINT) AS covered,
                CAST((SELECT total FROM tt) AS BIGINT) AS total,
                CAST(max(r.cum) * 1000000 // (SELECT total FROM tt)
                  AS BIGINT) AS coverage_ppm
              FROM ks JOIN ranked r ON r.rn <= ks.k
              GROUP BY ks.k ORDER BY k"""))
  )
}
