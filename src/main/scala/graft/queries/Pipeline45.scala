package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.profile.{Detector, TypeRegistry, Validators}

/** Round-12 pack, ninth batch: the POWER-USER arm of the type registry
  * (a full custom TypeSpec with a checksum validator — q315), and two
  * token-budget planners: padding/truncation waste by context length
  * (q316) and temperature-scaled mixture sampling (q317).
  */
object Pipeline45 {

  /** User-side custom semantic type: credit-card numbers verified by
    * the Luhn checksum — the registry's `register(spec)` arm (q285/
    * q297 cover the declarative RegexType arm; this one carries logic
    * a regex cannot express). Codes: 1 = 13–19 digit run passing Luhn;
    * 2 = separator-formatted number whose stripped digits pass (norm
    * strips); 4 = null-like; 5 = everything else (incl. checksum
    * failures — a regex-only validator would code them 1; the split is
    * exactly q165's precision tier). Conditions guard the digit casts
    * with `when`, never bare `&&`, so ANSI mode can't see a non-digit
    * cast (the Curation.redactCreditCards discipline). */
  def cardSpec: Detector.TypeSpec = {
    val DigitRun = "^[0-9]{13,19}$"
    val SepRun = "^[0-9][0-9 \\-]{11,22}[0-9]$"
    def stripped(t: Column): Column = regexp_replace(t, "[ \\-]", "")
    def v1(t: Column): Column =
      when(t.rlike(DigitRun), graft.pipeline.Curation.luhnValid(t))
        .otherwise(lit(false))
    def v2(t: Column): Column =
      when(t.rlike(SepRun) && stripped(t).rlike(DigitRun),
        graft.pipeline.Curation.luhnValid(stripped(t)))
        .otherwise(lit(false))
    val validator: Column => Column = c => {
      val t = trim(c.cast("string"))
      struct(
        when(Validators.isNullLike(c), 4)
          .when(v1(t), 1)
          .when(v2(t), 2)
          .otherwise(5).cast("int").as("code"),
        when(Validators.isNullLike(c), lit(""))
          .when(v1(t), t)
          .when(v2(t), stripped(t))
          .otherwise(t).as("norm"))
    }
    val hit: Column => Column = c => {
      val t = trim(c.cast("string"))
      c.isNotNull && !Validators.isNullLike(c) && (v1(t) || v2(t))
    }
    Detector.TypeSpec("card", validator, hit, threshold = 1)
  }

  // card residues (q20 harness convention): valid Visa16 / separator-
  // formatted / off-by-one checksum FAIL / null-like / alpha / Amex15
  private[queries] def cardCol: Column =
    when(col("c_custkey") % 6 === 0, lit("4532015112830366"))
      .when(col("c_custkey") % 6 === 1, lit("4532-0151-1283-0366"))
      .when(col("c_custkey") % 6 === 2, lit("4532015112830367"))
      .when(col("c_custkey") % 6 === 3, lit("N/A"))
      .when(col("c_custkey") % 6 === 4, lit("hello"))
      .otherwise(lit("379354508162306"))

  private val cardSql =
    """CASE c_custkey % 6
       WHEN 0 THEN '4532015112830366'
       WHEN 1 THEN '4532-0151-1283-0366'
       WHEN 2 THEN '4532015112830367'
       WHEN 3 THEN 'N/A'
       WHEN 4 THEN 'hello'
       ELSE '379354508162306' END"""

  def entries: Seq[QEntry] = Seq(

    // Cell-by-cell verdicts from the REGISTERED checksum TypeSpec —
    // the q285 harness shape, proving the register(spec) arm end to
    // end. The residues pin every outcome (the Luhn fold itself is
    // digit-by-digit oracle-pinned at q165), so the oracle is pure
    // CASE arithmetic.
    QEntry("q315_registered_card_validate",
      (s, d) => {
        // registration SCOPED to this entry (ADVICE r12): the verdict
        // Column is resolved from the spec before the finally runs, so
        // the plan survives the unregister; later gates never see the
        // extra type.
        TypeRegistry.synchronized {
          if (!TypeRegistry.registered.exists(_.semType == "card"))
            TypeRegistry.register(cardSpec)
        }
        try {
          val spec = TypeRegistry.all.find(_.semType == "card").get
          val v = spec.validator(col("raw"))
          Tables.customer(s, d)
            .select(col("c_custkey"), cardCol.as("raw"))
            .select(col("c_custkey"), col("raw"),
              v.getField("code").as("code"), v.getField("norm").as("norm"))
            .orderBy(col("c_custkey"))
        } finally TypeRegistry.unregister("card")
      },
      Some(s"""SELECT c_custkey, $cardSql AS raw,
                CASE c_custkey % 6
                  WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 5
                  WHEN 3 THEN 4 WHEN 4 THEN 5 ELSE 1 END AS code,
                CASE c_custkey % 6
                  WHEN 0 THEN '4532015112830366'
                  WHEN 1 THEN '4532015112830366'
                  WHEN 2 THEN '4532015112830367'
                  WHEN 3 THEN ''
                  WHEN 4 THEN 'hello'
                  ELSE '379354508162306' END AS norm
               FROM customer ORDER BY c_custkey""")),

    // Padding/truncation waste by context length, one doc per sequence
    // (the no-packing baseline q88's packer improves on): for each
    // candidate L, docs that fit vs truncate, tokens kept / cut /
    // padded, and utilization — the "what context length fits this
    // corpus" planner. One scan to the token-count dim, config grid
    // broadcast.
    QEntry("q316_padding_waste",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(graft.pipeline.TextAnalysis.tokenCount(col("text"))
            .cast("long").as("tok"))
          .groupBy(col("tok")).agg(count(lit(1)).as("n"))
          .localCheckpoint() // token-length histogram
        import s.implicits._
        val ls = Seq(128L, 256L, 512L, 1024L).toDF("len_cap")
        broadcast(ls).crossJoin(toks)
          .groupBy(col("len_cap"))
          .agg(sum(col("n")).as("n_docs"),
            sum(when(col("tok") > col("len_cap"), col("n"))
              .otherwise(lit(0L))).as("n_trunc"),
            sum(least(col("tok"), col("len_cap")) * col("n"))
              .as("kept_tokens"),
            sum(greatest(col("tok") - col("len_cap"), lit(0L)) * col("n"))
              .as("cut_tokens"),
            sum(greatest(col("len_cap") - col("tok"), lit(0L)) * col("n"))
              .as("pad_tokens"))
          .withColumn("util_ppm",
            expr("kept_tokens * 1000000 div (n_docs * len_cap)"))
          .orderBy(col("len_cap"))
      },
      Some("""WITH h AS (
                SELECT CAST(len(string_split_regex(lower(text), '\s+'))
                    AS BIGINT) AS tok, count(*) AS n
                FROM documents GROUP BY 1),
              ls AS (SELECT CAST(unnest([128, 256, 512, 1024]) AS BIGINT)
                       AS len_cap)
              SELECT ls.len_cap,
                CAST(sum(h.n) AS BIGINT) AS n_docs,
                CAST(sum(CASE WHEN h.tok > ls.len_cap THEN h.n ELSE 0 END)
                  AS BIGINT) AS n_trunc,
                CAST(sum(least(h.tok, ls.len_cap) * h.n) AS BIGINT)
                  AS kept_tokens,
                CAST(sum(greatest(h.tok - ls.len_cap, 0) * h.n) AS BIGINT)
                  AS cut_tokens,
                CAST(sum(greatest(ls.len_cap - h.tok, 0) * h.n) AS BIGINT)
                  AS pad_tokens,
                CAST(sum(least(h.tok, ls.len_cap) * h.n) * 1000000
                  // (sum(h.n) * ls.len_cap) AS BIGINT) AS util_ppm
              FROM ls CROSS JOIN h
              GROUP BY ls.len_cap ORDER BY ls.len_cap""")),

    // Temperature-scaled mixture sampling (the multilingual upsampling
    // rule p_i ∝ share_i^α): for α ∈ {0.25, 0.5, 0.75, 1.0}, each
    // source's sampling probability and its upsample factor vs natural
    // share — the "how hard do I boost the tail" planner. Shares from
    // one token-count agg; the α×source grid is a broadcast dim;
    // doubles rounded at the edge (pow parity at 1e-6).
    QEntry("q317_temperature_mix",
      (s, d) => {
        val src = Tables.documents(s, d)
          .select(col("source"),
            graft.pipeline.TextAnalysis.tokenCount(col("text"))
              .cast("long").as("tok"))
          .groupBy(col("source")).agg(sum(col("tok")).as("n_tokens"))
          .localCheckpoint() // source dimension
        val total = src.agg(sum(col("n_tokens"))).head().getLong(0)
        import s.implicits._
        val alphas = Seq(25L, 50L, 75L, 100L).toDF("alpha_pct")
        val wtd = broadcast(alphas).crossJoin(src)
          .withColumn("share",
            col("n_tokens").cast("double") / lit(total.toDouble))
          .withColumn("w", pow(col("share"), col("alpha_pct") / lit(100.0)))
        val z = wtd.groupBy(col("alpha_pct"))
          .agg(sum(col("w")).as("z"))
        wtd.join(z, "alpha_pct")
          .select(col("alpha_pct"), col("source"), col("n_tokens"),
            expr(s"n_tokens * 1000000 div ${total}L").as("raw_share_ppm"),
            round(col("w") / col("z"), 6).as("p"),
            round(col("w") / col("z") / col("share"), 6).as("upsample"))
          .orderBy(col("alpha_pct"), col("source"))
      },
      Some("""WITH src AS (
                SELECT source,
                  CAST(sum(len(string_split_regex(lower(text), '\s+')))
                    AS BIGINT) AS n_tokens
                FROM documents GROUP BY 1),
              tt AS (SELECT sum(n_tokens) AS total FROM src),
              al AS (SELECT CAST(unnest([25, 50, 75, 100]) AS BIGINT)
                       AS alpha_pct),
              wtd AS (
                SELECT al.alpha_pct, s.source, s.n_tokens,
                  CAST(s.n_tokens AS DOUBLE) / (SELECT total FROM tt)
                    AS share,
                  pow(CAST(s.n_tokens AS DOUBLE) / (SELECT total FROM tt),
                    al.alpha_pct / 100.0) AS w
                FROM al CROSS JOIN src s),
              z AS (
                SELECT alpha_pct, sum(w) AS z FROM wtd GROUP BY 1)
              SELECT w.alpha_pct, w.source, w.n_tokens,
                CAST(w.n_tokens * 1000000 // (SELECT total FROM tt)
                  AS BIGINT) AS raw_share_ppm,
                round(w.w / z.z, 6) AS p,
                round(w.w / z.z / w.share, 6) AS upsample
              FROM wtd w JOIN z USING (alpha_pct)
              ORDER BY w.alpha_pct, w.source"""))
  )
}
