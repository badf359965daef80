package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.profile.{Detector, TypeRegistry}

/** Round-11 pack: the pluggable-type registry exercised end to end
  * (VERDICT r10 item 6) — a UUID semantic type that exists PURELY as a
  * declarative TypeRegistry.RegexType config (no Validators/SemVerdict
  * edits), validated cell-by-cell against a DuckDB oracle (q285) and
  * detected through the same one-job detection path as the built-ins
  * (q286).
  */
object Pipeline36 {

  // synthesized UUID column on customer (the q20 harness convention):
  // residues cover canonical/uppercase/bare-hex/null-like/garbage/short
  private val mSql = "md5(cast(c_custkey AS VARCHAR))"
  private val canonSql =
    s"substr($mSql,1,8) || '-' || substr($mSql,9,4) || '-' || " +
      s"substr($mSql,13,4) || '-' || substr($mSql,17,4) || '-' || " +
      s"substr($mSql,21,12)"

  private def uuidCol: Column = {
    val m = md5(col("c_custkey").cast("string"))
    val canon = concat_ws("-", substring(m, 1, 8), substring(m, 9, 4),
      substring(m, 13, 4), substring(m, 17, 4), substring(m, 21, 12))
    when(col("c_custkey") % 6 === 0, canon)
      .when(col("c_custkey") % 6 === 1, upper(canon))
      .when(col("c_custkey") % 6 === 2, m)
      .when(col("c_custkey") % 6 === 3, lit("N/A"))
      .when(col("c_custkey") % 6 === 4, lit("hello"))
      .otherwise(substring(m, 1, 12))
  }

  private val uuidSql =
    s"""CASE c_custkey % 6
         WHEN 0 THEN $canonSql
         WHEN 1 THEN upper($canonSql)
         WHEN 2 THEN $mSql
         WHEN 3 THEN 'N/A'
         WHEN 4 THEN 'hello'
         ELSE substr($mSql, 1, 12) END"""

  /** q287's oracle: the golden CSV is Synth residue columns at id
    * 0..95 (GenGoldenCsv), so each detected (column, type) histogram
    * replays from `id % k` CASE arithmetic — including the three honest
    * detection false positives, each explained:
    *
    *   - CENSUS_TRACT → zip: every 9-digit tract code's first five
    *     digits are a dictionary zip ⇒ code 2 for all 96 rows (the
    *     reference's Block/CENSUS_TRACT→zip pattern);
    *   - Location → phone: coordinate strings strip to 10
    *     NANP-plausible digits (the q27/q28 mapping);
    *   - Email → url: the no-@ code-3 email variant is a valid
    *     schemeless URL (code 2, fix prepends https://); the null-like
    *     email variants are null-like URLs too (code 4); every other
    *     email shape fails the URL grammar (code 3).
    *
    * `Descriptor` and `id` must NOT appear — absence is part of the
    * hash-compared result. */
  private def goldenOracle: Option[String] = {
    val Csv = s"read_csv('${Tables.fixture("data/csv_golden_nyc.csv")}')"
    def hist(colName: String, semType: String, codeSql: String) =
      s"""SELECT '$colName' AS col_name, '$semType' AS semtype, code,
           count(*) AS n
          FROM (SELECT ${codeSql.replace("c_custkey", "id")} AS code
                FROM $Csv)
          GROUP BY code"""
    val parts = Seq(
      hist("Amount", "money", Synth.moneyCodeSql),
      hist("Borough", "boro", Synth.boroCodeSql),
      hist("CENSUS_TRACT", "zip", "2"),
      hist("Created Date", "isodate", Synth.isodateCodeSql),
      hist("Email", "email", Synth.emailCodeSql),
      hist("Email", "url",
        "CASE c_custkey % 8 WHEN 2 THEN 4 WHEN 3 THEN 4 WHEN 4 THEN 2 ELSE 3 END"),
      hist("Incident Zip", "zip", Synth.zipDictCodeSql),
      hist("Latitude", "lat", Synth.latCodeSql),
      hist("Location", "coords", Synth.coordsCodeSql),
      hist("Location", "phone",
        "CASE c_custkey % 5 WHEN 0 THEN 3 WHEN 1 THEN 2 WHEN 2 THEN 3 WHEN 3 THEN 4 ELSE 5 END"),
      hist("Longitude", "long", Synth.longitudeCodeSql),
      hist("Phone", "phone", Synth.phoneCodeSql),
      hist("Server IP", "ipv4", Synth.ipv4CodeSql),
      hist("State", "state", Synth.stateCodeSql),
      hist("Website", "url", Synth.urlCodeSql))
    Some(parts.mkString("", " UNION ALL ",
      " ORDER BY col_name, semtype, code"))
  }

  val entries: Seq[QEntry] = Seq(

    // Cell-level verdicts from the registry-built validator: the code
    // cascade (1 canonical → lowercased, 2 bare 32-hex → dashes
    // inserted, 4 null-like, 5 garbage/short) comes entirely from the
    // RegexType config — the oracle replays it from the residues.
    QEntry("q285_uuid_registry_validate",
      (s, d) => {
        val v = TypeRegistry.uuid.toSpec.validator(col("raw"))
        Tables.customer(s, d)
          .select(col("c_custkey"), uuidCol.as("raw"))
          .select(col("c_custkey"), col("raw"),
            v.getField("code").as("code"), v.getField("norm").as("norm"))
          .orderBy(col("c_custkey"))
      },
      Some(s"""SELECT c_custkey, $uuidSql AS raw,
                CASE c_custkey % 6
                  WHEN 0 THEN 1 WHEN 1 THEN 1 WHEN 2 THEN 2
                  WHEN 3 THEN 4 WHEN 4 THEN 5 ELSE 5 END AS code,
                CASE c_custkey % 6
                  WHEN 0 THEN $canonSql
                  WHEN 1 THEN $canonSql
                  WHEN 2 THEN $canonSql
                  WHEN 3 THEN ''
                  WHEN 4 THEN 'hello'
                  ELSE substr($mSql, 1, 12) END AS norm
               FROM customer ORDER BY c_custkey""")),

    // Detection through the identical one-job path the built-ins use
    // (q226 convention: the new spec + a zip-shaped control column that
    // must NOT fire — neither regex accepts plain digit runs). Hits =
    // valid + fixable residues {0,1,2}; threshold 1 (D1).
    QEntry("q286_uuid_registry_detect",
      (s, d) => {
        val table = Tables.customer(s, d).select(
          col("c_custkey"),
          uuidCol.as("uuid_col"), Synth.zip.as("control_col"))
          .orderBy(col("c_custkey"))
        val detected = Detector.detect(table,
          Seq(TypeRegistry.uuid.toSpec), sampleN = 100,
          candidateCols = Some(Seq("uuid_col", "control_col")))
        import s.implicits._
        detected.sortBy(x => (x.column, x.semType)).toDF()
          .select(col("column").as("col_name"), col("semType").as("semtype"),
            col("hits"), col("sampled"))
          .orderBy(col("col_name"), col("semtype"))
      },
      Some("""SELECT 'uuid_col' AS col_name, 'uuid' AS semtype,
               CAST(sum(CASE WHEN c_custkey % 6 IN (0, 1, 2)
                 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
               count(*) AS sampled
              FROM customer WHERE c_custkey < 100""")),

    // Golden end-to-end profile (VERDICT r10 item 4): the reference's
    // actual user journey — one messy multi-type CSV through CSV ingest
    // → one-job detection → fused classification → code histogram — on
    // the checked-in data/csv_golden_nyc.csv fixture (GenGoldenCsv:
    // Synth residue columns at ids 0..95 under NYC-311 column names,
    // plus the Block/CENSUS_TRACT→zip detection false positive and a
    // Descriptor column that must detect as nothing). The oracle
    // replays every histogram from id-residue CASE arithmetic, so the
    // whole detect→classify→histogram surface is hash-compared.
    QEntry("q287_golden_profile",
      (s, d) => {
        val df = graft.sources.CsvSource.read(s,
          Tables.fixture("data/csv_golden_nyc.csv"))
        graft.profile.Profiler.profile(df, Detector.fusedSpecs,
          sampleN = 100, keyCol = Some("id"))
          .withColumnRenamed("column", "col_name")
          .withColumnRenamed("semType", "semtype")
          .orderBy(col("col_name"), col("semtype"), col("code"))
      },
      goldenOracle)
  )
}
