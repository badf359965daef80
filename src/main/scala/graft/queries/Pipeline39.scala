package graft.queries

import org.apache.spark.sql.functions._

import graft.profile.TypeRegistry

/** Round-12 pack, third batch: the registered-type golden journey
  * (VERDICT r11 item 4). q285/q286 prove the [[TypeRegistry]] seam
  * per-stage on synthesized columns; q297 is the full user story —
  * "add a semantic type by pure config, profile a real CSV, get
  * oracle-verified histograms":
  *
  *   - fixture `data/csv_golden_devices.csv` (GenGoldenCsv, 96 rows):
  *     `Device ID` carries the Synth.uuidHex residues, `Callback
  *     Phone` a BUILT-IN type (one run must profile registry types and
  *     built-ins side by side), `Status` letter-only free text and the
  *     integer `id` both required SILENT;
  *   - the query registers `TypeRegistry.uuid` through the public API
  *     (idempotently — Verify/Bench run entries repeatedly in one JVM)
  *     and profiles with `TypeRegistry.allFused`, i.e. exactly what
  *     [[graft.ProfileMain]] does when a user config registers a type;
  *   - the oracle replays every histogram cell from id-residue CASE
  *     arithmetic (uuidHex is deliberately digit-light so NO built-in
  *     can fire on the UUID column — the silences are provable, not
  *     observed).
  */
object Pipeline39 {

  // Resolved from the checked-in relative path so any checkout location
  // works (ADVICE r12: the absolute /root/repo path broke portability).
  // Verify/Bench/sbt all run with cwd = repo root, which is what the
  // relative DevicesPath is defined against.
  private val DevicesCsv =
    new java.io.File(graft.tools.GenGoldenCsv.DevicesPath).getAbsolutePath

  private def devicesOracle: Option[String] = {
    val Csv = s"read_csv('$DevicesCsv')"
    def hist(colName: String, semType: String, codeSql: String) =
      s"""SELECT '$colName' AS col_name, '$semType' AS semtype, code,
           count(*) AS n
          FROM (SELECT ${codeSql.replace("c_custkey", "id")} AS code
                FROM $Csv)
          GROUP BY code"""
    Some(Seq(
      hist("Callback Phone", "phone", Synth.phoneCodeSql),
      hist("Device ID", "uuid", Synth.uuidHexCodeSql))
      .mkString("", " UNION ALL ", " ORDER BY col_name, semtype, code"))
  }

  def entries: Seq[QEntry] = Seq(

    QEntry("q297_registered_golden_profile",
      (s, d) => {
        // the public registration API, SCOPED to this entry (ADVICE
        // r12): register → profile → unregister in finally, so later
        // profiling gates never see an enlarged detector set and
        // results stay order-independent. The returned plan is built
        // eagerly from the spec list (detection collects, verdict
        // columns are resolved Columns), so unregistering afterwards
        // cannot change it.
        TypeRegistry.synchronized {
          if (!TypeRegistry.registered.exists(_.semType == "uuid"))
            TypeRegistry.register(TypeRegistry.uuid)
        }
        try {
          val df = graft.sources.CsvSource.read(s, DevicesCsv)
          graft.profile.Profiler.profile(df, TypeRegistry.allFused,
            sampleN = 100, keyCol = Some("id"))
            .withColumnRenamed("column", "col_name")
            .withColumnRenamed("semType", "semtype")
            .orderBy(col("col_name"), col("semtype"), col("code"))
        } finally TypeRegistry.unregister("uuid")
      },
      devicesOracle)
  )
}
