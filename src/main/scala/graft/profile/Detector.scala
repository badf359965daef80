package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic-type column detection — the reference's "profiling planner"
  * (SURVEY.md §2b, D1/D2/D3).
  *
  * The reference runs one Spark job per (sample, type) — or per column in
  * the driver-loop variant (`latlong-validate.py:67-78`: `take(100)`
  * inside a per-column loop). Here detection over ALL candidate columns ×
  * ALL semantic types is ONE Catalyst job:
  *
  * `limit(N)` → explode to (column, value) pairs → one conditional-agg
  * per type → `collect()` of a ≤(cols×types)-row summary.
  *
  * The single collect is inherently data-dependent (it decides the
  * downstream validation plan — SURVEY.md §3) and is O(columns), never
  * O(data). At 100 TB, `limit(N)` short-circuits the scan after the first
  * partition(s); nothing else reads the table.
  */
object Detector {

  /** Per-type detection config: full verdict validator (classification),
    * a small boolean `hit` predicate equivalent to `code IN (1,2)` of the
    * validator (detection — keeps the detection aggregate's expression
    * trees tiny), the hit threshold over the sample (reference: >0 for
    * phone/state/boro, >=5 for zip/lat/long — SURVEY.md §2b "quirks"),
    * and an optional column-name hint (reference D3: lat/long columns
    * must have "lat"/"long" in the header,
    * `latlong-validate.py:74,95-98`). */
  case class TypeSpec(
      semType: String,
      validator: Column => Column,
      hit: Column => Column,
      threshold: Long = 1,
      nameHint: Option[String => Boolean] = None)

  val defaultSpecs: Seq[TypeSpec] = Seq(
    TypeSpec("phone", Validators.phoneVerdict, Validators.phoneHit, 1),
    TypeSpec("state", Validators.stateVerdict, Validators.stateHit, 1),
    TypeSpec("boro", Validators.boroVerdict, Validators.boroHit, 1),
    TypeSpec("zip", c => Validators.zipDictVerdict(c),
      c => Validators.zipDictHit(c), 5),
    TypeSpec("lat", Validators.latVerdict,
      c => Validators.latLongHit(c, 90.0), 5,
      Some(n => n.toLowerCase.contains("lat"))),
    TypeSpec("long", Validators.longVerdict,
      c => Validators.latLongHit(c, 180.0), 5,
      Some(n => n.toLowerCase.contains("lon"))),
    TypeSpec("coords", c => {
      val v = Validators.coordsVerdict(c)
      struct(v.getField("code").as("code"), v.getField("norm").as("norm"))
    }, Validators.coordsHit, 5,
      Some(n => { val l = n.toLowerCase; l.contains("coord") || l.contains("location") })),
    // Engine-extension trio (VERDICT r9 item 5). email/url shapes are
    // selective enough for the >0 threshold (D1); dates reuse the
    // reference's >=5 quirk (D2, like zip/lat/long) because short digit
    // runs appear in many non-date columns.
    TypeSpec("email", Validators.emailVerdict, Validators.emailHit, 1),
    TypeSpec("url", Validators.urlVerdict, Validators.urlHit, 1),
    TypeSpec("isodate", Validators.isoDateVerdict, Validators.isoDateHit, 5),
    // Second extension pair: a valid dotted quad is selective enough
    // for the D1 threshold; money shapes (esp. the bare `1234.56`
    // missing-$ variant) collide with generic decimal columns, so it
    // takes the reference's >=5 quirk like zip/lat/long.
    TypeSpec("ipv4", Validators.ipv4Verdict, Validators.ipv4Hit, 1),
    TypeSpec("money", Validators.moneyVerdict, Validators.moneyHit, 5))

  /** [[defaultSpecs]] with each classification validator swapped for its
    * fused single-expression kernel ([[graft.expressions.SemVerdict]]) —
    * same verdicts (differential-tested in FusedVerdictSpec), but one
    * compact expression per cell instead of a wide `when`-tree, so a
    * k-column profile plans and codegens in milliseconds. Detection `hit`
    * predicates stay as the cheap when-trees. */
  val fusedSpecs: Seq[TypeSpec] = defaultSpecs.map { s =>
    s.copy(validator = c => graft.expressions.SemVerdict.verdict(c, s.semType))
  }

  /** One-job detection. Returns every (column, semType) whose hit count
    * over the first `sampleN` rows meets the type's threshold. */
  def detect(
      df: DataFrame,
      specs: Seq[TypeSpec] = defaultSpecs,
      sampleN: Int = 100,
      candidateCols: Option[Seq[String]] = None): Seq[DetectedColumn] = {
    val cols = candidateCols.getOrElse(df.schema.fieldNames.toSeq)
    if (cols.isEmpty || specs.isEmpty) return Seq.empty

    // (column, value) pairs for the sample — one explode, no per-column jobs.
    val pairs = df.limit(sampleN)
      .select(explode(array(cols.map(n =>
        struct(lit(n).as("column"), col(n).cast("string").as("value"))): _*)).as("p"))
      .select(col("p.column").as("column"), col("p.value").as("value"))

    // One conditional aggregate per semantic type, single hash-agg pass.
    val hitAggs = specs.map { s =>
      sum(when(s.hit(col("value")), 1L).otherwise(0L))
        .as(s"hits_${s.semType}")
    }
    val summary = pairs.groupBy(col("column"))
      .agg(count(lit(1)).as("sampled"), hitAggs: _*)
      .collect()

    for {
      row <- summary.toSeq
      s <- specs
      colName = row.getAs[String]("column")
      if s.nameHint.forall(_(colName))
      hits = Option(row.getAs[Any](s"hits_${s.semType}")).fold(0L)(_.asInstanceOf[Long])
      if hits >= s.threshold
    } yield DetectedColumn(colName, s.semType, hits, row.getAs[Long]("sampled"))
  }
}
