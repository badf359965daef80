package graft.profile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Config-driven pluggable semantic types — the reference's promise of
  * pluggable semantic-type validators (`phone-numbers/README.md:19`)
  * exposed as a USER API instead of a hard-wired list (VERDICT r10
  * item 6): a new type is a declarative [[RegexType]] (or a full
  * [[Detector.TypeSpec]]) registered at session setup; detection
  * ([[Detector.detect]]), classification ([[Profiler.verdicts]]) and
  * the CLI ([[graft.ProfileMain]], which reads [[allFused]]) consume
  * defaults + extensions uniformly. Nothing in Detector / Profiler /
  * Validators needs editing — the UUID type below exists purely through
  * this seam, and q285/q286 gate it end to end.
  */
object TypeRegistry {

  /** Declarative regex-cascade type: the suite's standard verdict-code
    * contract (SURVEY §2c) from a handful of config fields —
    *
    *   - 1 valid: matches `validRe`; norm = `normalizeValid`;
    *   - 2 fixable: matches `fixableRe`; norm = `fix`;
    *   - 4 null-like (the shared null dictionary); norm = "";
    *   - 5 matches nothing; norm = the trimmed raw.
    *
    * Both regexes must stay inside the RE2 ∩ Java-regex intersection the
    * suite's other validators use (no lookarounds/backrefs), so a DuckDB
    * oracle can replay a registered type bit-for-bit — q285 does.
    */
  final case class RegexType(
      semType: String,
      validRe: String,
      normalizeValid: Column => Column = identity,
      fixableRe: Option[String] = None,
      fix: Column => Column = identity,
      threshold: Long = 1,
      nameHint: Option[String => Boolean] = None) {

    def toSpec: Detector.TypeSpec = {
      val fixable: Column => Column = t =>
        fixableRe.map(re => t.rlike(re)).getOrElse(lit(false))
      val validator: Column => Column = c => {
        val t = trim(c.cast("string"))
        struct(
          when(Validators.isNullLike(c), 4)
            .when(t.rlike(validRe), 1)
            .when(fixable(t), 2)
            .otherwise(5).cast("int").as("code"),
          when(Validators.isNullLike(c), lit(""))
            .when(t.rlike(validRe), normalizeValid(t))
            .when(fixable(t), fix(t))
            .otherwise(t).as("norm"))
      }
      val hit: Column => Column = c => {
        val t = trim(c.cast("string"))
        c.isNotNull && !Validators.isNullLike(c) &&
          (t.rlike(validRe) || fixable(t))
      }
      Detector.TypeSpec(semType, validator, hit, threshold, nameHint)
    }
  }

  @volatile private var extra: Vector[Detector.TypeSpec] = Vector.empty

  /** Register a full TypeSpec (maximum control: custom when-tree or a
    * fused kernel). Rejects a semType that already exists — silently
    * shadowing a built-in would change verdicts underfoot. */
  def register(spec: Detector.TypeSpec): Unit = synchronized {
    require(!all.exists(_.semType == spec.semType),
      s"semantic type '${spec.semType}' already registered")
    extra = extra :+ spec
  }

  /** Register a declarative regex type. */
  def register(rt: RegexType): Unit = register(rt.toSpec)

  /** Test hook: drop all registrations. */
  private[graft] def clear(): Unit = synchronized { extra = Vector.empty }

  /** Remove one registered extension type (built-ins are not removable).
    * No-op if the type is absent — callers use this in `finally` blocks
    * to scope a registration to one profiling run (ADVICE r12: a
    * register-and-leave pattern made every later profiling pass run
    * with an enlarged detector set, i.e. order-dependent results). */
  def unregister(semType: String): Unit = synchronized {
    extra = extra.filterNot(_.semType == semType)
  }

  def registered: Seq[Detector.TypeSpec] = extra

  /** Built-ins (when-tree validators) + registered extensions. */
  def all: Seq[Detector.TypeSpec] = Detector.defaultSpecs ++ extra

  /** Fused built-ins + registered extensions — the production set the
    * CLI consumes. Registered types keep their config-built when-trees
    * (they have no fused kernel; a power user can register a TypeSpec
    * whose validator IS a custom Expression). */
  def allFused: Seq[Detector.TypeSpec] = Detector.fusedSpecs ++ extra

  /** UUID (RFC-4122 textual form), defined PURELY declaratively — the
    * proof the extension seam works without touching engine code:
    * 1 = canonical 8-4-4-4-12 (norm lowercases), 2 = bare 32-hex (norm
    * inserts the dashes, lowercased), 4/5 standard. */
  val uuid: RegexType = RegexType(
    semType = "uuid",
    validRe = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
      "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    normalizeValid = lower,
    fixableRe = Some("^[0-9a-fA-F]{32}$"),
    fix = t => lower(concat_ws("-",
      substring(t, 1, 8), substring(t, 9, 4), substring(t, 13, 4),
      substring(t, 17, 4), substring(t, 21, 12))))
}
