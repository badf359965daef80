package graft.profile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Semantic-type validators as pure Catalyst expression builders.
  *
  * Each validator is a `Column => Column` producing
  * `struct(code INT, norm STRING)` — the 5-code taxonomy of [[Codes]].
  * This is the Spark-first re-expression of the reference's per-cell Python
  * validators (SURVEY.md §2c, S1–S19): `when/otherwise` trees over built-in
  * string functions, so every classification is whole-stage-codegen'd and
  * runs column-at-a-time with zero (de)serialization — vs. the reference's
  * pickled row-at-a-time lambdas (`phone-number-v0.py:43-83`,
  * `check_states.py:39-57`, `zip-validate.py:34-67`, …).
  *
  * Scale notes: no UDFs, no shuffles — a validator is a projection. At
  * 100 TB the cost is exactly one codegen'd pass over the column, and
  * Parquet column pruning means only the validated columns are read.
  *
  * Documented divergences from reference defects (SURVEY.md §7 item 5):
  * the `len>5` latitude quirk, the "any value containing the letter n is
  * null" zip quirk, and the first-data-row drop are not reproduced.
  */
object Validators {

  import Codes._
  import org.apache.spark.sql.graftbridge.Bridge
  import org.apache.spark.sql.catalyst.expressions.With

  /** Evaluate each shared sub-expression exactly once (Catalyst
    * `With`/`CommonExpressionDef`; the `RewriteWithExpression` rule hoists
    * the defs into a projection below). Without this the CASE trees below
    * duplicate `regexp_replace(regexp_replace(trim(x)))` per branch —
    * Spark's automatic subexpression elimination skips conditional
    * branches, so the phone/coords verdicts generated >64 KB of bytecode
    * for one `processNext()` and janino refused to compile the stage
    * (round-2 "ERROR CodeGenerator" fallback). Defs are evaluated
    * unconditionally, so ONLY never-throwing expressions belong here
    * (string ops, regex matches) — never a bare ANSI cast.
    *
    * Each def carries its statically-known type via [[graft.expressions.Pinned]]
    * because `With` interrogates def dataTypes during analyzer passes,
    * before the Column DSL's `UnresolvedFunction`s resolve.
    */
  private def once(shared: (Column, org.apache.spark.sql.types.DataType)*)(
      body: Seq[Column] => Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{CommonExpressionDef, CommonExpressionRef}
    // Build defs/refs by hand: With.apply gives unresolved defs NullType
    // refs, which type coercion then folds into literal nulls. With the
    // pinned type on both the def and its refs, analysis sees consistent
    // types from the start.
    val defs = shared.map { case (col, dt) =>
      CommonExpressionDef(graft.expressions.Pinned(Bridge.expression(col), dt))
    }
    val refs = defs.map(d => new CommonExpressionRef(d.id, d.dataType, true))
    Bridge.column(With(Bridge.expression(body(refs.map(Bridge.column))), defs))
  }

  import org.apache.spark.sql.types.{ArrayType, BooleanType, StringType, StructField, StructType}

  private val Str = StringType
  private val Bool = BooleanType
  private val VerdictT = StructType(Seq(
    StructField("code", org.apache.spark.sql.types.IntegerType),
    StructField("norm", StringType)))
  private val CoordsT = StructType(Seq(
    StructField("code", org.apache.spark.sql.types.IntegerType),
    StructField("norm", StringType),
    StructField("lat", VerdictT),
    StructField("long", VerdictT)))

  /** Callers extract `.code` and `.norm` separately, which would clone the
    * whole CASE tree per field; publishing the struct as its own With-def
    * computes it once and hands consumers cheap field reads. */
  private def publish(v: Column, t: StructType = VerdictT): Column =
    once(v -> t) { case Seq(ref) => ref }

  private def verdict(code: Column, norm: Column): Column =
    struct(code.cast("int").as("code"), norm.as("norm"))

  private def verdict(code: Int, norm: Column): Column = verdict(lit(code), norm)

  /** Null-ish cell: SQL null, blank, or a null-marker token.
    * Reference `common_lang_functions.py:7-14` (`isNull`). */
  def isNullLike(c: Column): Column =
    c.isNull || trim(c) === "" || lower(trim(c)).isin("n/a", "na", "none", "null", "unspecified")

  /** Numeric-literal shape test (ANSI-safe guard for cast). */
  private val NumRe = "^[+-]?([0-9]+)(\\.[0-9]+)?$"
  def isNumericStr(c: Column): Column = trim(c).rlike(NumRe)

  // ---------------------------------------------------------------------
  // Phone (reference S1/S2/S3: `phone-number-v0.py:23-83`,
  // `phone-number-v1.py:63-110`)
  // ---------------------------------------------------------------------

  /** Null-like phone: blank/null marker, or an all-repeated-digit sentinel
    * such as `999-999-9999` (reference `checkForNull`,
    * `phone-number-v0.py:23-40`). */
  def phoneNullLike(c: Column): Column = {
    val digits = regexp_replace(c.cast("string"), "[^0-9]", "")
    isNullLike(c) ||
      (length(digits) >= lit(5) && digits.rlike("^([0-9])\\1*$"))
  }

  /** Regex/NANP phone validator (reference v0 semantics,
    * `phone-number-v0.py:43-83`):
    *  - 4 null-like;
    *  - 5 leading alpha, or digit count outside [5,15], or a bare 10/11
    *    digit string violating NANP positional rules (area code/exchange
    *    must not start 0/1) — phone-shaped but not a real number;
    *  - 1 E.164-valid (with `+`), or bare NANP digits (valid after the
    *    reference's `+1` retry, `phone-number-v0.py:71-81`) when the raw
    *    form is already punctuation-free;
    *  - 2 same validity but the raw form carries formatting chars
    *    (`(201) 334-7135`) — valid value, non-canonical format;
    *  - 3 otherwise (e.g. `+1` with a non-NANP body).
    * Normalized form is E.164.
    */
  def phoneVerdict(c: Column): Column = phoneVerdictImpl(c, areaCodes = None)

  /** Dictionary-backed variant (reference v1, `phone-number-v1.py:63-110`,
    * which calls the `phonenumbers` lib): additionally requires the NANP
    * area code to exist in a known-area-code dimension; unknown area code
    * → 5. The dimension is a literal broadcast (`isin`) — SURVEY.md S3. */
  def phoneVerdictV1(c: Column): Column =
    phoneVerdictImpl(c, areaCodes = Some(Dicts.NycAreaCodes))

  /** Same, with the area-code dimension supplied by the caller — q17
    * sources it from the `zips.json` JSON side-input (ZipDim), the
    * reference's actual dataflow. */
  def phoneVerdictV1(c: Column, areaCodes: Seq[String]): Column =
    phoneVerdictImpl(c, areaCodes = Some(areaCodes))

  private def phoneVerdictImpl(c: Column, areaCodes: Option[Seq[String]]): Column = {
    val str = c.cast("string")
    once(trim(str) -> Str, regexp_replace(str, "[^0-9]", "") -> Str) { case Seq(s, digitsAll) =>
    once(regexp_replace(s, "[^0-9+]", "") -> Str) { case Seq(cleaned) =>  // digits and +
    once(regexp_replace(cleaned, "\\+", "") -> Str) { case Seq(digits) =>
    once(digits.rlike("^[2-9][0-9]{2}[2-9][0-9]{6}$") -> Bool,
         digits.rlike("^1[2-9][0-9]{2}[2-9][0-9]{6}$") -> Bool) { case Seq(nanp10, nanp11) =>
      val area = when(nanp10, substring(digits, 1, 3))
        .when(nanp11, substring(digits, 2, 3))
      val areaKnownExpr = areaCodes match {
        case Some(codes) => area.isin(codes.map(x => x: Any): _*)
        case None        => area.isNotNull
      }
      val normExpr = when(digits.startsWith("1") && nanp11, concat(lit("+"), digits))
        .when(nanp10, concat(lit("+1"), digits))
        .when(cleaned.startsWith("+"), concat(lit("+"), digits))
        .otherwise(digits)
      once(areaKnownExpr -> Bool, normExpr -> Str) { case Seq(areaKnown, norm) =>
        val nullLike = c.isNull || s === "" ||
          lower(s).isin("n/a", "na", "none", "null", "unspecified") ||
          (length(digitsAll) >= lit(5) && digitsAll.rlike("^([0-9])\\1*$"))
        val hasPlus = cleaned.startsWith("+")
        val nd = length(digits)
        val hasFormatting = s =!= cleaned                // any punctuation/space
        val e164Intl = digits.rlike("^[2-9][0-9]{7,14}$") // non-NANP country
        val validNanp = (nanp10 || nanp11) && areaKnown
        // bare NANP-shaped-but-invalid digits -> 5 (plausible); an explicit
        // `+`-prefixed claim that fails validation -> 3 (invalid)
        val plausibleNanp =
          !hasPlus && (nd === 10 || (nd === 11 && digits.startsWith("1"))) && !validNanp
        val valid = when(hasPlus,
            when(digits.startsWith("1"), nanp11 && areaKnown).otherwise(e164Intl))
          .otherwise(validNanp)
        publish(when(nullLike, verdict(NullLike, lit("")))
          .when(s.rlike("^[A-Za-z]"), verdict(Plausible, s))
          .when(nd < 5 || nd > 15, verdict(Plausible, digits))
          .when(valid && !hasFormatting, verdict(Valid, norm))
          .when(valid && hasFormatting, verdict(ValidBadFormat, norm))
          // NANP-shaped with an unknown area code (v1 dict variant): plausible
          // but not a real number — reference v1's `phonenumbers` "invalid
          // number" outcome (`phone-number-v1.py:88-99`).
          .when((nanp10 || nanp11) && !areaKnown, verdict(Plausible, digits))
          .when(plausibleNanp, verdict(Plausible, digits))
          .otherwise(verdict(Invalid, digits)))
      }
    } } } }
  }

  // ---------------------------------------------------------------------
  // US state (reference S5–S10: `check_states.py:15-57`,
  // `common_lang_functions.py`, dicts `constants.py:13-36`)
  // ---------------------------------------------------------------------

  private def anySeq(xs: Seq[String]): Seq[Any] = xs.map(x => x: Any)

  /** State validator:
    * 4 null-like; 1 exact Title-Case name; 2 fixable (leading/trailing
    * space, wrong capitalization, USPS acronym, AP abbreviation);
    * 3 otherwise. Normalized: canonical Title-Case name, or the cleaned
    * upper-case acronym. */
  def stateVerdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str) { case Seq(t) =>
    once(initcap(lower(t)) -> Str, translate(t, ". ", "") -> Str) { case Seq(titled, cleanedBase) =>
    val cleanedUp = upper(cleanedBase)                   // strip dots+spaces
    val cleanedLo = lower(cleanedBase)
    val inNames = titled.isin(anySeq(Dicts.StateNames): _*)
    val isAcronym = cleanedUp.isin(anySeq(Dicts.StateAcronyms): _*)
    val isAbbrev = cleanedLo.isin(anySeq(Dicts.StateAbbrevs): _*)
    publish(when(isNullLike(c), verdict(NullLike, lit("")))
      .when(s.isin(anySeq(Dicts.StateNames): _*), verdict(Valid, s))
      .when(inNames, verdict(ValidBadFormat, titled))    // spacing / caps
      .when(isAcronym, verdict(ValidBadFormat, cleanedUp))
      .when(isAbbrev, verdict(ValidBadFormat, cleanedLo))
      .otherwise(verdict(Invalid, t)))
    } }
  }

  // ---------------------------------------------------------------------
  // NYC borough (reference S11–S13: `check_boros.py:13-42`,
  // dicts `constants.py:8-10`)
  // ---------------------------------------------------------------------

  def boroVerdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str) { case Seq(t) =>
      once(initcap(lower(t)) -> Str) { case Seq(titled) =>
        val inNames = titled.isin(anySeq(Dicts.BoroNames): _*)
        val isAbbrev = t.isin(anySeq(Dicts.BoroAbbrevs): _*)
        publish(when(isNullLike(c), verdict(NullLike, lit("")))
          .when(s.isin(anySeq(Dicts.BoroNames): _*), verdict(Valid, s))
          .when(inNames, verdict(ValidBadFormat, titled))
          .when(isAbbrev, verdict(ValidBadFormat, titled))   // e.g. `Bx`
          .otherwise(verdict(Invalid, t)))
      }
    }
  }

  // ---------------------------------------------------------------------
  // Latitude / longitude (reference S14–S16:
  // `latlong-validate.py:29-62`, `coords-validate.py:25-73`)
  // ---------------------------------------------------------------------

  /** One lat or long value. `maxAbs` = 90 (lat) or 180 (long).
    * `outOfRangeCode` preserves the reference's deliberate difference:
    * 5 for standalone columns (`latlong-validate.py:51-55`), 3 inside a
    * coordinate pair (`coords-validate.py:66` comment). */
  def latLongVerdict(c: Column, maxAbs: Double, outOfRangeCode: Int = Plausible): Column =
    once(trim(c.cast("string")) -> Str) { case Seq(t) =>
      once(trim(regexp_replace(t, "[NSEWnsew°]", "")) -> Str) { case Seq(stripped) =>
        val isNum = t.rlike(NumRe)
        val strippedNum = stripped.rlike(NumRe)
        // casts only evaluate on regex-validated rows (CaseWhen laziness) —
        // safe under ANSI mode.
        val inRange = abs(stripped.cast("double")) <= lit(maxAbs)
        publish(when(isNullLike(c), verdict(NullLike, lit("")))
          .when(isNum && inRange, verdict(Valid, t))
          .when(isNum, verdict(outOfRangeCode, t))
          .when(strippedNum && inRange, verdict(ValidBadFormat, stripped))
          .when(strippedNum, verdict(Invalid, stripped))
          .otherwise(verdict(Invalid, t)))
      }
    }

  def latVerdict(c: Column): Column = latLongVerdict(c, 90.0)
  def longVerdict(c: Column): Column = latLongVerdict(c, 180.0)

  /** Coordinate-pair validator (reference S17, `coords-validate.py:34-48`):
    * strips wrapping brackets/whitespace, splits on comma-or-space into a
    * (lat, long) pair and validates each half (out-of-range → 3);
    * 4 null-like; a 4–5 digit-fragment blob → 2; else 3.
    * Result: `struct(code, norm, lat struct, long struct)`. */
  def coordsVerdict(c: Column): Column =
    once(trim(regexp_replace(c.cast("string"), "[\\[\\](){}]", "")) -> Str) { case Seq(t) =>
      once(split(t, "\\s*[,;]\\s*|\\s+") -> ArrayType(StringType)) { case Seq(parts) =>
        // The half-verdicts are With-defs: evaluated once per row even for
        // non-pair rows (safe — latLongVerdict never throws; its cast is
        // regex-guarded), referenced from three branches below.
        once(latLongVerdict(get(parts, lit(0)), 90.0, Invalid) -> VerdictT,
             latLongVerdict(get(parts, lit(1)), 180.0, Invalid) -> VerdictT) { case Seq(latV, lonV) =>
          val two = size(parts) === 2
          val halvesOk = latV.getField("code").isin(Valid, ValidBadFormat) &&
            lonV.getField("code").isin(Valid, ValidBadFormat)
          val nFrags = size(split(t, "[^0-9.+-]+"))
          val empty = verdict(0, lit("")) // placeholder halves for non-pair rows
          publish(when(isNullLike(c), struct(lit(NullLike).as("code"), lit("").as("norm"), empty.as("lat"), empty.as("long")))
            .when(two && halvesOk,
              struct(lit(Valid).as("code"), t.as("norm"), latV.as("lat"), lonV.as("long")))
            .when(two,
              struct(lit(Invalid).as("code"), t.as("norm"), latV.as("lat"), lonV.as("long")))
            .when(nFrags.between(4, 5),
              struct(lit(ValidBadFormat).as("code"), t.as("norm"), empty.as("lat"), empty.as("long")))
            .otherwise(
              struct(lit(Invalid).as("code"), t.as("norm"), empty.as("lat"), empty.as("long"))),
            CoordsT)
        }
      }
    }

  // ---------------------------------------------------------------------
  // Zip (reference S18/S19: `quick-zip.py:36-49`, `zip-validate.py:34-67`)
  // ---------------------------------------------------------------------

  /** Format-only zip check (reference `quick-zip.py` — the deliberately
    * fast low-accuracy tier, SURVEY.md §4):
    * 4 null-like; 1 exactly 5 digits or `#####-####`; 2 nine digits
    * missing the hyphen (normalized by inserting it); 3 otherwise. */
  def zipQuickVerdict(c: Column): Column =
    once(trim(c.cast("string")) -> Str) { case Seq(t) =>
      once(regexp_replace(t, "[^0-9]", "") -> Str) { case Seq(digits) =>
        val hyphen9 = concat(substring(digits, 1, 5), lit("-"), substring(digits, 6, 4))
        publish(when(isNullLike(c), verdict(NullLike, lit("")))
          .when(t.rlike("^[0-9]{5}$"), verdict(Valid, t))
          .when(t.rlike("^[0-9]{5}-[0-9]{4}$"), verdict(Valid, t))
          .when(t.rlike("^[0-9]{9}$"), verdict(ValidBadFormat, hyphen9))
          .otherwise(verdict(Invalid, t)))
      }
    }

  /** Dictionary-validated zip (reference `zip-validate.py` — the accurate
    * tier whose per-cell linear scan over 42,632 entries produced the
    * 4–11 rows/sec baseline, BASELINE.md): same format cascade, but
    * format-valid zips whose 5-digit prefix is not a registered zip → 5.
    * Membership compiles to a broadcast literal set probe — O(1)/row. */
  def zipDictVerdict(c: Column, zips: Seq[String] = Dicts.NycZips): Column =
    once(trim(c.cast("string")) -> Str) { case Seq(t) =>
      once(regexp_replace(t, "[^0-9]", "") -> Str) { case Seq(digits) =>
        once(substring(digits, 1, 5).isin(anySeq(zips): _*) -> Bool) { case Seq(known) =>
          val five = substring(digits, 1, 5)
          val hyphen9 = concat(substring(digits, 1, 5), lit("-"), substring(digits, 6, 4))
          publish(when(isNullLike(c), verdict(NullLike, lit("")))
            .when(t.rlike("^[0-9]{5}$") && known, verdict(Valid, t))
            .when(t.rlike("^[0-9]{5}-[0-9]{4}$") && known, verdict(Valid, t))
            .when(t.rlike("^[0-9]{9}$") && known, verdict(ValidBadFormat, hyphen9))
            .when(t.rlike("^[0-9]{5}$") || t.rlike("^[0-9]{5}-[0-9]{4}$") || t.rlike("^[0-9]{9}$"),
              verdict(Plausible, five))
            .otherwise(verdict(Invalid, t)))
        }
      }
    }

  /** Detection indicator (reference `checkValid`,
    * `phone-number-v0.py:86-91`): codes 1 and 2 count as hits. */
  def isHit(verdictCol: Column): Column =
    verdictCol.getField("code").isin(Valid, ValidBadFormat)

  // ---------------------------------------------------------------------
  // Hit predicates: small boolean trees equivalent to `code IN (1,2)` of
  // the corresponding verdict, used by detection. The full verdict trees
  // (struct + normalization branches) cost seconds of Catalyst analysis /
  // codegen when 7 of them land in one detection aggregate; these stay
  // tiny because they skip codes 3/4/5 and normalization entirely.
  // ---------------------------------------------------------------------

  def phoneHit(c: Column): Column = {
    val s = trim(c.cast("string"))
    val cleaned = regexp_replace(s, "[^0-9+]", "")
    val digits = regexp_replace(cleaned, "\\+", "")
    val hasPlus = cleaned.startsWith("+")
    val nanp10 = digits.rlike("^[2-9][0-9]{2}[2-9][0-9]{6}$")
    val nanp11 = digits.rlike("^1[2-9][0-9]{2}[2-9][0-9]{6}$")
    val e164Intl = digits.rlike("^[2-9][0-9]{7,14}$")
    !phoneNullLike(c) && !s.rlike("^[A-Za-z]") &&
      when(hasPlus, when(digits.startsWith("1"), nanp11).otherwise(e164Intl))
        .otherwise(nanp10 || nanp11)
  }

  def stateHit(c: Column): Column = {
    val t = trim(c.cast("string"))
    initcap(lower(t)).isin(anySeq(Dicts.StateNames): _*) ||
      upper(translate(t, ". ", "")).isin(anySeq(Dicts.StateAcronyms): _*) ||
      lower(translate(t, ". ", "")).isin(anySeq(Dicts.StateAbbrevs): _*)
  }

  def boroHit(c: Column): Column = {
    val t = trim(c.cast("string"))
    initcap(lower(t)).isin(anySeq(Dicts.BoroNames): _*) ||
      t.isin(anySeq(Dicts.BoroAbbrevs): _*)
  }

  def zipDictHit(c: Column, zips: Seq[String] = Dicts.NycZips): Column = {
    val t = trim(c.cast("string"))
    t.rlike("^[0-9]{5}(-[0-9]{4})?$|^[0-9]{9}$") &&
      substring(regexp_replace(t, "[^0-9]", ""), 1, 5).isin(anySeq(zips): _*)
  }

  /** Range check via pure regex — under ANSI + codegen subexpression
    * elimination a guarded `cast` can still be hoisted and evaluated on
    * non-numeric rows; a regex can't fail. */
  def latLongHit(c: Column, maxAbs: Double): Column = {
    val t = trim(c.cast("string"))
    val stripped = trim(regexp_replace(t, "[NSEWnsew°]", ""))
    !isNullLike(c) && stripped.rlike(rangeRe(maxAbs.toInt))
  }

  /** Numeric-literal-in-[-max,max] as a regex (cast-free, ANSI-proof). */
  private def rangeRe(maxAbs: Int): String = maxAbs match {
    case 90  => "^[+-]?0*(([0-8]?[0-9])(\\.[0-9]+)?|90(\\.0+)?)$"
    case 180 => "^[+-]?0*((1[0-7][0-9]|[0-9]{1,2})(\\.[0-9]+)?|180(\\.0+)?)$"
    case m   => sys.error(s"unsupported range bound $m")
  }

  def coordsHit(c: Column): Column = {
    val t = trim(regexp_replace(c.cast("string"), "[\\[\\](){}]", ""))
    val parts = split(t, "\\s*[,;]\\s*|\\s+")
    def half(e: Column, maxAbs: Double): Column =
      trim(regexp_replace(e, "[NSEWnsew°]", "")).rlike(rangeRe(maxAbs.toInt))
    val nFrags = size(split(t, "[^0-9.+-]+"))
    val two = size(parts) === 2
    !isNullLike(c) &&
      when(two, half(get(parts, lit(0)), 90.0) && half(get(parts, lit(1)), 180.0))
        .otherwise(nFrags.between(4, 5)) // S17 digit-fragment blob -> code 2
  }

  // ---------------------------------------------------------------------
  // Email / URL / ISO date — engine extensions (VERDICT r9 item 5): the
  // reference's pluggable semantic-type architecture
  // (`phone-numbers/README.md:19`) applied to the types a real NYC-CSV
  // profiling run hits next (`latlong-validate.py:13` imports `datetime`
  // without using it — the authors wanted dates). Same 5-code taxonomy;
  // the dictionary-membership move (S19's zip dict, S3's area codes)
  // recurs as a known-TLD allowlist: shape-valid on an unknown TLD is
  // code 5, "plausible but not a real instance".
  // ---------------------------------------------------------------------

  private val EmailShapeRe = "^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$"

  /** Email: 4 null-like; 1 canonical (already lowercase, no padding) on a
    * known TLD; 2 same value, fixable format (case / surrounding space);
    * 5 shape-valid on an unknown TLD; 3 otherwise. Norm = lowercased
    * trimmed form ('' for null-like, trimmed raw for code 3). */
  def emailVerdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str, lower(trim(s)) -> Str) { case Seq(t, l) =>
      val shape = l.rlike(EmailShapeRe)
      val tld = regexp_extract(l, "\\.([a-z]{2,})$", 1)
      val known = tld.isin(anySeq(Dicts.KnownTlds): _*)
      publish(when(isNullLike(c), verdict(NullLike, lit("")))
        .when(shape && known,
          when(s === l, verdict(Valid, l))
            .otherwise(verdict(ValidBadFormat, l)))
        .when(shape, verdict(Plausible, l))
        .otherwise(verdict(Invalid, t)))
    }
  }

  // Host must end in a dot + alpha TLD; optional port; path/query = any
  // printable non-space ASCII after / or ?. Classification runs on the
  // LOWERCASED trimmed value (norm lowercases the whole URL — a profiler
  // normalization for matching, not dereferencing).
  private val UrlSchemeRe =
    "^https?://[a-z0-9.-]+\\.[a-z]{2,}(:[0-9]{1,5})?([/?][!-~]*)?$"
  private val UrlNoSchemeRe =
    "^[a-z0-9.-]+\\.[a-z]{2,}(:[0-9]{1,5})?([/?][!-~]*)?$"
  private val UrlTldRe =
    "^(?:https?://)?[a-z0-9.-]*\\.([a-z]{2,})(?::[0-9]{1,5})?(?:[/?][!-~]*)?$"

  /** URL: 4 null-like; 1 canonical scheme'd URL on a known TLD; 2 fixable
    * (uppercase/padding, or scheme missing — norm prepends `https://`);
    * 5 shape-valid on an unknown TLD; 3 otherwise. */
  def urlVerdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str, lower(trim(s)) -> Str) { case Seq(t, l) =>
      val withScheme = l.rlike(UrlSchemeRe)
      val noScheme = l.rlike(UrlNoSchemeRe)
      val tld = regexp_extract(l, UrlTldRe, 1)
      val known = tld.isin(anySeq(Dicts.KnownTlds): _*)
      publish(when(isNullLike(c), verdict(NullLike, lit("")))
        .when(withScheme && known,
          when(s === l, verdict(Valid, l))
            .otherwise(verdict(ValidBadFormat, l)))
        .when(noScheme && known,
          verdict(ValidBadFormat, concat(lit("https://"), l)))
        .when(withScheme, verdict(Plausible, l))
        .when(noScheme, verdict(Plausible, concat(lit("https://"), l)))
        .otherwise(verdict(Invalid, t)))
    }
  }

  /** True iff (y, m, d) name a real Gregorian calendar date (leap rule
    * included). Inputs are ints parsed from shape-checked digit runs, so
    * the ANSI casts upstream cannot throw. */
  private def realDate(y: Column, m: Column, d: Column): Column = {
    val leap = (y % 4 === 0 && y % 100 =!= 0) || (y % 400 === 0)
    val dim = when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
      .when(m.isin(4, 6, 9, 11), 30)
      .when(m === 2, when(leap, 29).otherwise(28))
      .otherwise(0)
    m.between(1, 12) && d.between(1, dim)
  }

  /** ISO date: 4 null-like; 1 `yyyy-mm-dd` naming a real date; 2 a real
    * date in a fixable format (`mm/dd/yyyy` US or `yyyymmdd` basic —
    * norm converts to extended ISO); 5 date-shaped but not a real date
    * (month 13, Feb 29 off-leap); 3 otherwise. Casts are guarded by the
    * shape regexes (ANSI-safe). */
  def isoDateVerdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str) { case Seq(t) =>
      val isoShape = t.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$")
      val usShape = t.rlike("^[0-9]{2}/[0-9]{2}/[0-9]{4}$")
      val basicShape = t.rlike("^[0-9]{8}$")
      def real(y: Column, m: Column, d: Column): Column =
        realDate(y.cast("int"), m.cast("int"), d.cast("int"))
      def isoOf(y: Column, m: Column, d: Column): Column =
        concat(y, lit("-"), m, lit("-"), d)
      publish(when(isNullLike(c), verdict(NullLike, lit("")))
        .when(isoShape, {
          val (y, m, d) = (substring(t, 1, 4), substring(t, 6, 2), substring(t, 9, 2))
          when(real(y, m, d), verdict(Valid, t))
            .otherwise(verdict(Plausible, t))
        })
        .when(usShape, {
          val (m, d, y) = (substring(t, 1, 2), substring(t, 4, 2), substring(t, 7, 4))
          when(real(y, m, d), verdict(ValidBadFormat, isoOf(y, m, d)))
            .otherwise(verdict(Plausible, t))
        })
        .when(basicShape, {
          val (y, m, d) = (substring(t, 1, 4), substring(t, 5, 2), substring(t, 7, 2))
          when(real(y, m, d), verdict(ValidBadFormat, isoOf(y, m, d)))
            .otherwise(verdict(Plausible, t))
        })
        .otherwise(verdict(Invalid, t)))
    }
  }

  def emailHit(c: Column): Column = {
    val l = lower(trim(c.cast("string")))
    !isNullLike(c) && l.rlike(EmailShapeRe) &&
      regexp_extract(l, "\\.([a-z]{2,})$", 1).isin(anySeq(Dicts.KnownTlds): _*)
  }

  def urlHit(c: Column): Column = {
    val l = lower(trim(c.cast("string")))
    !isNullLike(c) && (l.rlike(UrlSchemeRe) || l.rlike(UrlNoSchemeRe)) &&
      regexp_extract(l, UrlTldRe, 1).isin(anySeq(Dicts.KnownTlds): _*)
  }

  def isoDateHit(c: Column): Column = {
    val t = trim(c.cast("string"))
    def real(y: Column, m: Column, d: Column): Column =
      realDate(y.cast("int"), m.cast("int"), d.cast("int"))
    !isNullLike(c) && (
      when(t.rlike("^[0-9]{4}-[0-9]{2}-[0-9]{2}$"),
          real(substring(t, 1, 4), substring(t, 6, 2), substring(t, 9, 2)))
        .when(t.rlike("^[0-9]{2}/[0-9]{2}/[0-9]{4}$"),
          real(substring(t, 7, 4), substring(t, 1, 2), substring(t, 4, 2)))
        .when(t.rlike("^[0-9]{8}$"),
          real(substring(t, 1, 4), substring(t, 5, 2), substring(t, 7, 2)))
        .otherwise(lit(false)))
  }

  private val Ipv4ShapeRe = "^[0-9]{1,3}(\\.[0-9]{1,3}){3}$"

  /** IPv4: 4 null-like; 1 canonical dotted quad (no leading zeros, no
    * padding); 2 same address, fixable format (leading zeros / padding —
    * norm re-joins the parsed octets); 5 dotted-quad shape with an
    * octet > 255 (shaped but impossible, the isodate month-13
    * convention); 3 otherwise. Octet casts are guarded by the shape
    * regex (ANSI-safe — ≤ 3 digits each). */
  def ipv4Verdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str) { case Seq(t) =>
      val shape = t.rlike(Ipv4ShapeRe)
      def oct(i: Int): Column = get(split(t, "\\."), lit(i)).cast("int")
      publish(when(isNullLike(c), verdict(NullLike, lit("")))
        .when(shape, {
          val valid = (0 to 3).map(i => oct(i) <= 255).reduce(_ && _)
          val canonical = concat_ws(".",
            (0 to 3).map(i => oct(i).cast("string")): _*)
          when(valid && s === t && t === canonical, verdict(Valid, t))
            .when(valid, verdict(ValidBadFormat, canonical))
            .otherwise(verdict(Plausible, t))
        })
        .otherwise(verdict(Invalid, t)))
    }
  }

  def ipv4Hit(c: Column): Column = {
    val t = trim(c.cast("string"))
    def oct(i: Int): Column = get(split(t, "\\."), lit(i)).cast("int")
    !isNullLike(c) &&
      when(t.rlike(Ipv4ShapeRe),
        (0 to 3).map(i => oct(i) <= 255).reduce(_ && _))
      .otherwise(lit(false))
  }

  private val MoneyCanonRe = "^\\$(0|[1-9][0-9]*)\\.[0-9]{2}$"
  private val MoneyCommaRe = "^\\$[1-9][0-9]{0,2}(,[0-9]{3})+\\.[0-9]{2}$"
  private val MoneyNoDollarRe = "^(0|[1-9][0-9]*)(,[0-9]{3})*\\.[0-9]{2}$"
  private val MoneyIshRe = "^\\$?[0-9][0-9,]*(\\.[0-9]+)?$"

  /** Money amount: 4 null-like; 1 canonical `$123.45` (no commas, no
    * padding); 2 same amount, fixable format (thousands commas /
    * missing `$` / padding — norm is the canonical form); 5 money-
    * shaped but off-convention decimals (`$12.3`, `$1.2345`) or bare
    * comma-grouped integers; 3 otherwise. */
  def moneyVerdict(c: Column): Column = {
    val s = c.cast("string")
    once(trim(s) -> Str) { case Seq(t) =>
      val canonNorm = concat(lit("$"),
        regexp_replace(regexp_replace(t, ",", ""), "^\\$", ""))
      publish(when(isNullLike(c), verdict(NullLike, lit("")))
        .when(t.rlike(MoneyCanonRe),
          when(s === t, verdict(Valid, t))
            .otherwise(verdict(ValidBadFormat, t)))
        .when(t.rlike(MoneyCommaRe) || t.rlike(MoneyNoDollarRe),
          verdict(ValidBadFormat, canonNorm))
        .when(t.rlike(MoneyIshRe), verdict(Plausible, t))
        .otherwise(verdict(Invalid, t)))
    }
  }

  def moneyHit(c: Column): Column = {
    val t = trim(c.cast("string"))
    !isNullLike(c) && (t.rlike(MoneyCanonRe) || t.rlike(MoneyCommaRe) ||
      t.rlike(MoneyNoDollarRe))
  }

  /** All named scalar validators, for the generic detector/profiler. */
  val all: Map[String, Column => Column] = Map(
    "phone" -> phoneVerdict _,
    "phone_v1" -> phoneVerdictV1 _,
    "state" -> stateVerdict _,
    "boro" -> boroVerdict _,
    "lat" -> latVerdict _,
    "long" -> longVerdict _,
    "coords" -> (c => {
      val v = coordsVerdict(c)
      struct(v.getField("code").as("code"), v.getField("norm").as("norm"))
    }),
    "zip_quick" -> zipQuickVerdict _,
    "zip" -> (c => zipDictVerdict(c)),
    "email" -> emailVerdict _,
    "url" -> urlVerdict _,
    "isodate" -> isoDateVerdict _,
    "ipv4" -> ipv4Verdict _,
    "money" -> moneyVerdict _)
}
