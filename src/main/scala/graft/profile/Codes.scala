package graft.profile

/** The 5-code cell-quality taxonomy of the reference profiler.
  *
  * Reference: codes documented at
  * `phone-numbers/scripts/phone-number-v0.py:16-21`,
  * `zip-lat-long-coords/scripts/zip-validate.py:20-25` (see SURVEY.md §0).
  *
  *  - 1 valid
  *  - 2 valid value, invalid format (mechanically fixable — e.g. missing
  *    `+1`, ALL-CAPS borough, 9-digit zip missing its hyphen)
  *  - 3 invalid / semantic outlier (not this type at all)
  *  - 4 null (true null, `N/A`, blank, or null-like sentinel such as
  *    `999-999-9999`)
  *  - 5 semantically plausible but not a real instance (phone shape with a
  *    nonexistent area code; 5 digits that are not a registered zip)
  */
object Codes {
  val Valid: Int = 1
  val ValidBadFormat: Int = 2
  val Invalid: Int = 3
  val NullLike: Int = 4
  val Plausible: Int = 5
}

/** One classified cell. The engine's canonical profiling record
  * (reference emits python-repr tuples `(col,(row,code,value))` via
  * `saveAsTextFile`; we emit a typed Dataset — SURVEY.md §1).
  */
case class CellVerdict(rowId: Long, column: String, semType: String, code: Int, raw: String, normalized: String)

/** Per-(column, semType) detection result. */
case class DetectedColumn(column: String, semType: String, hits: Long, sampled: Long)
