package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** String-similarity kernels beyond Spark's built-ins (levenshtein is
  * native; Jaro–Winkler is not). Same design as [[SemKernels]]: a
  * plain-Scala kernel reached from a tiny codegen'd [[Expression]] —
  * whole-stage codegen keeps the call inlined in the generated loop,
  * and the kernel compiles once instead of a giant Catalyst tree.
  *
  * The formulation is the standard Winkler variant (the one DuckDB's
  * `jaro_winkler_similarity` implements, which the q318 oracle runs):
  * match window ⌊max(|a|,|b|)/2⌋−1, transpositions t = half the
  * out-of-order matches, jaro = (m/|a| + m/|b| + (m−t)/m)/3, and the
  * prefix boost jw = j + ℓ·0.1·(1−j) applied only when j exceeds the
  * 0.7 threshold, ℓ = common prefix capped at 4. Gate outputs round to
  * 4 decimals — far above double-noise between the two engines'
  * evaluation orders, fine enough to separate real ranking ties.
  */
object StringSimKernels {

  /** Jaro similarity in doubles (exact rational arithmetic until the
    * final three divisions). Operates on code points? No — on UTF-16
    * chars, which equals byte/codepoint semantics for the ASCII
    * fixtures both engines see (documented scope). */
  def jaro(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (!found && j <= hi) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true
          bMatch(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: matched chars of a vs matched chars of b, in order
    var t2 = 0 // twice the transposition count
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t2 += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    (md / la + md / lb + (md - t2 / 2) / md) / 3.0
  }

  /** Winkler boost on [[jaro]]: prefix scale 0.1, max prefix 4, boost
    * threshold 0.7 (the DuckDB/standard parameters). */
  def jaroWinkler(a: UTF8String, b: UTF8String): Double = {
    if (a == null || b == null) return 0.0
    val sa = a.toString
    val sb = b.toString
    val j = jaro(sa, sb)
    if (j <= 0.7) return j
    var l = 0
    val cap = math.min(4, math.min(sa.length, sb.length))
    while (l < cap && sa.charAt(l) == sb.charAt(l)) l += 1
    j + l * 0.1 * (1.0 - j)
  }
}

/** `jaro_winkler(a, b)` → double in [0, 1]; null if either side is
  * null (standard binary-expression null semantics). */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringSimKernels.jaroWinkler(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.StringSimKernels.jaroWinkler($a, $b);")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.graftbridge.Bridge

  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(
      Bridge.expression(a.cast("string")), Bridge.expression(b.cast("string"))))
}
