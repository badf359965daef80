package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the sliced-vector (MaxSim) and n-gram-overlap
  * families — round-18 optimization (guide §4: eliminate interpreted
  * higher-order lambdas in the hot path; guide §2.3: aggregate before
  * you shuffle).
  *
  * The MaxSim scorer (q370/q381/q383's `subCos`) evaluated, per
  * (query, doc) pair, an `explode(sequence(0,3))` row fan-out and then
  * `array_max(transform(sequence(0,3), j -> round(aggregate(zip_with(
  * slice(qv,…), slice(v,…), *), sum) / (qn[i]*nm[j]) * 1e6)))` — 16
  * interpreted lambda cells per pair, each allocating slice copies, plus
  * a (q_id, vec_id) hash-aggregate SHUFFLE just to undo the explode.
  * [[VecSim.maxsimMicro]] computes the identical Σᵢ maxⱼ in one codegen'd
  * loop per pair: same int64 slice dots, same
  * `CAST(dot AS DOUBLE) / (qn_i * nm_j) * 1e6` IEEE arithmetic, the same
  * HALF_UP `round` (replicated via the same java.math.BigDecimal.valueOf
  * path Spark's `Round` uses for DoubleType), same `CAST(… AS BIGINT)`.
  * Norms are re-derived in-kernel: `sqrt(CAST(Σ e² AS DOUBLE))` per slice
  * is the identical IEEE value the normed frames carried, so dropping the
  * norm columns changes no output (VecSimSpec pins the whole thing
  * differentially against the verbatim HOF formulation on the real
  * corpus).
  *
  * The BLEU/ROUGE clipped n-gram match (q193/q194) exploded every
  * candidate and reference n-gram of the corpus into a
  * (doc, n, gram)-keyed count aggregate — two corpus-sized token-stream
  * shuffles to compute what is a pure per-row function of the two token
  * arrays. [[VecSim.clippedNgramOverlap]] computes Σ_g min(c_cand(g),
  * c_ref(g)) in one pass per row (hash the reference grams, decrement as
  * candidate grams match) — exact integer counts, zero shuffle.
  */
object VecSim {

  /** Spark's `round(x)` for DoubleType, scale 0 (RoundBase nullSafeEval):
    * NaN/∞ pass through, else BigDecimal.valueOf(x).setScale(0, HALF_UP).
    * Kept private-identical so fused scores match the HOF bit-for-bit. */
  private def roundHalfUp(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** MaxSim in integer micro: Σ_{i<nSlices} max_{j<nSlices} round(
    * dot(qv[i·dim..], v[j·dim..]) / (‖qv_i‖·‖v_j‖) · 1e6) as long.
    * `qv`/`v` are quantized int64 vectors of nSlices·dim components. */
  def maxsimMicro(qv: ArrayData, v: ArrayData, nSlices: Int,
      dim: Int): Long = {
    val q = qv.toLongArray()
    val c = v.toLongArray()
    // per-slice norms, same IEEE derivation as the normed frames:
    // sqrt(CAST(Σ e*e AS DOUBLE))
    val qn = new Array[Double](nSlices)
    val cn = new Array[Double](nSlices)
    var i = 0
    while (i < nSlices) {
      var sq = 0L; var sc = 0L
      var t = 0
      while (t < dim) {
        val a = q(i * dim + t); val b = c(i * dim + t)
        sq += a * a; sc += b * b
        t += 1
      }
      qn(i) = math.sqrt(sq.toDouble)
      cn(i) = math.sqrt(sc.toDouble)
      i += 1
    }
    var total = 0L
    i = 0
    while (i < nSlices) {
      var best = Long.MinValue
      val qo = i * dim
      var j = 0
      while (j < nSlices) {
        var dot = 0L
        val co = j * dim
        var t = 0
        while (t < dim) { dot += q(qo + t) * c(co + t); t += 1 }
        // CAST(dot AS DOUBLE) / (qn_i * nm_j) * 1000000.0, then round,
        // then CAST(… AS BIGINT) — the exact HOF arithmetic order
        val micro = roundHalfUp(dot.toDouble / (qn(i) * cn(j)) * 1000000.0)
          .toLong
        if (micro > best) best = micro
        j += 1
      }
      total += best
      i += 1
    }
    total
  }

  /** Clipped n-gram multiset overlap: Σ_g min(count_a(g), count_b(g))
    * over positional word n-grams (duplicates kept — the ROUGE/BLEU
    * clipping rule). N-gram identity = the n-token window; equality of
    * space-joined grams over whitespace-split tokens is exactly equality
    * of the token windows, so no join strings are materialized. */
  def clippedNgramOverlap(a: ArrayData, b: ArrayData, n: Int): Long = {
    val na = a.numElements() - n + 1
    val nb = b.numElements() - n + 1
    if (na <= 0 || nb <= 0) return 0L
    // count reference grams; a gram key is its n-token window compared
    // tokenwise (wrapped so hashCode/equals see the window content)
    final class W(val arr: ArrayData, val off: Int, val n: Int) {
      override def hashCode(): Int = {
        var h = 1; var k = 0
        while (k < n) { h = h * 31 + arr.getUTF8String(off + k).hashCode; k += 1 }
        h
      }
      override def equals(o: Any): Boolean = {
        val w = o.asInstanceOf[W]
        var k = 0
        while (k < n) {
          if (!arr.getUTF8String(off + k).equals(w.arr.getUTF8String(w.off + k)))
            return false
          k += 1
        }
        true
      }
    }
    val m = new java.util.HashMap[W, Integer](nb * 2)
    var i = 0
    while (i < nb) {
      val w = new W(b, i, n)
      val c = m.get(w)
      m.put(w, if (c == null) 1 else c + 1)
      i += 1
    }
    var out = 0L
    i = 0
    while (i < na) {
      val w = new W(a, i, n)
      val cnt = m.get(w)
      if (cnt != null && cnt > 0) { out += 1L; m.put(w, cnt - 1) }
      i += 1
    }
    out
  }
}

/** `maxsim_micro(qv, v)`: array<long> × array<long> → long — the fused
  * ColBERT-style Σᵢ maxⱼ integer-micro cosine (see VecSim.maxsimMicro). */
case class MaxSimMicro(left: Expression, right: Expression, nSlices: Int,
    dim: Int) extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecSim.maxsimMicro(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      nSlices, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VecSim.maxsimMicro($a, $b, $nSlices, $dim)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): MaxSimMicro = copy(left = l, right = r)
}

/** `clipped_ngram_overlap(cand, ref, n)`: array<string> × array<string>
  * → long (see VecSim.clippedNgramOverlap). */
case class ClippedNgramOverlap(left: Expression, right: Expression, n: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecSim.clippedNgramOverlap(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.expressions.VecSim.clippedNgramOverlap($a, $b, $n)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ClippedNgramOverlap = copy(left = l, right = r)
}
