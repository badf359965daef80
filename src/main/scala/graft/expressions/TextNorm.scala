package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical normalization (NFC) as a fused codegen'd kernel.
  *
  * Web-crawled text mixes precomposed and decomposed codepoint
  * sequences for the SAME visible string ("é" as U+00E9 vs
  * U+0065 U+0301). Every downstream operator in this engine keys on
  * bytes — exact dedup digests, shingle hashes, line-dedup md5s,
  * dictionary membership — so un-normalized text silently splits
  * equal documents into distinct keys. NFC normalization is therefore
  * the FIRST projection of a curation pipeline, before any hash is
  * taken (the reference's validators normalize case/spacing for the
  * same reason at their smaller scale, e.g. dar
  * `state-abbrevs/state-abbrev-validate.py:33`'s trim/upper cascade).
  *
  * Spark has no built-in for this (`lower`/`translate` are
  * codepoint-wise), so it is a genuine custom-Expression case: one
  * `java.text.Normalizer` call per row, inside whole-stage codegen.
  * The ASCII fast path skips the quick-check scan entirely — the
  * common case for English web text costs one byte scan, no
  * allocation. Zero shuffle; streams unchanged.
  */
object TextNorm {

  def nfc(s: UTF8String): UTF8String = {
    if (s == null) return null
    // ASCII fast path: NFC is the identity on ASCII; numBytes==numChars
    // iff every byte is ASCII (UTF-8 property), no codepoint walk needed.
    if (s.numBytes == s.numChars) return s
    val j = s.toString
    if (Normalizer.isNormalized(j, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(j, Normalizer.Form.NFC))
  }
}

/** ASCII punctuation/whitespace canonicalization as one fused byte
  * scan — the rung-2/rung-3 normalizer of the dedup ladder (q408):
  * lowercase, every byte outside [a-z0-9 ] becomes a space, space runs
  * collapse, ends trim, and (optionally) digits mask to '#'. The regex
  * formulation (`regexp_replace ×2 + trim`) is what the DuckDB oracle
  * runs; Java's regex engine prices it at ~4.6 µs/char, which made the
  * normalization 95%+ of q408's wall at the 100× replica (LadderProbe:
  * 30 s of a 30 s query) — this kernel is the same function as one
  * branch-predictable scan, no allocation beyond the output buffer.
  *
  * Byte-wise vs the regex's codepoint-wise semantics: any non-ASCII
  * codepoint's bytes each map to a space where the regex maps the
  * whole codepoint to ONE space — identical after run-collapse; the
  * single divergence is exotic uppercase codepoints that case-fold
  * INTO ASCII (e.g. U+212A KELVIN SIGN → 'k'), which the kernel
  * spaces instead — out of scope for the ASCII fixtures both engines
  * see (same documented scope as StringSimKernels.jaro).
  */
object PunctWs {
  def normalize(s: UTF8String, maskDigits: Boolean): UTF8String = {
    if (s == null) return null
    val b = s.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < b.length) {
      var c = b(i)
      if (c >= 'A' && c <= 'Z') c = (c + 32).toByte
      val isAl = c >= 'a' && c <= 'z'
      val isDg = c >= '0' && c <= '9'
      if (isAl || isDg) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = if (isDg && maskDigits) '#' else c
        n += 1
      } else pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** `punct_ws_normalize(text, maskDigits)`: lowercase + non-alnum→space
  * + collapse + trim (+ digit mask) in one scan. */
case class PunctWsNormalize(child: Expression, maskDigits: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    PunctWs.normalize(input.asInstanceOf[UTF8String], maskDigits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.PunctWs.normalize($c, $maskDigits)")
  override protected def withNewChildInternal(newChild: Expression): PunctWsNormalize =
    copy(child = newChild)
}

/** `nfc_normalize(text)`: string → NFC-normalized string. */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    TextNorm.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextNorm.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}
