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
