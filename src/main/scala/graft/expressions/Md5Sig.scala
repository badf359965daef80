package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused kernels for the PORTABLE (md5-twin) hash-signature family —
  * round-17 optimization (guide §4: eliminate non-codegen expressions in
  * the hot path).
  *
  * The md5-twin MinHash/SimHash chains (Pipeline.minhashBucketsMd5Over,
  * Pipeline.portableSimhash32, q164's calibration) were built from
  * interpreted higher-order lambdas — per shingle `conv(substring(
  * md5(sh), 1, 8), 16, 10)` and per permutation
  * `array_min(transform(hs, h -> (h*a+b) % P))`. Each lambda element
  * evaluation allocates (md5 hex string → substring → conv) and none of
  * it is whole-stage-codegen'd; at 16 permutations the per-doc cost was
  * the dominant task time of every md5-twin consumer (q37's twin, q145,
  * q387, q394, q403, q451, q454–q457 measured round 17).
  *
  * These kernels compute BIT-IDENTICAL values in one fused loop per row:
  * md5 of each shingle's utf8 bytes (one MessageDigest reused across the
  * row), the first 4 digest bytes read as a big-endian uint32 — exactly
  * `('0x' || substr(md5(s),1,8))::BIGINT` / `conv(substring(md5(s),1,8),
  * 16,10)` — then every affine permutation folded into running minima in
  * the same pass. h < 2^32 and a < 2^28, so h*a+b < 2^62: the arithmetic
  * is the same int64 arithmetic the HOF (and the DuckDB oracle) runs; no
  * value changes anywhere, which is what keeps every md5-twin oracle
  * green (they were all re-verified at sf0.001 and sf0.01 this round).
  */
object Md5Sig {

  /** First 8 md5 hex chars of `s` as an unsigned 32-bit value — the
    * portable token/shingle hash of the q51 convention. */
  private def hash32(md: java.security.MessageDigest, s: UTF8String): Long = {
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Element-wise md5-prefix uint32 hashes of a string array — the fused
    * twin of `transform(arr, s -> conv(substring(md5(s),1,8),16,10))`.
    *
    * PRECONDITION (ADVICE r17): element arrays must be containsNull=false
    * (all producers are split()/ngram_shingles, which never emit null
    * elements). A null element NPEs here where the HOF twin would have
    * propagated null — deliberate fail-loud, not silent divergence. */
  def hash32Array(arr: ArrayData): ArrayData = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      out(i) = hash32(md, arr.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signatures from shingle STRINGS: per shingle one md5-prefix
    * hash, then every `(h*a(j)+b(j)) % p` folded into running minima —
    * the fused twin of hashing plus `nPerms × array_min(transform(...))`.
    * Null (SQL) for an empty shingle array, mirroring `array_min([])`
    * (callers filter `size(shingles) > 0` first, as before). */
  def minhashSigs(arr: ArrayData, a: Array[Long], b: Array[Long],
      p: Long): ArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val np = a.length
    val sig = new Array[Long](np)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hash32(md, arr.getUTF8String(i))
      var j = 0
      while (j < np) {
        val v = (h * a(j) + b(j)) % p
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** MinHash signatures from PRE-HASHED uint32 values (q164 keeps its
    * distinct hash array as an output column, so hashing and permuting
    * stay separate there). Null for an empty array, as above. */
  def minhashOverHashes(hs: ArrayData, a: Array[Long], b: Array[Long],
      p: Long): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return null
    val np = a.length
    val sig = new Array[Long](np)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i < n) {
      if (!hs.isNullAt(i)) {
        val h = hs.getLong(i)
        var j = 0
        while (j < np) {
          val v = (h * a(j) + b(j)) % p
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Portable 32-bit SimHash over a token MULTISET: md5-prefix hash per
    * token (duplicates counted — the explode+groupBy semantics), bit j
    * of the signature set iff strictly more than half the tokens have
    * bit j set (ties → 0). Bit-identical to Pipeline.portableSimhash32's
    * explode + 32 conditional sums, without the explode, the 33-aggregate
    * hash aggregation, or the token shuffle. */
  def simhash32(toks: ArrayData): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = toks.numElements()
    val ones = new Array[Int](32)
    var i = 0
    while (i < n) {
      val h = hash32(md, toks.getUTF8String(i))
      var j = 0
      while (j < 32) {
        if (((h >>> j) & 1L) == 1L) ones(j) += 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 32) {
      if (2L * ones(j) > n) out |= (1L << j)
      j += 1
    }
    out
  }

  /** SymSpell deletion signatures D(s) = {s} ∪ {s minus one char},
    * first-occurrence-deduplicated — the fused twin of FuzzyJoin's
    * `array_distinct(transform(sequence(0, len), i -> concat(
    * substr(s,1,i), substr(s,i+2,len))))` (code-point positions, same as
    * Spark's `substr`). */
  def delSignatures(s: UTF8String): ArrayData = {
    val len = s.numChars()
    val seen = new java.util.LinkedHashSet[UTF8String](len * 2)
    var i = 0
    while (i <= len) {
      // chars [0, i) ++ chars [i+1, len) — i == len yields s itself
      val sig =
        if (i >= len) s
        else UTF8String.concat(s.substring(0, i), s.substring(i + 1, len))
      seen.add(sig)
      i += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

/** `md5_hash32_array(arr)`: array<string> → array<long>. */
case class Md5Hash32Array(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Md5Sig.hash32Array(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Sig.hash32Array($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5Hash32Array =
    copy(child = newChild)
}

/** `md5_minhash_sigs(shingles)`: array<string> → array<long> (one min
  * per affine permutation (a, b) mod p). */
case class Md5MinHashSigs(child: Expression, a: Seq[Long], b: Seq[Long],
    p: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray
  override protected def nullSafeEval(input: Any): Any =
    Md5Sig.minhashSigs(input.asInstanceOf[ArrayData], aArr, bArr, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Md5Sig.minhashSigs($c, $aRef, $bRef, ${p}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): Md5MinHashSigs =
    copy(child = newChild)
}

/** `minhash_over_hashes(hs)`: array<long> → array<long>. */
case class MinHashOverHashes(child: Expression, a: Seq[Long], b: Seq[Long],
    p: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  private lazy val aArr = a.toArray
  private lazy val bArr = b.toArray
  override protected def nullSafeEval(input: Any): Any =
    Md5Sig.minhashOverHashes(input.asInstanceOf[ArrayData], aArr, bArr, p)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhA", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhB", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Md5Sig.minhashOverHashes($c, $aRef, $bRef, ${p}L);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashOverHashes =
    copy(child = newChild)
}

/** `md5_simhash32(tokens)`: array<string> → long. */
case class Md5SimHash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    Md5Sig.simhash32(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Sig.simhash32($c)")
  override protected def withNewChildInternal(newChild: Expression): Md5SimHash32 =
    copy(child = newChild)
}

/** `del_signatures(s)`: string → array<string> (SymSpell deletion
  * neighborhood, first-occurrence-deduplicated). */
case class DelSignatures(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    Md5Sig.delSignatures(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.Md5Sig.delSignatures($c)")
  override protected def withNewChildInternal(newChild: Expression): DelSignatures =
    copy(child = newChild)
}
