package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for the custom hash-signature expressions.
  *
  * Why custom expressions (SURVEY.md §7 "built-in vs custom" revisited):
  * the built-in formulation — 32 × `array_min(transform(...))` over a
  * shingle array — is semantically identical but runs as interpreted
  * higher-order lambdas (~1.5 ms/doc measured at sf0.1). One fused loop
  * per row brings the whole signature to a few µs/doc and stays inside
  * whole-stage codegen via a static call (preference order (b) of the
  * build contract: custom `Expression` before custom operators).
  */
object HashSig {

  val Prime: Long = 2147483647L // 2^31 - 1, products stay < 2^62

  private val FnvOffset = -3750763034362895579L // FNV-1a 64-bit offset
  private val FnvPrime = 1099511628211L

  /** FNV-1a over the utf8 bytes of tokens[i..i+k-1] with a separator. */
  private def shingleFnv(tokens: Array[UTF8String], i: Int, k: Int): Long = {
    var h = FnvOffset
    var j = i
    val end = math.min(i + k, tokens.length)
    while (j < end) {
      val b = tokens(j).getBytes
      var x = 0
      while (x < b.length) {
        h = (h ^ (b(x) & 0xffL)) * FnvPrime
        x += 1
      }
      h = (h ^ 0x20L) * FnvPrime // separator
      j += 1
    }
    h
  }

  private def nonEmpty(arr: ArrayData): Array[UTF8String] = {
    val n = arr.numElements()
    val out = new Array[UTF8String](n)
    var m = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (s.numBytes() > 0) { out(m) = s; m += 1 }
      }
      i += 1
    }
    if (m == n) out else java.util.Arrays.copyOf(out, m)
  }

  /** MinHash signature over word k-shingles: for each of n hash functions
    * h_i(s) = (base(s)*a_i + b_i) mod P, the min over all shingles.
    * Returns null for token arrays with no usable tokens. */
  def minhash(tokensArr: ArrayData, k: Int, n: Int): ArrayData = {
    val tokens = nonEmpty(tokensArr)
    if (tokens.length == 0) return null
    val nShingles = math.max(tokens.length - k + 1, 1)
    val sig = new Array[Long](n)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var s = 0
    while (s < nShingles) {
      val base = java.lang.Math.floorMod(shingleFnv(tokens, s, k), Prime)
      var i = 0
      while (i < n) {
        val a = (1103515245L * (i + 1)) % Prime
        val b = (12345L + 7919L * i) % Prime
        val h = (base * a + b) % Prime
        if (h < sig(i)) sig(i) = h
        i += 1
      }
      s += 1
    }
    new GenericArrayData(sig)
  }

  /** 64-bit SimHash over distinct tokens: FNV per token, signed bit
    * votes, sign of each bit sum. Null-safe like [[minhash]]. */
  def simhash(tokensArr: ArrayData): Long = {
    val tokens = nonEmpty(tokensArr)
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < tokens.length) {
      if (seen.add(tokens(i))) {
        val h = shingleFnv(tokens, i, 1)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Quantize a float/double array to round(v*scale) int64. */
  def quantize(arr: ArrayData, scale: Double): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val v: Double = arr.get(i, org.apache.spark.sql.types.FloatType) match {
        case f: java.lang.Float => f.toDouble
        case d: java.lang.Double => d
        case x => x.toString.toDouble
      }
      // HALF_UP (away from zero) to match Spark/DuckDB round(), not
      // Math.round's floor(x+0.5)
      val x = v * scale
      out(i) = (if (x >= 0) Math.floor(x + 0.5) else Math.ceil(x - 0.5)).toLong
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Random-hyperplane LSH bucket id — fused twin of the HOF
    * formulation in graft.pipeline.Similarity (nBits × aggregate/zip_with
    * ran as interpreted lambdas per row; this is one codegen'd loop).
    * Projection weight w(b,i) ∈ {-1,+1} from parity of the same integer
    * mix, doubles summed in the same ascending-i order so float
    * association matches the HOF version bit-for-bit. */
  def lshBucket(arr: ArrayData, nBits: Int): Int = {
    val n = arr.numElements()
    var bucket = 0
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      var i = 0
      while (i < n) {
        val v: Double = arr.get(i, org.apache.spark.sql.types.FloatType) match {
          case f: java.lang.Float => f.toDouble
          case d: java.lang.Double => d
          case x => x.toString.toDouble
        }
        val mixed = (i * 2654435761L + b.toLong * 40503L) % 97L
        acc += (if (mixed < 48) v else -v)
        i += 1
      }
      if (acc >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Word n-gram shingles in one codegen'd loop — the fused twin of
    * `array_distinct(transform(sequence(0, len-n), i -> concat_ws(" ",
    * toks[i..i+n-1])))` that q50/q61/q70/q73 built as interpreted HOF
    * lambdas (differential-spec'd; same SQL concat_ws null-skipping via
    * UTF8String.concatWs, same first-occurrence order for distinct). */
  def ngramShingles(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val out = new java.util.ArrayList[UTF8String](len - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    i = 0
    while (i <= len - n) {
      val piece = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      if (seen == null || seen.add(piece)) out.add(piece)
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** [[ngramShingles]] fused with xxhash64 (seed 42, byte-identical to
    * Spark's `xxhash64(string)` builtin): shingle strings are hashed as
    * formed, only the longs escape. Distinct dedups on the HASH —
    * identical to string dedup modulo 64-bit collisions. */
  def ngramShingleHashes(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = arr.numElements()
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val toks = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val out = new java.util.ArrayList[java.lang.Long](len - n + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    i = 0
    while (i <= len - n) {
      val piece = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      val h = org.apache.spark.sql.catalyst.expressions.XxHash64Function
        .hash(piece, StringType, 42L)
      if (seen == null || seen.add(h)) out.add(h)
      i += 1
    }
    val res = new Array[Long](out.size())
    i = 0
    while (i < res.length) { res(i) = out.get(i); i += 1 }
    new GenericArrayData(res)
  }

  /** ADC lookup: sum over subspaces of the query's precomputed
    * per-centroid dot product for this vector's code. Integer-exact. */
  def pqAdcScore(codes: ArrayData, dtable: ArrayData, ksub: Int): Long = {
    val m = codes.numElements()
    var acc = 0L
    var s = 0
    while (s < m) {
      acc += dtable.getLong(s * ksub + codes.getInt(s))
      s += 1
    }
    acc
  }

  /** [[lshBucket]] over QUANTIZED int64 components — exact integer
    * sums, so the bucket is cross-engine reproducible (the all-pairs
    * near-dup operator's oracle rebuilds it in SQL; Similarity
    * .cosineNearDupPairs). Same weights/mix as the float kernel. */
  def lshBucketLong(arr: ArrayData, nBits: Int): Int = {
    val n = arr.numElements()
    var bucket = 0
    var b = 0
    while (b < nBits) {
      var acc = 0L
      var i = 0
      while (i < n) {
        val mixed = (i * 2654435761L + b.toLong * 40503L) % 97L
        acc += (if (mixed < 48) arr.getLong(i) else -arr.getLong(i))
        i += 1
      }
      if (acc >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  /** Min lexical md5 hex over all k-char windows of `text` — the
    * content-defined fingerprint (TextAnalysis.fingerprint) as ONE
    * per-row loop. The explode formulation fans a doc out to
    * (len-k+1) rows and shuffles them into a min() aggregate; this
    * computes the same min in place: no explode, no shuffle, same
    * md5-of-substring semantics (bytewise-lexical hex compare ==
    * unsigned byte compare on the digest). Matches
    * `min(md5(substr(text,i,k)))` exactly, including the whole-short-doc
    * window when len < k. */
  def minMd5Window(text: UTF8String, k: Int): UTF8String = {
    val s = text.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val n = math.max(s.length - (k - 1), 1)
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      md.reset()
      val end = math.min(i + k, s.length)
      md.update(s.substring(i, end).getBytes("UTF-8"))
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    val hex = new java.lang.StringBuilder(32)
    var j = 0
    while (j < best.length) {
      hex.append(Character.forDigit((best(j) >> 4) & 0xf, 16))
      hex.append(Character.forDigit(best(j) & 0xf, 16))
      j += 1
    }
    UTF8String.fromString(hex.toString)
  }

  /** Winnowing (MOSS): distinct sliding-window minima over the md5 hex
    * of every k-char window — [[minMd5Window]] upgraded from one global
    * min to a w-window monotonic-deque scan, O(n) total (the HOF
    * array_min-over-slice formulation is O(n·w) and allocates a slice
    * per window — 6.4 s → fused at sf0.1). First-occurrence order;
    * value-identical to the HOF twin (differential-spec'd). */
  def winnowMins(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val nh = math.max(s.length - (k - 1), 1)
    val hex = new Array[String](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      val end = math.min(i + k, s.length)
      md.update(s.substring(i, end).getBytes("UTF-8"))
      val d = md.digest()
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < d.length) {
        sb.append(Character.forDigit((d(j) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(j) & 0xf, 16))
        j += 1
      }
      hex(i) = sb.toString
      i += 1
    }
    val out = new java.util.LinkedHashSet[String]()
    // monotonic deque of indices with increasing hex values
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0 // exclusive
    var p = 0
    while (p < nh) {
      while (tail > head && hex(dq(tail - 1)) >= hex(p)) tail -= 1
      dq(tail) = p; tail += 1
      while (dq(head) <= p - w) head += 1
      if (p >= w - 1) out.add(hex(dq(head)))
      p += 1
    }
    if (nh < w) out.add(hex(dq(head))) // one clipped window: global min
    val arr = new java.util.ArrayList[Any](out.size)
    val it = out.iterator()
    while (it.hasNext) arr.add(UTF8String.fromString(it.next()))
    new GenericArrayData(arr.toArray)
  }

  /** Content-defined chunk substrings (see [[CdcChunks]] scaladoc for
    * the boundary rule). Positions and windows are CHAR-based to match
    * the SQL oracle's substr semantics. */
  def cdcChunks(text: UTF8String, k: Int, mod: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    if (len == 0)
      return org.apache.spark.sql.catalyst.util.ArrayData
        .toArrayData(Array.empty[UTF8String])
    val md = java.security.MessageDigest.getInstance("MD5")
    val nh = math.max(len - (k - 1), 1)
    // 1-based chunk starts: 1 plus every boundary position
    val starts = new scala.collection.mutable.ArrayBuffer[Int](16)
    starts += 1
    var i = 0 // 0-based window start; 1-based position = i + 1
    while (i < nh) {
      md.reset()
      val end = math.min(i + k, len)
      md.update(s.substring(i, end).getBytes("UTF-8"))
      val d = md.digest()
      // a boundary at position 1 is already covered by the prepended 1
      if ((d(0) & 0xff) % mod == 0 && i > 0) starts += (i + 1)
      i += 1
    }
    val out = new Array[UTF8String](starts.length)
    var j = 0
    while (j < starts.length) {
      val from = starts(j) - 1
      val until = if (j + 1 < starts.length) starts(j + 1) - 1 else len
      out(j) = UTF8String.fromString(s.substring(from, until))
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  /** [[winnowMins]] with positional evidence: per distinct fingerprint,
    * the FIRST and LAST 1-based window-start index at which it was the
    * window min — the per-doc offsets a MOSS-style overlap report
    * shows. Same O(n) monotonic-deque scan; window starts arrive in
    * increasing order, so the span update is a constant-time overwrite
    * of `hi`. Returns array<struct<fp string, lo int, hi int>> in
    * first-emission order (matching winnowMins' element order). */
  def winnowSpans(text: UTF8String, k: Int, w: Int): ArrayData = {
    val s = text.toString
    val md = java.security.MessageDigest.getInstance("MD5")
    val nh = math.max(s.length - (k - 1), 1)
    val hex = new Array[String](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      val end = math.min(i + k, s.length)
      md.update(s.substring(i, end).getBytes("UTF-8"))
      val d = md.digest()
      val sb = new java.lang.StringBuilder(32)
      var j = 0
      while (j < d.length) {
        sb.append(Character.forDigit((d(j) >> 4) & 0xf, 16))
        sb.append(Character.forDigit(d(j) & 0xf, 16))
        j += 1
      }
      hex(i) = sb.toString
      i += 1
    }
    val spans = new java.util.LinkedHashMap[String, Array[Int]]()
    def emit(fp: String, start1: Int): Unit = {
      val cur = spans.get(fp)
      if (cur == null) spans.put(fp, Array(start1, start1))
      else cur(1) = start1 // starts are scanned in increasing order
    }
    val dq = new Array[Int](nh)
    var head = 0
    var tail = 0 // exclusive
    var p = 0
    while (p < nh) {
      while (tail > head && hex(dq(tail - 1)) >= hex(p)) tail -= 1
      dq(tail) = p; tail += 1
      while (dq(head) <= p - w) head += 1
      if (p >= w - 1) emit(hex(dq(head)), p - w + 2)
      p += 1
    }
    if (nh < w) emit(hex(dq(head)), 1) // one clipped window: global min
    val arr = new Array[Any](spans.size)
    val it = spans.entrySet().iterator()
    var n = 0
    while (it.hasNext) {
      val e = it.next()
      arr(n) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue()(0), e.getValue()(1))
      n += 1
    }
    new GenericArrayData(arr)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    a.length < b.length
  }

  /** Count of `needles` elements present in ascending-sorted `haystack`
    * (both array<long>, no nulls): one binary search per needle —
    * O(|needles| · log |haystack|) with NO per-row hash-set build, unlike
    * `array_intersect`, which re-hashes the full haystack for every row.
    * The haystack is typically a broadcast corpus-level set (benchmark
    * shingles), so per-row cost must not scale with its size. */
  def countInSorted(needles: ArrayData, haystack: ArrayData): Long = {
    val n = needles.numElements()
    val m = haystack.numElements()
    var cnt = 0L
    var i = 0
    while (i < n) {
      val v = needles.getLong(i)
      var lo = 0
      var hi = m - 1
      var found = false
      while (lo <= hi && !found) {
        val mid = (lo + hi) >>> 1
        val x = haystack.getLong(mid)
        if (x == v) found = true
        else if (x < v) lo = mid + 1
        else hi = mid - 1
      }
      if (found) cnt += 1
      i += 1
    }
    cnt
  }

  /** Exact int64 dot product of two equal-length long arrays. */
  def dotLong(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }
}

/** `minhash_signature(tokens, k, n)`: array<string> → array<long>. */
case class MinHashSignature(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    HashSig.minhash(input.asInstanceOf[ArrayData], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.HashSig.minhash($c, $k, $numHashes);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** `simhash64(tokens)`: array<string> → long. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(input: Any): Any =
    HashSig.simhash(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.simhash($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Column-API wrappers for the custom expressions. */
object functions {
  import org.apache.spark.sql.graftbridge.Bridge

  /** MinHash signature of word k-shingles of a token array. */
  def minhash_signature(tokens: Column, k: Int, numHashes: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(tokens), k, numHashes))

  /** 64-bit SimHash of a token array. */
  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  /** round(v*scale) int64 quantization of a float array. */
  def quantize_vec(arr: Column, scale: Double): Column =
    Bridge.column(QuantizeVec(Bridge.expression(arr), scale))

  /** Membership count of `needles` in an ascending-sorted `haystack`
    * array — O(log n) binary search per needle instead of
    * `array_intersect`'s per-row haystack re-hash. */
  def count_in_sorted(needles: Column, haystack: Column): Column =
    Bridge.column(CountInSorted(Bridge.expression(needles), Bridge.expression(haystack)))

  /** Exact int64 dot product. */
  def dot_long(a: Column, b: Column): Column =
    Bridge.column(DotLong(Bridge.expression(a), Bridge.expression(b)))

  /** Random-hyperplane LSH bucket id of a float array. */
  def lsh_bucket(arr: Column, nBits: Int): Column =
    Bridge.column(LshBucket(Bridge.expression(arr), nBits))

  /** Random-hyperplane LSH bucket id of a quantized int64 array
    * (integer-exact — SQL-oracle-reproducible). */
  def lsh_bucket_long(arr: Column, nBits: Int): Column =
    Bridge.column(LshBucketLong(Bridge.expression(arr), nBits))

  /** Min lexical md5 hex over all k-char windows of a string. */
  def min_md5_window(text: Column, k: Int): Column =
    Bridge.column(MinMd5Window(Bridge.expression(text), k))

  /** Unicode NFC canonical normalization (see TextNorm scaladoc). */
  def nfc_normalize(text: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(text)))

  /** ASCII lowercase + punct/ws collapse (+ optional digit mask) in
    * one fused byte scan (see PunctWs scaladoc — the q408 ladder
    * normalizer; regex-equivalent on ASCII). */
  def punct_ws_normalize(text: Column, maskDigits: Boolean): Column =
    Bridge.column(PunctWsNormalize(Bridge.expression(text), maskDigits))

  /** Winnowing fingerprint set: distinct w-window minima of k-char
    * shingle md5s, one O(n) fused scan (see HashSig.winnowMins). */
  def winnow_mins(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowMins(Bridge.expression(text), k, w))

  /** Winnowing fingerprints with positional evidence: per distinct
    * fingerprint its first/last 1-based window-start index — feeds the
    * MOSS-style matched-region report (q139). */
  def winnow_spans(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowSpans(Bridge.expression(text), k, w))

  /** Content-defined chunk substrings (cut where the k-char window
    * md5's first hex pair ≡ 0 mod `mod`) — one fused O(n) scan (see
    * CdcChunks scaladoc; the q446 operator). */
  def cdc_chunks(text: Column, k: Int, mod: Int): Column = {
    require(k >= 1 && mod >= 1,
      s"cdc_chunks: k and mod must be >= 1 (got k=$k, mod=$mod)")
    Bridge.column(CdcChunks(Bridge.expression(text), k, mod))
  }

  /** Word n-gram shingles of a token array (optionally distinct,
    * first-occurrence order) — fused loop, no HOF lambdas. */
  def ngram_shingles(toks: Column, n: Int, distinct: Boolean): Column =
    Bridge.column(NgramShingles(Bridge.expression(toks), n, distinct))

  /** xxhash64 (seed 42 — identical to Spark's `xxhash64` builtin) of
    * each word n-gram shingle, in one fused loop: shingle strings are
    * hashed as they are formed and never leave the expression, so
    * downstream joins/aggregations carry 8-byte longs instead of
    * n×word-length strings. */
  def ngram_shingle_hashes(toks: Column, n: Int, distinct: Boolean): Column =
    Bridge.column(NgramShingleHashes(Bridge.expression(toks), n, distinct))

  /** `pq_adc_score(codes, dtable, ksub)`: asymmetric-distance lookup —
    * sum over subspaces s of dtable[s*ksub + codes[s]] (the query's
    * precomputed per-centroid dot products). m lookups per corpus row
    * instead of a dim-length dot product. */
  def pq_adc_score(codes: Column, dtable: Column, ksub: Int): Column =
    Bridge.column(PqAdcScore(Bridge.expression(codes), Bridge.expression(dtable), ksub))

  /** Element-wise md5-prefix uint32 hashes — fused twin of
    * `transform(arr, s -> conv(substring(md5(s),1,8),16,10))`. */
  def md5_hash32_array(arr: Column): Column =
    Bridge.column(Md5Hash32Array(Bridge.expression(arr)))

  /** md5-twin MinHash signatures from shingle strings: one fused pass
    * (md5-prefix hash + every affine perm's running min). Null for an
    * empty array, mirroring `array_min([])`. */
  def md5_minhash_sigs(shingles: Column, perms: Seq[(Long, Long)],
      p: Long): Column =
    Bridge.column(Md5MinHashSigs(Bridge.expression(shingles),
      perms.map(_._1), perms.map(_._2), p))

  /** md5-twin MinHash signatures from pre-hashed uint32 values. */
  def minhash_over_hashes(hs: Column, perms: Seq[(Long, Long)],
      p: Long): Column =
    Bridge.column(MinHashOverHashes(Bridge.expression(hs),
      perms.map(_._1), perms.map(_._2), p))

  /** Portable 32-bit SimHash of a token multiset — fused twin of the
    * explode + 32-conditional-sum aggregation (Pipeline.portableSimhash32). */
  def md5_simhash32(tokens: Column): Column =
    Bridge.column(Md5SimHash32(Bridge.expression(tokens)))

  /** SymSpell deletion-signature neighborhood of a string (fused twin of
    * FuzzyJoin's array_distinct(transform(sequence(...), ...))). */
  def del_signatures(s: Column): Column =
    Bridge.column(DelSignatures(Bridge.expression(s)))

  /** Fused ColBERT-style MaxSim in integer micro (round 18 — see
    * VecSim.maxsimMicro): Σᵢ maxⱼ over nSlices×nSlices dim-wide slice
    * cosines of two quantized int64 vectors, norms re-derived in-kernel. */
  def maxsim_micro(qv: Column, v: Column, nSlices: Int = 4,
      dim: Int = 16): Column =
    Bridge.column(MaxSimMicro(Bridge.expression(qv), Bridge.expression(v),
      nSlices, dim))

  /** Clipped positional n-gram multiset overlap of two token arrays
    * (round 18 — see VecSim.clippedNgramOverlap): the per-row BLEU/ROUGE
    * match count, replacing the gram explode + count shuffle. */
  def clipped_ngram_overlap(cand: Column, ref: Column, n: Int): Column =
    Bridge.column(ClippedNgramOverlap(Bridge.expression(cand),
      Bridge.expression(ref), n))
}

/** `min_md5_window(text, k)`: string → min md5 hex over k-char windows
  * (fused fingerprint; see HashSig.minMd5Window). */
case class MinMd5Window(child: Expression, k: Int)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    HashSig.minMd5Window(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.minMd5Window($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): MinMd5Window =
    copy(child = newChild)
}

/** `winnow_mins(text, k, w)`: string → array<string> distinct
  * w-window minima of k-char shingle md5 hexes (see
  * HashSig.winnowMins). */
case class WinnowMins(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSig.winnowMins(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.winnowMins($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

/** `cdc_chunks(text, k, mod)`: string → array<string> — content-
  * defined chunking (the q446 operator): cut BEFORE every 1-based
  * char position i whose k-char window md5 has first-hex-pair value
  * ≡ 0 (mod `mod`), i.e. the exact regex-free equivalent of the SQL
  * formulation `('0x' || substr(md5(substr(text, i, k)), 1, 2))
  * ::BIGINT % mod = 0` the DuckDB oracle replays. One O(n) scan with
  * ONE reused MessageDigest — the HOF formulation this replaces
  * (filter(sequence…) with a Catalyst md5 per element) ran
  * interpreted and priced the 100× replica in MINUTES. Windows are
  * UTF-16 code-unit based (Java String.substring) while DuckDB
  * substr/len count codepoints — identical for ASCII/BMP text (the
  * documented PunctWs/jaro scope); astral (non-BMP) characters would
  * shift window positions between the two engines. */
case class CdcChunks(child: Expression, k: Int, mod: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSig.cdcChunks(input.asInstanceOf[UTF8String], k, mod)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.cdcChunks($c, $k, $mod)")
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

/** `winnow_spans(text, k, w)`: string → array<struct<fp,lo,hi>> —
  * [[WinnowMins]] with first/last window-start evidence per distinct
  * fingerprint (see HashSig.winnowSpans). */
case class WinnowSpans(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("fp", StringType, nullable = false),
    StructField("lo", IntegerType, nullable = false),
    StructField("hi", IntegerType, nullable = false))), containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSig.winnowSpans(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.winnowSpans($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowSpans =
    copy(child = newChild)
}

/** `lsh_bucket(arr, nBits)`: array<float/double> → int bucket id (fused
  * loop over nBits sign-projections; see HashSig.lshBucket). */
case class LshBucket(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    HashSig.lshBucket(input.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.lshBucket($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
}

/** `ngram_shingles(toks, n, distinct)`: array<string> → array<string>
  * word n-grams (see HashSig.ngramShingles). */
case class NgramShingles(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSig.ngramShingles(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.ngramShingles($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

/** `ngram_shingle_hashes(toks, n, distinct)`: array<string> →
  * array<long> — [[NgramShingles]] fused with per-shingle xxhash64
  * (see HashSig.ngramShingleHashes; differential-spec'd against
  * xxhash64-of-ngram_shingles). */
case class NgramShingleHashes(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSig.ngramShingleHashes(input.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.ngramShingleHashes($c, $n, $distinct)")
  override protected def withNewChildInternal(newChild: Expression): NgramShingleHashes =
    copy(child = newChild)
}

/** `pq_adc_score(codes, dtable, ksub)`: array<int> × array<long> → long
  * (see HashSig.pqAdcScore; functions.pq_adc_score scaladoc). */
case class PqAdcScore(left: Expression, right: Expression, ksub: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashSig.pqAdcScore(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], ksub)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashSig.pqAdcScore($a, $b, $ksub)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcScore =
    copy(left = l, right = r)
}

/** `lsh_bucket_long(arr, nBits)`: array<long> → int bucket id — the
  * integer-exact twin of [[LshBucket]] (see HashSig.lshBucketLong). */
case class LshBucketLong(child: Expression, nBits: Int)
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override protected def nullSafeEval(input: Any): Any =
    HashSig.lshBucketLong(input.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.lshBucketLong($c, $nBits)")
  override protected def withNewChildInternal(newChild: Expression): LshBucketLong =
    copy(child = newChild)
}

/** `quantize_vec(arr, scale)`: array<float/double> → array<long> via
  * round(v*scale) — the exact-integer embedding quantization used by the
  * similarity operators (one fused loop instead of a `transform` lambda).
  */
case class QuantizeVec(child: Expression, scale: Double)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    HashSig.quantize(input.asInstanceOf[ArrayData], scale)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.HashSig.quantize($c, $scale)")
  override protected def withNewChildInternal(newChild: Expression): QuantizeVec =
    copy(child = newChild)
}

/** `count_in_sorted(needles, haystack)`: array<long> × sorted array<long>
  * → long membership count (binary search; see HashSig.countInSorted).
  * PRECONDITION: the haystack must be ASCENDING-sorted (e.g.
  * `sort_array(collect_set(...))`) — an unsorted haystack silently
  * undercounts. Input types are analyzer-checked so a non-array<long>
  * argument fails at analysis, not as a runtime ClassCastException. */
case class CountInSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  // AbstractDataType is private[sql]; the covariant concrete type works
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashSig.countInSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashSig.countInSorted($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CountInSorted =
    copy(left = l, right = r)
}

/** `dot_long(a, b)`: array<long> × array<long> → long (fused loop). */
case class DotLong(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashSig.dotLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.HashSig.dotLong($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotLong =
    copy(left = l, right = r)
}
