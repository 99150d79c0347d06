package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the md5-derived text hashes used by the
  * dedup family (SURVEY §2: A10 dedup, U3 fingerprints).
  *
  * Semantics are IDENTICAL to the composed-column forms they replace
  * (`transform(grams, g => md5(g))`, `conv(substring(md5(t),1,n),16,10)`,
  * …) — the DuckDB oracles are unchanged; TextHashParitySpec pins the
  * equivalence. What changes is the evaluation shape: the higher-order
  * functions (`transform`/`aggregate`/`zip_with`) are interpreted
  * per-element with a hex-string round-trip per hash, allocating
  * array-of-string intermediates per row. These expressions run ONE tight
  * JVM loop per row over the raw digest bytes (no hex strings, no
  * intermediate arrays) and carry `doGenCode`, so they stay inside
  * whole-stage codegen spans. Measured 3-10× on the q34/q36/q55/q57/q65
  * map phases at sf0.1.
  */
object TextHash {

  // MessageDigest is stateful and not thread-safe; one per executor thread.
  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  private def md5(s: String): Array[Byte] = {
    val d = md5Local.get()
    d.reset()
    d.digest(s.getBytes(StandardCharsets.UTF_8))
  }

  /** Value of the first `hexChars` hex digits of a digest, as an unsigned
    * long (hexChars ≤ 15 so it fits). Equals
    * `conv(substring(hex(digest),1,hexChars),16,10)`. */
  private def hexPrefix(digest: Array[Byte], hexChars: Int): Long = {
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = digest(i >> 1) & 0xff
      val nibble = if ((i & 1) == 0) b >> 4 else b & 0xf
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  /** Character k-grams exactly as `charShingles`: start positions
    * 1..max(len-k+1, 1), gram = substr(i, k) (shorter at the tail).
    * "Character" means CODE POINT — Spark's length()/substr() count code
    * points, so supplementary characters (non-BMP) must not be split at
    * the UTF-16 surrogate boundary. `cpStarts` returns null on the
    * BMP-only fast path (char index == code point index). */
  private def gramCount(cp: Int, k: Int): Int = math.max(cp - k + 1, 1)

  private def cpStarts(str: String): Array[Int] = {
    val cp = str.codePointCount(0, str.length)
    if (cp == str.length) return null // no surrogate pairs
    val offs = new Array[Int](cp + 1)
    var ci = 0
    var i = 0
    while (i < cp) { offs(i) = ci; ci = str.offsetByCodePoints(ci, 1); i += 1 }
    offs(cp) = str.length
    offs
  }

  /** gram starting at code point i, k code points long, clipped at cp. */
  private def gram(str: String, offs: Array[Int], cp: Int, i: Int, k: Int): String =
    if (offs == null) str.substring(i, math.min(i + k, cp))
    else str.substring(offs(i), offs(math.min(i + k, cp)))

  /** q34 kernel: lexicographic min of md5 hex strings over k-grams.
    * Hex strings of equal-length digests compare identically to the raw
    * digest bytes compared unsigned — so the loop keeps the min digest
    * and hex-encodes once at the end. */
  def minGramMd5(s: UTF8String, k: Int): UTF8String = {
    val str = s.toString
    val offs = cpStarts(str)
    val cp = if (offs == null) str.length else offs.length - 1
    val n = gramCount(cp, k)
    var best: Array[Byte] = null
    var i = 0
    while (i < n) {
      val d = md5(gram(str, offs, cp, i, k))
      if (best == null || unsignedLess(d, best)) best = d.clone()
      i += 1
    }
    UTF8String.fromString(hex(best))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val hexDigits = "0123456789abcdef".toCharArray
  private def hex(d: Array[Byte]): String = {
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** q103 kernel: md5 band signatures — band b's signature is the
    * lexicographic-min md5 hex over k-grams of `b || ':' || gram`
    * (engine-portable banding: DuckDB reproduces it verbatim, unlike the
    * xxhash64 k-from-1 scheme). One pass over the grams, gram bytes
    * encoded once and digested `bands` times against precomputed band
    * prefixes; hex only for the winners. */
  // band-prefix bytes depend only on `bands` — built once, not per row
  private val bandPrefixCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def bandPrefixes(bands: Int): Array[Array[Byte]] =
    bandPrefixCache.computeIfAbsent(bands,
      n => Array.tabulate(n)(b => (b.toString + ":").getBytes(StandardCharsets.UTF_8)))

  def md5BandSigs(s: UTF8String, k: Int, bands: Int): GenericArrayData = {
    val str = s.toString
    val offs = cpStarts(str)
    val cp = if (offs == null) str.length else offs.length - 1
    val n = gramCount(cp, k)
    val prefixes = bandPrefixes(bands)
    val best = new Array[Array[Byte]](bands)
    val d = md5Local.get()
    var i = 0
    while (i < n) {
      val gb = gram(str, offs, cp, i, k).getBytes(StandardCharsets.UTF_8)
      var b = 0
      while (b < bands) {
        d.reset()
        d.update(prefixes(b))
        d.update(gb)
        val dig = d.digest()
        if (best(b) == null || unsignedLess(dig, best(b))) best(b) = dig
        b += 1
      }
      i += 1
    }
    new GenericArrayData(
      best.map(x => UTF8String.fromString(hex(x))).asInstanceOf[Array[Any]])
  }

  /** q55 kernel: winnowed fingerprints. Per-gram hash = first 8 hex digits
    * of md5 (unsigned 32-bit); minimum per sliding window of `w` hashes;
    * distinct, sorted ascending. Window minima via a monotonic deque —
    * O(grams), not O(grams × w). */
  def winnow(s: UTF8String, k: Int, w: Int): GenericArrayData = {
    val str = s.toString
    val offs = cpStarts(str)
    val cp = if (offs == null) str.length else offs.length - 1
    val n = gramCount(cp, k)
    val hashes = new Array[Long](n)
    var i = 0
    while (i < n) {
      hashes(i) = hexPrefix(md5(gram(str, offs, cp, i, k)), 8)
      i += 1
    }
    val nWin = math.max(n - w, 0) + 1
    val mins = new Array[Long](nWin)
    // monotonic ascending deque of indices into `hashes`
    val deque = new Array[Int](n)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < n) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(i)) tail -= 1
      deque(tail) = i; tail += 1
      val winStart = i - w + 1
      if (deque(head) < winStart) head += 1
      // window j covers hashes[j .. j+w-1] (clipped at the tail like
      // slice(); the final short windows share the full-window min only
      // when n >= w, handled by the nWin bound)
      if (i >= w - 1) mins(i - w + 1) = hashes(deque(head))
      i += 1
    }
    if (n < w) {
      // single clipped window over everything
      var m = Long.MaxValue
      var j = 0
      while (j < n) { if (hashes(j) < m) m = hashes(j); j += 1 }
      mins(0) = m
    }
    java.util.Arrays.sort(mins)
    // distinct on the sorted array
    var out = new Array[Long](mins.length)
    var cnt = 0
    i = 0
    while (i < mins.length) {
      if (cnt == 0 || out(cnt - 1) != mins(i)) { out(cnt) = mins(i); cnt += 1 }
      i += 1
    }
    if (cnt != out.length) out = java.util.Arrays.copyOf(out, cnt)
    new GenericArrayData(out)
  }

  /** q33/q38 kernel: MinHash band signatures — `bands` minima over the
    * k-gram shingle set, band b's hash = xxhash64(xxhash64(shingle), b)
    * (the k-from-1 scheme). Calls the SAME XXH64 kernel Spark's xxhash64
    * expression uses — seed 42, then hashLong for the 64-bit base, then
    * hashInt for the band id — so values are bit-identical to the
    * composed `transform(... xxhash64 ...)` form while doing ONE pass
    * over the grams instead of bands interpreted re-walks. */
  def minHashBands(s: UTF8String, k: Int, bands: Int): GenericArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val str = s.toString
    val offs = cpStarts(str)
    val cp = if (offs == null) str.length else offs.length - 1
    val n = gramCount(cp, k)
    val mins = new Array[Long](bands)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = XXH64.hashUTF8String(
        UTF8String.fromString(gram(str, offs, cp, i, k)), 42L)
      val seeded = XXH64.hashLong(base, 42L)
      var b = 0
      while (b < bands) {
        val h = XXH64.hashInt(b, seeded)
        if (h < mins(b)) mins(b) = h
        b += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** q36/q57/q65 kernel: n-bit SimHash over whitespace tokens of the
    * space-trimmed text; token hash = first ⌈bits/4⌉ hex digits of md5;
    * bit i of the result = sign of Σ_tokens (2·bit_i(hash) − 1) > 0. */
  def simHash(s: UTF8String, bits: Int): Long = {
    val hexChars = (bits + 3) / 4
    // UTF8String.trim() trims 0x20 only — same as Spark's trim()
    val toks = s.trim().toString.split("\\s+", -1)
    val counts = new Array[Int](bits)
    var t = 0
    while (t < toks.length) {
      val h = hexPrefix(md5(toks(t)), hexChars)
      var b = 0
      while (b < bits) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < bits) {
      if (counts(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** The depth md5-salted CMS buckets of a token in ONE pass: bucket r =
    * value of the first 8 hex digits of md5("r:" + token) mod width —
    * identical to `conv(substring(md5(concat('r:', t)), 1, 8), 16, 10)
    * % width`, without the per-row hex-string round-trips the composed
    * form pays depth times. */
  def cmsBuckets(t: UTF8String, depth: Int, width: Int): GenericArrayData = {
    val s = t.toString
    val out = new Array[Long](depth)
    var r = 0
    while (r < depth) {
      out(r) = hexPrefix(md5(r.toString + ":" + s), 8) % width
      r += 1
    }
    new GenericArrayData(out)
  }

  /** CMS point estimate against a LITERAL cell table (row-major,
    * cells(r·width + b)): min over rows of the token's cell — the
    * `least` of depth element_at lookups as one kernel, sharing the
    * bucket arithmetic above. */
  def cmsEstimate(t: UTF8String, cells: Array[Long], depth: Int, width: Int): Long = {
    val s = t.toString
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val b = (hexPrefix(md5(r.toString + ":" + s), 8) % width).toInt
      val c = cells(r * width + b)
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** First `hexChars` hex digits of md5(t) as an unsigned long — the
    * `conv(substring(md5(c), 1, n), 16, 10).cast("long")` idiom behind
    * the KMV/quantile sample hashes, without the hex-string round-trip
    * (n ≤ 15 so the value fits a long). */
  def md5Prefix(t: UTF8String, hexChars: Int): Long =
    hexPrefix(md5(t.toString), hexChars)

  // ---- Column constructors ----

  def md5_prefix_long(c: Column, hexChars: Int): Column =
    GraftColumnBridge.column(Md5PrefixLong(GraftColumnBridge.expression(c), hexChars))

  def cms_buckets(c: Column, depth: Int, width: Int): Column =
    GraftColumnBridge.column(CmsBucketsExpr(GraftColumnBridge.expression(c), depth, width))

  def cms_estimate(c: Column, cells: Array[Long], depth: Int, width: Int): Column =
    GraftColumnBridge.column(CmsEstimateExpr(GraftColumnBridge.expression(c), cells, depth, width))

  def min_gram_md5(c: Column, k: Int): Column =
    GraftColumnBridge.column(MinGramMd5Hex(GraftColumnBridge.expression(c), k))

  def winnow_fingerprints(c: Column, k: Int, w: Int): Column =
    GraftColumnBridge.column(WinnowFingerprints(GraftColumnBridge.expression(c), k, w))

  def simhash_md5(c: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHashMd5(GraftColumnBridge.expression(c), bits))

  def minhash_bands(c: Column, k: Int, bands: Int): Column =
    GraftColumnBridge.column(MinHashBandsExpr(GraftColumnBridge.expression(c), k, bands))

  def md5_band_sigs(c: Column, k: Int, bands: Int): Column =
    GraftColumnBridge.column(Md5BandSigsExpr(GraftColumnBridge.expression(c), k, bands))
}

/** Min over character k-grams of md5 hex — `array_min(transform(grams,
  * md5))` as one codegen-friendly kernel. */
case class MinGramMd5Hex(child: Expression, k: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(k >= 1)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    TextHash.minGramMd5(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.minGramMd5($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowed k-gram fingerprints (sorted distinct sliding-window minima of
  * 32-bit md5-prefix hashes). */
case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(k >= 1 && w >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash band signatures over character k-grams (xxhash64 k-from-1
  * scheme, values bit-identical to Spark's xxhash64 composition). */
case class MinHashBandsExpr(child: Expression, k: Int, bands: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(k >= 1 && bands >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.minHashBands(input.asInstanceOf[UTF8String], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.minHashBands($c, $k, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5-based band signatures over character k-grams (engine-portable,
  * DuckDB-reproducible banding for incremental dedup). */
case class Md5BandSigsExpr(child: Expression, k: Int, bands: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(k >= 1 && bands >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.md5BandSigs(input.asInstanceOf[UTF8String], k, bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.md5BandSigs($c, $k, $bands)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** n-bit SimHash over whitespace tokens with md5-prefix token hashes. */
case class SimHashMd5(child: Expression, bits: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(bits >= 1 && bits <= 60, "token hash is read from 15 hex chars max")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.simHash(input.asInstanceOf[UTF8String], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.simHash($c, $bits)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The depth CMS bucket ids of a token, one md5 pass each, no hex-string
  * round-trips — posexplode this where the composed form built an
  * `array(conv(substring(md5(...))...) % width, ...)`. */
case class CmsBucketsExpr(child: Expression, depth: Int, width: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(depth >= 1 && width >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextHash.cmsBuckets(input.asInstanceOf[UTF8String], depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.cmsBuckets($c, $depth, $width)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** CMS point estimate of a token against a literal cell table — the
  * sketch-only decision path's per-occurrence test (q124/q132) as one
  * kernel: depth salted md5 buckets + min over the literal cells. */
case class CmsEstimateExpr(child: Expression, cells: Array[Long], depth: Int, width: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(depth >= 1 && width >= 1 && cells.length == depth * width)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.cmsEstimate(input.asInstanceOf[UTF8String], cells, depth, width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cellsRef = ctx.addReferenceObj("cells", cells, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.cmsEstimate($c, $cellsRef, $depth, $width)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** First `hexChars` hex digits of an md5 as an unsigned long — one
  * digest, no hex string, no conv parse; the row-hash kernel behind the
  * KMV (q119) and sampled-quantile (q122) sketches' uniform hashes. */
case class Md5PrefixLong(child: Expression, hexChars: Int) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  require(hexChars >= 1 && hexChars <= 15, "value must fit an unsigned long")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextHash.md5Prefix(input.asInstanceOf[UTF8String], hexChars)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash$$.MODULE$$.md5Prefix($c, $hexChars)")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
