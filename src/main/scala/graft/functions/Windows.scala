package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** All `w`-token window hashes of a string, in window order: element
  * i−1 is `xxhash64` of the bytes of `concat_ws(' ', tokens[i..i+w−1])`
  * under whitespace tokenization `split(text, ' ')` (empty tokens kept,
  * like the SQL function). Empty array when the text has fewer than `w`
  * tokens.
  *
  * This is the windowing kernel of the duplicated-span detector
  * (Dedup.duplicatedSpans). The HOF formulation it replaces —
  * `transform(sequence(…), i -> md5(concat_ws(' ', slice(toks, i, w))))`
  * — paid an interpreted lambda invocation, an array slice copy, a
  * concat allocation, and an md5 per WINDOW; here a window's bytes are
  * a contiguous span of the original buffer (tokens are space-separated
  * substrings of it), so each hash reads the input in place and the
  * whole row costs one compiled loop. Downstream only ever compares
  * windows for EQUALITY, so the hash choice is free as long as it is
  * injective on the observed windows (same argument, same 64-bit hash
  * family, as [[NgramShingles]] — the oracle keeps md5 strings and the
  * COUNTS match unless xxhash64 collides, verified collision-free at
  * the test scales); shuffle rows shrink from 32-hex md5 strings to 8
  * bytes.
  *
  * Eval-based (CodegenFallback): one call per row, compiled loop per
  * window — nothing per-window for the interpreter to do.
  */
case class TokenWindowHashes(child: Expression, w: Int)
  extends UnaryExpression with CodegenFallback {

  require(w > 0, "window width must be positive")

  private val Seed = 42L // xxhash64's default seed

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "token_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val nBytes = s.numBytes
    val base = s.getBaseObject
    val off = s.getBaseOffset
    // token start offsets: 0 and every byte after a 0x20. A space byte
    // can only BE a space in UTF-8 (continuation bytes are >= 0x80), so
    // byte scanning is multi-byte-safe.
    var nTokens = 1
    var i = 0
    while (i < nBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) nTokens += 1
      i += 1
    }
    if (nTokens < w) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < nBytes) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + i) == 0x20) {
        starts(t) = i + 1; t += 1
      }
      i += 1
    }
    starts(nTokens) = nBytes + 1 // sentinel: "start" of the one-past-end token
    val count = nTokens - w + 1
    val hs = new Array[Long](count)
    var k = 0
    while (k < count) {
      // window k (0-based) spans tokens k..k+w-1: bytes from starts(k)
      // to the byte before the space preceding starts(k+w)
      val b0 = starts(k)
      val b1 = starts(k + w) - 1 // exclusive: the separator position
      hs(k) = XXH64.hashUnsafeBytes(base, off + b0, b1 - b0, Seed)
      k += 1
    }
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenWindowHashes =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer et al. SIGMOD'03): md5
  * hex digests of the `w`-token windows selected by winnowing with
  * window `k` under the RIGHTMOST-minimal rule, one entry per distinct
  * selected position, in position order — exactly the semantics of the
  * HOF formulation
  * `array_distinct(transform(sequence(1, n−k+1), j -> rightmost argmin
  * of slice(hs, j, k)))` over
  * `hs = transform(sequence(…), i -> md5(concat_ws(' ', slice(toks, i, w))))`
  * and of the DuckDB oracle (the agreement is spec-asserted against the
  * retained SQL formulation).
  *
  * The HOF chain paid an interpreted lambda + slice copy + reverse copy
  * + two array scans per POSITION on top of a concat + md5 per window —
  * measured 468 s for the sf0.1 corpus in BENCH. Here each window's
  * bytes are a contiguous span of the original buffer (single-space
  * tokenization rejoins losslessly, so `concat_ws(' ', slice(toks,i,w))`
  * IS the byte span), one reused MessageDigest hashes them in place,
  * digests compare as unsigned 16-byte arrays (identical order to
  * comparing their lowercase-hex renderings), and the k-window minimum
  * ROLLS via a monotonic deque — amortized O(1) per window, with the
  * `cmp ≥ 0` pop making the NEWEST of equal minima win (the rightmost
  * rule). Only the selected digests are hex-rendered.
  */
case class WinnowSelect(child: Expression, w: Int, k: Int)
  extends UnaryExpression with CodegenFallback {

  require(w > 0 && k > 0, "window and winnow widths must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_select"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  private val HexDigits = "0123456789abcdef".toCharArray

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val bytes = s.getBytes
    val n = bytes.length
    var nTokens = 1
    var i = 0
    while (i < n) { if (bytes(i) == 0x20) nTokens += 1; i += 1 }
    if (nTokens < w) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < n) { if (bytes(i) == 0x20) { starts(t) = i + 1; t += 1 }; i += 1 }
    starts(nTokens) = n + 1
    val nWin = nTokens - w + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](nWin)
    var j = 0
    while (j < nWin) {
      val b0 = starts(j)
      val b1 = starts(j + w) - 1 // exclusive: the separator position
      md.reset()
      md.update(bytes, b0, b1 - b0)
      digests(j) = md.digest()
      j += 1
    }
    // selected positions are non-decreasing as the window slides, so
    // consecutive-dedup IS distinct
    val sel = new scala.collection.mutable.ArrayBuffer[Int]()
    def record(pos: Int): Unit =
      if (sel.isEmpty || sel(sel.length - 1) != pos) sel += pos
    if (nWin < k) {
      // degenerate winnow: one fingerprint, the rightmost min of all
      var best = 0
      j = 1
      while (j < nWin) {
        if (java.util.Arrays.compareUnsigned(digests(j), digests(best)) <= 0) best = j
        j += 1
      }
      record(best)
    } else {
      // monotonic deque of candidate indices; pop-on->= keeps the
      // NEWEST of equal minima (rightmost rule)
      val dq = new Array[Int](nWin)
      var head = 0
      var tail = 0 // exclusive
      j = 0
      while (j < nWin) {
        while (tail > head &&
          java.util.Arrays.compareUnsigned(digests(dq(tail - 1)), digests(j)) >= 0) tail -= 1
        dq(tail) = j; tail += 1
        val winStart = j - k + 1
        if (dq(head) < winStart) head += 1
        if (winStart >= 0) record(dq(head))
        j += 1
      }
    }
    val out = new Array[Any](sel.length)
    var o = 0
    while (o < sel.length) {
      val d = digests(sel(o))
      val hex = new Array[Char](32)
      var b = 0
      while (b < 16) {
        hex(2 * b) = HexDigits((d(b) >> 4) & 0xf)
        hex(2 * b + 1) = HexDigits(d(b) & 0xf)
        b += 1
      }
      out(o) = UTF8String.fromString(new String(hex))
      o += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

/** Content-defined-chunking boundary positions: the 1-based char
  * positions `i ≤ numChars−7` where the base-31 polynomial hash of the
  * 8-char window starting at `i` is ≡ 0 (mod 64) — exactly the
  * semantics of the HOF formulation
  * `filter(sequence(1, len−7), i -> (Σ ascii(substring(text, i+j, 1))·31^(7−j)) % 64 = 0)`
  * and of the DuckDB oracle, with ascii() = first code point.
  *
  * The HOF paid 8 `substring` calls per POSITION, and `UTF8String`
  * substring is an O(position) scan — O(n²·8) per document, measured
  * 26 s for the sf0.1 corpus. Here the code-point array is built once
  * (O(n)) and the window hash ROLLS: h' = (h − c₀·31⁷)·31 + c₈ — one
  * multiply-add per position, exact in Long (max |h·31| ≈ 1.7e14).
  */
case class CdcBoundaryPositions(child: Expression)
  extends UnaryExpression with CodegenFallback {

  private val W = 8
  private val Mod = 64
  private val Pow7 = 27512614111L // 31^7

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_boundary_positions"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    // code points once; ASCII fast path reads bytes straight through
    val cps: Array[Int] =
      if (s.numBytes == s.numChars) {
        val a = new Array[Int](s.numBytes)
        var i = 0
        while (i < a.length) {
          a(i) = org.apache.spark.unsafe.Platform.getByte(s.getBaseObject, s.getBaseOffset + i) & 0xff
          i += 1
        }
        a
      } else s.toString.codePoints().toArray
    val n = cps.length
    if (n < W) return new GenericArrayData(Array.emptyIntArray)
    var h = 0L
    var j = 0
    while (j < W) { h = h * 31 + cps(j); j += 1 }
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0 // 0-based window start
    while (i <= n - W) {
      if (h % Mod == 0) out += (i + 1)
      if (i < n - W) h = (h - cps(i) * Pow7) * 31 + cps(i + W)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaryPositions =
    copy(child = newChild)
}
