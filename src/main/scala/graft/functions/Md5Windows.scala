package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared md5 helpers for the compiled character-window kernels: one
  * reused MessageDigest per eval thread, digesting a byte RANGE of the
  * row's UTF-8 buffer in place — no per-window substring UTF8String,
  * no 32-char hex rendering, no `conv` hex-string parse. The VALUES
  * are the portable md5 prefixes the oracle replays
  * (`conv(substring(md5(s), 1, d), 16, 10)` = the first ⌈d/2⌉ digest
  * bytes read big-endian, shifted right 4 bits when d is odd).
  */
private[functions] object Md5Bytes {
  private val local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** First `hexDigits` hex digits of md5(bytes[off, off+len)) as an
    * unsigned bigint — exactly `conv(substring(md5(s), 1, hexDigits),
    * 16, 10)`. hexDigits ≤ 15 so the value fits a positive long.
    */
  def prefix(bytes: Array[Byte], off: Int, len: Int, hexDigits: Int): Long = {
    val md = local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    val nFull = hexDigits / 2
    while (i < nFull) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    if ((hexDigits & 1) == 1) v = (v << 4) | ((d(nFull) & 0xf0L) >> 4)
    v
  }
  /** Per-character byte start offsets of a UTF-8 buffer, plus the
    * terminal offset — `starts(numChars) = bytes.length`. A UTF-8
    * sequence's length is determined by its first byte, so one pass
    * suffices.
    */
  def charStarts(bytes: Array[Byte]): Array[Int] = {
    // worst case 1 byte per char
    val tmp = new Array[Int](bytes.length + 1)
    var i = 0
    var c = 0
    while (i < bytes.length) {
      tmp(c) = i
      i += UTF8String.numBytesForFirstByte(bytes(i))
      c += 1
    }
    tmp(c) = bytes.length
    java.util.Arrays.copyOf(tmp, c + 1)
  }
}

/** All `n`-character-window md5 prefix hashes of a string, in window
  * order: element i−1 is
  * `CAST(conv(substring(md5(substring(s, i, n)), 1, 8), 16, 10) AS
  * BIGINT)` for i in 1..len−n+1; EMPTY array when the string has fewer
  * than `n` characters (the caller's `length(text) >= n` filter
  * semantics). The md5 runs over the window's UTF-8 bytes — a
  * contiguous span of the row's buffer (character windows are byte
  * spans under the one-pass char-offset table), so the hash VALUES are
  * identical to the SQL form the oracle replays while the engine skips
  * the per-window substring allocation, the 32-hex rendering, and the
  * `conv` string parse.
  *
  * This is the KMV shingle kernel (Profiling.kmvShingleHashes): the
  * explode(sequence)+substring+md5+conv chain it replaces paid four
  * allocations per WINDOW on the corpus-token-scale frame.
  *
  * Eval-based (CodegenFallback): one call per row, compiled loop per
  * window — nothing per-window for the interpreter to do (the
  * TokenWindowHashes convention).
  */
case class CharWindowMd5Hashes(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n > 0, "window width must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_window_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = Md5Bytes.charStarts(bytes)
    val len = starts.length - 1
    if (len < n) return new GenericArrayData(Array.emptyLongArray)
    val count = len - n + 1
    val hs = new Array[Long](count)
    var i = 0
    while (i < count) {
      hs(i) = Md5Bytes.prefix(bytes, starts(i), starts(i + n) - starts(i), 8)
      i += 1
    }
    new GenericArrayData(hs)
  }

  override protected def withNewChildInternal(newChild: Expression): CharWindowMd5Hashes =
    copy(child = newChild)
}

/** Hashed character-BIGRAM bucket counts of a string, as ONE row-local
  * array [n_windows, count_0, …, count_{buckets−1}] — the language-ID
  * feature kernel (TextAnalysis.langFeaturesOf). Replicates the SQL
  * chain exactly:
  *
  *   explode(sequence(1, greatest(length(t) − 1, 1))) AS i
  *   → CAST(conv(substring(md5(substring(t, i, 2)), 1, 4), 16, 10)
  *       AS BIGINT) % buckets
  *   → groupBy(doc).agg(count(*), count per bucket)
  *
  * including the degenerate shapes that chain produces: an EMPTY
  * string still enumerates i = 1 (one window of md5("")), a 1-char
  * string hashes its single character, and the last window of a
  * longer string is the final 2-char span. The whole per-doc explode +
  * 5-column conditional-sum hash aggregate + doc-keyed join collapse
  * into this one projection — zero shuffle.
  */
case class CharBigramBucketCounts(child: Expression, buckets: Int)
  extends UnaryExpression with CodegenFallback {

  require(buckets > 0, "bucket count must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "char_bigram_buckets"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val starts = Md5Bytes.charStarts(bytes)
    val len = starts.length - 1
    val out = new Array[Long](1 + buckets)
    if (len == 0) {
      // sequence(1, greatest(-1+0, 1)... greatest(length-1,1) = 1):
      // one window, substring('', 1, 2) = '' — md5 of zero bytes
      out(0) = 1L
      out(1 + (Md5Bytes.prefix(bytes, 0, 0, 4) % buckets).toInt) += 1L
    } else {
      val nWin = math.max(len - 1, 1)
      out(0) = nWin.toLong
      var i = 0
      while (i < nWin) {
        // window i (0-based) spans chars [i, min(i+2, len))
        val hi = math.min(i + 2, len)
        val b = (Md5Bytes.prefix(bytes, starts(i), starts(hi) - starts(i), 4) % buckets).toInt
        out(1 + b) += 1L
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharBigramBucketCounts =
    copy(child = newChild)
}
