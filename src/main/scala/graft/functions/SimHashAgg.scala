package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass SimHash-64 vote aggregate over md5-derived bit sources.
  *
  * Input: the token digest's first 16 hex digits packed into two 32-bit
  * halves (`conv(substring(md5(tok), 1|9, 8), 16, 10)` — computed once
  * per TOKEN in the projection feeding the aggregate). The update folds
  * all 64 ±1 bit votes into an `Array[Int](64)` buffer; eval renders
  * the majority fingerprint as the 16-char hex string the DuckDB oracle
  * computes (bit j = bit (j%4) of hex digit (j div 4), i.e. shift
  * 4·(7 − (j div 4) mod 8) + j mod 4 on the matching half).
  *
  * Replaces the explode-by-64 formulation (16M rows at sf0.1 through
  * two shuffle aggregates + a per-doc sort lambda): the aggregate input
  * is exactly the token count and the shuffle carries one 64-int buffer
  * per doc per partition — the same no-blowup shape as [[MinHash128]].
  */
case class SimHashAgg(
    h1: Expression,
    h2: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(h1, h2)
  override def nullable: Boolean = false
  override def dataType: DataType = StringType
  override def prettyName: String = "simhash_md5"

  override def checkInputDataTypes(): TypeCheckResult =
    if (h1.dataType == LongType && h2.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two bigint inputs (packed digest halves), got " +
        s"(${h1.dataType.simpleString}, ${h2.dataType.simpleString})")

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val a = h1.eval(input)
    val b = h2.eval(input)
    if (a != null && b != null) {
      val va = a.asInstanceOf[Long]
      val vb = b.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        val half = if (j < 32) va else vb
        val shift = 4 * (7 - (j / 4) % 8) + j % 4
        if (((half >> shift) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    val hex = "0123456789abcdef"
    val out = new Array[Char](16)
    var k = 0
    while (k < 16) {
      var dv = 0
      var m = 0
      while (m < 4) {
        if (buf(4 * k + m) > 0) dv |= 1 << m
        m += 1
      }
      out(k) = hex.charAt(dv)
      k += 1
    }
    UTF8String.fromString(new String(out))
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * Integer.BYTES)
    var j = 0
    while (j < 64) { bb.putInt(buf(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(h1 = newChildren(0), h2 = newChildren(1))
}
