package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items sketch (the algorithm behind ClickHouse's
  * `topK`/`approx_top_k` family): at most `capacity` counters per
  * group, with the classic guarantees after any stream of N items
  *   - every item with true count > N/(capacity+1) is tracked, and
  *   - for tracked items, true − N/(capacity+1) ≤ estimate ≤ true.
  *
  * Merging (Agarwal et al., "Mergeable Summaries", PODS'12) sums
  * counter maps and, when over capacity, subtracts the (capacity+1)-th
  * largest estimate from every counter and drops the non-positive ones
  * — error bounds add across partials, so the global bound N/(cap+1)
  * survives map-side partial aggregation. That makes the sketch's
  * shuffle footprint `capacity` rows per partition regardless of input
  * size — the exact `groupBy(token).count()` it replaces shuffles one
  * row per DISTINCT token, unbounded at 100 TB.
  *
  * The estimates depend on encounter order (any MG implementation's
  * do), so oracle-checked queries use the sketch as a CANDIDATE
  * generator and re-count candidates exactly (see
  * [[graft.ext.Profiling.heavyHitters]]) — the sketch-then-verify
  * pattern the dedup family uses. The bounds themselves are
  * spec-checked (ExtSpec).
  */
case class FreqSketch(
    item: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[FreqBuffer] {

  require(capacity > 0, "capacity must be positive")

  override def children: Seq[Expression] = Seq(item)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (item.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${item.dataType.simpleString}")

  override def createAggregationBuffer(): FreqBuffer = new FreqBuffer(capacity)

  override def update(buf: FreqBuffer, input: InternalRow): FreqBuffer = {
    val v = item.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }

  override def merge(a: FreqBuffer, b: FreqBuffer): FreqBuffer = { a.mergeIn(b); a }

  /** All tracked counters, (est DESC, item ASC). */
  override def eval(buf: FreqBuffer): Any =
    new GenericArrayData(buf.sortedEntries.map { case (s, c) =>
      InternalRow(UTF8String.fromString(s), c)
    })

  override def serialize(buf: FreqBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): FreqBuffer =
    FreqBuffer.fromBytes(capacity, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(item = newChildren(0))
}

/** Bounded counter map with the MG decrement rule. The decrement pass
  * costs O(capacity) but fires at most N/capacity times over a stream
  * of N adds (each firing retires `capacity` units of count), so the
  * amortized per-add cost stays O(1).
  */
final class FreqBuffer(capacity: Int) {
  private[functions] val counts = new java.util.HashMap[String, Long](capacity * 2)

  def add(x: String, by: Long = 1L): Unit = {
    // getOrDefault: plain get returns null for untracked keys and would
    // NPE on primitive unboxing; counters are always > 0 once stored
    val cur = counts.getOrDefault(x, 0L)
    if (cur > 0L) counts.put(x, cur + by)
    else if (counts.size < capacity) counts.put(x, by)
    else {
      // decrement-all by the new item's weight (min-capped so weighted
      // merge adds cannot drive counters negative asymmetrically)
      var dec = by
      val it0 = counts.values().iterator()
      while (it0.hasNext) { val v = it0.next(); if (v < dec) dec = v }
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val nv = e.getValue - dec
        if (nv <= 0L) it.remove() else e.setValue(nv)
      }
      if (by > dec) add(x, by - dec)
    }
  }

  def mergeIn(other: FreqBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      counts.put(e.getKey, counts.getOrDefault(e.getKey, 0L) + e.getValue)
    }
    if (counts.size > capacity) {
      // subtract the (capacity+1)-th largest estimate from everything
      // and drop the non-positive rest — the PODS'12 mergeable-
      // summaries step; error bounds of the two inputs add
      val vals = new Array[Long](counts.size)
      var i = 0
      val vi = counts.values().iterator()
      while (vi.hasNext) { vals(i) = vi.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue - cut
        if (nv <= 0L) ei.remove() else e.setValue(nv)
      }
    }
  }

  def sortedEntries: Array[(String, Long)] = {
    val arr = new Array[(String, Long)](counts.size)
    var i = 0
    val it = counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); arr(i) = (e.getKey, e.getValue); i += 1 }
    scala.util.Sorting.stableSort(arr,
      (a: (String, Long), b: (String, Long)) => a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
    arr
  }

  def toBytes: Array[Byte] = {
    val entries = sortedEntries.map { case (s, c) => (s.getBytes(StandardCharsets.UTF_8), c) }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }
}

object FreqBuffer {
  def fromBytes(capacity: Int, bytes: Array[Byte]): FreqBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new FreqBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.counts.put(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }
}
