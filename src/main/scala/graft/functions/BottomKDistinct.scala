package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded KMV insert as an aggregate: the k smallest DISTINCT bigint
  * values per group, ascending (`x_kmv_overlap`, round 16).
  *
  * [[TopKByScore]] cannot serve the KMV sketch: it keeps duplicate ids,
  * so the k-minimum-VALUES set semantics would need a corpus-wide
  * `distinct` shuffle in front of it — exactly the pass the sketch
  * exists to avoid (the HLL argument: the sketch absorbs duplicates,
  * so one scan collapses to k rows per group with map-side partials).
  * The buffer is the textbook KMV structure — a capped ordered set:
  * insert is a no-op when the value is already present OR not below
  * the current k-th minimum, which makes the aggregate IDEMPOTENT
  * under re-delivery (the streaming twin's at-least-once safety, same
  * property class as HLL's register max) and associative under any
  * partitioning (merge = re-insert — bottomk(A ∪ B) =
  * bottomk(bottomk(A) ∪ bottomk(B)), the mergeability theorem the
  * ProfilingSpec asserts).
  *
  * State: ≤ k boxed longs in a TreeSet per group — k is a sketch
  * parameter (64 here), not data-driven, so state is bounded by
  * construction at any corpus size.
  */
case class BottomKDistinct(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BottomKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottomk_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): BottomKBuffer = new BottomKBuffer(k)

  override def update(buf: BottomKBuffer, input: InternalRow): BottomKBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: BottomKBuffer, b: BottomKBuffer): BottomKBuffer = {
    a.mergeIn(b); a
  }

  override def eval(buf: BottomKBuffer): Any =
    new GenericArrayData(buf.sortedValues)

  override def serialize(buf: BottomKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): BottomKBuffer =
    BottomKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BottomKDistinct =
    copy(child = newChildren(0))
}

/** Capped ordered distinct set of longs — at most k entries, smallest
  * kept. The hot path is a single `last` compare: once the set is
  * full, any value ≥ the current maximum is rejected without touching
  * the tree.
  */
final class BottomKBuffer(k: Int) {
  private val set = new java.util.TreeSet[java.lang.Long]()

  def insert(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last) { if (set.add(v)) { set.pollLast(); () } }
  }

  def mergeIn(other: BottomKBuffer): Unit = {
    val it = other.set.iterator()
    while (it.hasNext) insert(it.next())
  }

  def sortedValues: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    out
  }

  def toBytes: Array[Byte] = {
    val vs = sortedValues
    val bb = ByteBuffer.allocate(4 + vs.length * 8)
    bb.putInt(vs.length)
    var j = 0
    while (j < vs.length) { bb.putLong(vs(j)); j += 1 }
    bb.array()
  }
}

object BottomKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): BottomKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new BottomKBuffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getLong); j += 1 }
    buf
  }
}
