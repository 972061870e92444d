package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Distinct character n-gram shingles of a string, as one array per row.
  *
  * Semantics contract (oracle-checked): identical to
  * `array_distinct(transform(sequence(1, greatest(length(s)-n+1, 1)),
  * i -> substring(s, i, n)))` — SQL substring char semantics, and a
  * string shorter than n yields itself as its single shingle. The
  * round-1 formulation evaluated exactly that interpreted lambda per
  * document and then paid a full (doc_id, ng) `distinct` shuffle; this
  * expression dedups in-operator with one hash set per document, so the
  * explode emits already-distinct pairs and the shuffle disappears.
  *
  * Eval-based (CodegenFallback): one call per DOCUMENT row — the loop
  * over characters is compiled Scala, so there is nothing per-shingle
  * for the interpreter to do, unlike the per-element lambda it replaces.
  */
case class NgramShingles(child: Expression, n: Int)
  extends UnaryExpression with CodegenFallback {

  require(n > 0, "shingle width must be positive")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "ngram_shingles"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val len = s.numChars()
    // LinkedHashSet: dedup with deterministic (first-occurrence) order
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (len < n) {
      seen.add(s)
    } else {
      var i = 1
      val last = len - n + 1
      while (i <= last) {
        seen.add(s.substringSQL(i, n))
        i += 1
      }
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): NgramShingles =
    copy(child = newChild)
}

/** Size-capped distinct-collect over bigint keys: gathers at most `cap`
  * distinct values per group, then stops accepting. The library's
  * bounded-state building block for document-frequency capping
  * (`Dedup.shingles`): a stop-shingle appearing in millions of documents
  * costs O(cap) state on its reducer instead of an unbounded
  * `collect_set` — the difference between a skew-proof plan and an OOM
  * at 100 TB. Downstream keeps only groups with size ≤ cap−1 (i.e.
  * df ≤ maxDf), for which the set is exact, so which `cap` elements a
  * dropped group happened to retain can never surface in a result.
  *
  * Output is sorted ascending — deterministic results regardless of
  * arrival/merge order.
  */
case class CollectSetCapped(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashSet[Long]] {

  require(cap > 0, "cap must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "collect_set_capped"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input, got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null && buf.size() < cap) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = b.iterator()
    while (it.hasNext && a.size() < cap) a.add(it.next())
    a
  }

  override def eval(buf: java.util.HashSet[Long]): Any = {
    val arr = new Array[Long](buf.size())
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size() * java.lang.Long.BYTES)
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val set = new java.util.HashSet[Long](sz * 2)
    var i = 0
    while (i < sz) { set.add(bb.getLong()); i += 1 }
    set
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CollectSetCapped =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CollectSetCapped =
    copy(child = newChildren(0))
}
