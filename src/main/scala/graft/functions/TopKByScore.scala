package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the k best (score, id) pairs per
  * group, ordered by (score DESC, id ASC).
  *
  * This replaces the `Window.partitionBy(query).orderBy(...)` +
  * `row_number ≤ k` ranking in the similarity queries. The window form
  * shuffles EVERY scored row to its query's single reducer — fine for
  * 10 queries over 2k vectors, a funnel at 100 TB where one query key
  * can receive the whole corpus's scores. As an aggregate, partial
  * (map-side) evaluation bounds what crosses the wire to k rows per
  * (partition, query): the shuffle is O(partitions × k), not O(corpus).
  * State is a fixed 2k-slot buffer per group — skew-proof by
  * construction (VERDICT.md round-1 design note 6).
  *
  * Determinism: callers pass an already-rounded score (the 6-dp oracle
  * contract), so the (score DESC, id ASC) order — including the
  * worst-element eviction decision — is identical to the window
  * formulation it replaces.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, bigint) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = { a.mergeIn(b); a }

  override def eval(buf: TopKBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) =>
      InternalRow(s, i)
    })
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer = TopKBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

/** Fixed-capacity top-k holder: collects into a 2k scratch array and
  * compacts (sort + trim to k) when full — amortized O(log k) per
  * insert with zero allocation on the hot path.
  */
final class TopKBuffer(k: Int) {
  private val cap = math.max(2 * k, 8)
  private var scores = new Array[Double](cap)
  private var ids = new Array[Long](cap)
  private var size = 0
  // kth-best bound from the last compaction that saw ≥ k entries: any
  // entry not strictly better than it can never enter the final top-k
  // (entries only ever get evicted, never resurrected), so the hot path
  // drops it without touching the arrays
  private var hasBound = false
  private var boundScore = 0.0
  private var boundId = 0L

  /** (score DESC, id ASC) — true when (s1, i1) ranks strictly better. */
  @inline private def better(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 > s2 || (s1 == s2 && i1 < i2)

  def insert(s: Double, i: Long): Unit = {
    if (hasBound && !better(s, i, boundScore, boundId)) return
    if (size == cap) compact()
    scores(size) = s; ids(size) = i; size += 1
  }

  private def compact(): Unit = {
    val idx = Array.range(0, size).sortWith((a, b) =>
      better(scores(a), ids(a), scores(b), ids(b)))
    val n = math.min(k, size)
    val ns = new Array[Double](cap); val ni = new Array[Long](cap)
    var j = 0
    while (j < n) { ns(j) = scores(idx(j)); ni(j) = ids(idx(j)); j += 1 }
    scores = ns; ids = ni; size = n
    if (n == k) { hasBound = true; boundScore = ns(k - 1); boundId = ni(k - 1) }
  }

  def mergeIn(other: TopKBuffer): Unit = {
    var j = 0
    while (j < other.size) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  def sortedEntries: Array[(Double, Long)] = {
    compact()
    Array.tabulate(size)(j => (scores(j), ids(j)))
  }

  def toBytes: Array[Byte] = {
    compact()
    val bb = ByteBuffer.allocate(4 + size * 16)
    bb.putInt(size)
    var j = 0
    while (j < size) { bb.putDouble(scores(j)); bb.putLong(ids(j)); j += 1 }
    bb.array()
  }
}

object TopKBuffer {
  def fromBytes(k: Int, bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.insert(bb.getDouble, bb.getLong); j += 1 }
    buf
  }
}

/** [[TopKByScore]] with STRING ids (round 14): k best (score, id)
  * pairs per group ordered by (score DESC, id ASC), the tiebreak in
  * UTF8String binary order — which is both Spark's own string sort
  * order and DuckDB's default varchar collation, so a `row_number()
  * OVER (ORDER BY score DESC, id ASC)` oracle replays it exactly.
  * Built for per-language vocabulary top-N (`x_zipf_fit`): the window
  * form sorts each language's ENTIRE vocabulary on one reducer; as an
  * aggregate, map-side partials bound the shuffle to k entries per
  * (partition, language) whatever the vocabulary size.
  */
case class TopKByScoreStr(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKStrBuffer] {

  require(k > 0, "k must be positive")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "topk_by_score_str"

  override def checkInputDataTypes(): TypeCheckResult =
    if (score.dataType == DoubleType && id.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (double, string) inputs, got " +
        s"(${score.dataType.simpleString}, ${id.dataType.simpleString})")

  override def createAggregationBuffer(): TopKStrBuffer = new TopKStrBuffer(k)

  override def update(buf: TopKStrBuffer, input: InternalRow): TopKStrBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    // clone: an UnsafeRow-backed UTF8String is a view over a reused
    // buffer — storing it without copying would alias later rows
    if (s != null && i != null)
      buf.insert(s.asInstanceOf[Double],
        i.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].clone())
    buf
  }

  override def merge(a: TopKStrBuffer, b: TopKStrBuffer): TopKStrBuffer = { a.mergeIn(b); a }

  override def eval(buf: TopKStrBuffer): Any = {
    val sorted = buf.sortedEntries
    new GenericArrayData(sorted.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(buf: TopKStrBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKStrBuffer = TopKStrBuffer.fromBytes(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScoreStr =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKByScoreStr =
    copy(score = newChildren(0), id = newChildren(1))
}

/** [[TopKBuffer]]'s string-id sibling — same 2k scratch + compact
  * discipline, tiebreak by UTF8String binary compare.
  */
final class TopKStrBuffer(k: Int) {
  import org.apache.spark.unsafe.types.UTF8String
  private val cap = math.max(2 * k, 8)
  private var scores = new Array[Double](cap)
  private var ids = new Array[UTF8String](cap)
  private var size = 0
  private var hasBound = false
  private var boundScore = 0.0
  private var boundId: UTF8String = null

  @inline private def better(s1: Double, i1: UTF8String, s2: Double, i2: UTF8String): Boolean =
    s1 > s2 || (s1 == s2 && i1.compareTo(i2) < 0)

  def insert(s: Double, i: UTF8String): Unit = {
    if (hasBound && !better(s, i, boundScore, boundId)) return
    if (size == cap) compact()
    scores(size) = s; ids(size) = i; size += 1
  }

  private def compact(): Unit = {
    val idx = Array.range(0, size).sortWith((a, b) =>
      better(scores(a), ids(a), scores(b), ids(b)))
    val n = math.min(k, size)
    val ns = new Array[Double](cap); val ni = new Array[UTF8String](cap)
    var j = 0
    while (j < n) { ns(j) = scores(idx(j)); ni(j) = ids(idx(j)); j += 1 }
    scores = ns; ids = ni; size = n
    if (n == k) { hasBound = true; boundScore = ns(k - 1); boundId = ni(k - 1) }
  }

  def mergeIn(other: TopKStrBuffer): Unit = {
    var j = 0
    while (j < other.size) { insert(other.scores(j), other.ids(j)); j += 1 }
  }

  def sortedEntries: Array[(Double, UTF8String)] = {
    compact()
    Array.tabulate(size)(j => (scores(j), ids(j)))
  }

  def toBytes: Array[Byte] = {
    compact()
    var bytes = 4
    var j = 0
    while (j < size) { bytes += 12 + ids(j).numBytes(); j += 1 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(size)
    j = 0
    while (j < size) {
      bb.putDouble(scores(j))
      val b = ids(j).getBytes
      bb.putInt(b.length); bb.put(b)
      j += 1
    }
    bb.array()
  }
}

object TopKStrBuffer {
  import org.apache.spark.unsafe.types.UTF8String
  def fromBytes(k: Int, bytes: Array[Byte]): TopKStrBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKStrBuffer(k)
    var j = 0
    while (j < n) {
      val s = bb.getDouble
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.insert(s, UTF8String.fromBytes(b))
      j += 1
    }
    buf
  }
}
