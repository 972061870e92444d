package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass Gram/covariance-matrix aggregate: Σ x·xᵀ over quantized
  * integer vectors, accumulated exactly in a dim·(dim+1)/2 Long buffer
  * (the matrix is symmetric — only the upper triangle is carried
  * through update/merge; eval expands to the full row-major dim²
  * array).
  *
  * This is the distributed half of PCA/whitening: the corpus is
  * scanned ONCE, each partition folds its vectors into a ~16 KB
  * triangle buffer, and the shuffle carries one buffer per partition —
  * no dim²-per-row explode (the naive SQL formulation the oracle runs
  * at sf scale), no second pass. Inputs are integer-quantized
  * upstream, so partial-aggregation order cannot change a single bit
  * of the result — the property the engine-portable eigensolve on top
  * relies on. Overflow bound: |entry| ≤ rows · max(xq)²; at the 1e-4
  * quantization of unit-norm embeddings (|xq| ≲ 10⁴) Long holds past
  * 9e10 rows — switch the buffer to BigInt pairs beyond that, the
  * operator contract is unchanged.
  */
case class OuterProductAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "outer_product_q"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if dim > 0 => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input and dim > 0, got ${other.simpleString} / dim=$dim")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dim * (dim + 1) / 2)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"$prettyName: vector of ${arr.numElements()} elements, expected $dim")
      // checkInputDataTypes accepts containsNull=true arrays (the
      // upstream transform() can't prove non-null), but getLong on a
      // null slot reads undefined buffer contents and would silently
      // corrupt the Gram matrix — reject null elements loudly instead
      // (ADVICE r11). One O(dim) pass; the products below touch each
      // element ~dim/2 times, so the check is noise.
      var i = 0
      while (i < dim) {
        if (arr.isNullAt(i)) throw new IllegalArgumentException(
          s"$prettyName: null element at index $i — quantized embeddings must be non-null")
        i += 1
      }
      var j = 0
      var idx = 0
      while (j < dim) {
        val xj = arr.getLong(j)
        var k = j
        while (k < dim) {
          buf(idx) += xj * arr.getLong(k)
          idx += 1
          k += 1
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val full = new Array[Long](dim * dim)
    var j = 0
    var idx = 0
    while (j < dim) {
      var k = j
      while (k < dim) {
        full(j * dim + k) = buf(idx)
        full(k * dim + j) = buf(idx)
        idx += 1
        k += 1
      }
      j += 1
    }
    new GenericArrayData(full)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * java.lang.Long.BYTES)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(dim * (dim + 1) / 2)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): OuterProductAgg =
    copy(child = newChildren(0))
}
