package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass 128-way MinHash signature aggregate.
  *
  * Input: one pre-hashed shingle per row (`xxhash64(ng)` — codegen'd in
  * the projection feeding the aggregate). For each row the update folds
  * all 128 seeded re-hashes `XXH64.hashLong(h, seed=i)` into a mutable
  * 128-long buffer of running minima; partial (map-side) aggregation
  * collapses each partition to one buffer per doc BEFORE the shuffle,
  * so the exchange moves exactly docs × 128 longs.
  *
  * This replaces the round-1 formulation (`explode` of a 0..127 literal
  * array → per-(doc, i) min → array_sort reassembly), which multiplied
  * every shingle row 128× (~190M rows at sf0.1) ahead of the partial
  * aggregate and sorted with an interpreted lambda — the single largest
  * item of the round-1 bench miss (138.6 s; VERDICT.md). Row count into
  * the aggregate is now exactly the shingle count, and at 100 TB the
  * shuffle stays proportional to document count, not shingle × 128.
  *
  * Hash-family note: `hashLong(h, i)` over a 64-bit `xxhash64` shingle
  * hash is a seeded family with the same collision behavior as hashing
  * the string 128× (round 1 did `xxhash64(ng, i)`), at 1/128th the
  * string-scanning cost. The LSH banding guarantee (SURVEY §2C: with
  * 128 hashes in 32 bands, P(candidate | J ≥ 0.8) > 1 − 6e-8) is
  * family-agnostic, so the verified pair set — the oracle contract —
  * is unchanged.
  */
case class MinHash128(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val NumHashes = MinHash128.NumHashes

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash128"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint input (a pre-hashed shingle), got ${child.dataType.simpleString}")

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(NumHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < NumHashes) {
        val hi = XXH64.hashLong(h, i)
        if (hi < buf(i)) buf(i) = hi
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumHashes) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(NumHashes * java.lang.Long.BYTES)
    var i = 0
    while (i < NumHashes) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(NumHashes)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHash128 =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHash128 =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): MinHash128 =
    copy(child = newChildren(0))
}

object MinHash128 {
  val NumHashes = 128
}
