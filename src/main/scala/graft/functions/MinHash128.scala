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

/** Per-row banded MinHash: the whole signature + banding stage as ONE
  * narrow projection over a document's (distinct, pre-hashed) shingle
  * array — no aggregate, no shuffle, no intermediate 128-long signature
  * row. Output is `bands` band signatures; two documents land in the
  * same LSH bucket for band `b` iff their `b`-th outputs are equal.
  *
  * Same hash family as [[MinHash128]] (`XXH64.hashLong(h, seed = i)`
  * running minima), so the per-band minima are IDENTICAL to banding the
  * aggregate's signature; the band fold is an XXH64 chain over the
  * band's minima (vs `hash(slice(sig, …))` before) — any deterministic
  * injective-up-to-collision fold yields the same candidate set modulo
  * a ~2⁻⁶⁴ chain collision, and candidates are exact-verified anyway.
  *
  * Why per-row beats the aggregate shape here: the input row already IS
  * the per-document shingle set ([[graft.ext.Dedup]]'s doc-set frame),
  * so a groupBy would shuffle docs × 128 longs only to recombine rows
  * that were never split. At 100 TB the doc-set frame is the thing that
  * scales (rows bounded by corpus size, arrays bounded by doc length),
  * and this expression keeps signature generation embarrassingly
  * parallel on top of it.
  */
case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(bands > 0 && numHashes % bands == 0,
    s"numHashes ($numHashes) must be a positive multiple of bands ($bands)")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> (pre-hashed shingles), got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var j = 0
    while (j < n) {
      val h = arr.getLong(j)
      var i = 0
      while (i < numHashes) {
        val hi = XXH64.hashLong(h, i)
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    val rows = numHashes / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0L
      var r = 0
      while (r < rows) { acc = XXH64.hashLong(mins(b * rows + r), acc); r += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)
}
