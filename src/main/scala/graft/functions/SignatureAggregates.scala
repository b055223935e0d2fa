package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._

/** Single-pass signature aggregates for MinHash / SimHash.
  *
  * The relational alternative — 64 parallel `min`/conditional-`sum`
  * aggregates — materializes 64 aggregation expressions per group and was
  * the dominant bench cost at sf0.1 (8–22 s per query). These
  * `TypedImperativeAggregate`s fold the whole signature in ONE buffer
  * (`long[64]`) per group in one pass, with mergeable partials, so the
  * shuffle still carries one signature per (doc × partition) and the
  * per-row cost is 64 mixer ops instead of 64 aggregate-expression updates.
  *
  * Input is a single pre-computed 64-bit hash per element (one xxhash64 of
  * the shingle/token string); per-seed values derive from a splitmix64
  * finalizer over (hash, seed) — 3 multiply-xorshift rounds, no re-hash of
  * the string. MinHash only needs pairwise-independent-ish hash families,
  * not independent string hashes.
  */
object SignatureAggregates {

  /** splitmix64 finalizer — the standard 64-bit mixer. */
  @inline private[graft] def mix(h: Long, seed: Int): Long = {
    var z = h + 0x9E3779B97F4A7C15L * (seed + 1)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def longsToBytes(a: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(a.length * 8)
    a.foreach(bb.putLong)
    bb.array()
  }

  private def bytesToLongs(b: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(b)
    Array.fill(b.length / 8)(bb.getLong)
  }

  /** MinHash signature: sig(i) = min over input hashes h of mix(h, i).
    * Buffer = long[numHashes] starting at Long.MaxValue.
    */
  case class MinHashAgg(
      child: Expression,
      numHashes: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Long] = Array.fill(numHashes)(Long.MaxValue)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var i = 0
        while (i < numHashes) {
          val m = mix(h, i)
          if (m < buf(i)) buf(i) = m
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numHashes) { if (other(i) < buf(i)) buf(i) = other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = bytesToLongs(bytes)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(o: Int): MinHashAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MinHashAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): MinHashAgg = copy(child = c)
  }

  /** SimHash bit-counter: counts(j) += ±1 by bit j of each input hash;
    * eval assembles the 64-bit signature (bit j set iff counts(j) > 0).
    * Bit semantics identical to the 64-conditional-sum relational form.
    */
  case class SimHashAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val h = v.asInstanceOf[Long]
        var j = 0
        while (j < 64) {
          buf(j) += (if (((h >>> j) & 1L) == 1L) 1L else -1L)
          j += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var j = 0
      while (j < 64) { buf(j) += other(j); j += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = {
      var sig = 0L
      var j = 0
      while (j < 64) { if (buf(j) > 0) sig |= (1L << j); j += 1 }
      sig
    }

    override def serialize(buf: Array[Long]): Array[Byte] = longsToBytes(buf)
    override def deserialize(bytes: Array[Byte]): Array[Long] = bytesToLongs(bytes)

    override def dataType: DataType = LongType
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(o: Int): SimHashAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SimHashAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): SimHashAgg = copy(child = c)
  }

  // ------------------------------------------------------ Column wrappers

  /** Aggregate: MinHash signature (ARRAY<BIGINT> of length numHashes) over a
    * column of 64-bit element hashes.
    */
  def minhash_agg(hash: Column, numHashes: Int): Column =
    column(MinHashAgg(expression(hash), numHashes).toAggregateExpression())

  /** Aggregate: 64-bit SimHash over a column of 64-bit element hashes. */
  def simhash_agg(hash: Column): Column =
    column(SimHashAgg(expression(hash)).toAggregateExpression())
}
