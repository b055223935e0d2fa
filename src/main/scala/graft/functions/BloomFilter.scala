package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ShiftRightUnsigned}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._

/** Bloom-filter primitives with ENGINE-RECOMPUTABLE bit positions.
  *
  * The bit positions are Kirsch–Mitzenmacher double hashing over the
  * portable content fingerprint: `pos_j = (h1 + j·h2) mod p mod m` with
  * `h1 = (fp + s1)·2654435761 mod p`, `h2 = (fp + s2)·2246822519 mod (p−1) + 1`
  * (`p = 1e9+7`; the odd step makes h2 item-dependent, the classic FP-rate
  * fix over a constant stride). Every operation is exact BIGINT arithmetic
  * with all intermediates < 2^63 (max (fp+s)·c ≈ 2e9 · 2.65e9 ≈ 5.3e18),
  * so any engine — including the DuckDB oracle — reproduces the positions,
  * and therefore the filter's exact accept/reject behavior INCLUDING its
  * false positives, bit for bit. A conventional filter keyed on an
  * engine-private hash (xxhash64, murmur) can only be tested
  * semantically; this one is testable as arithmetic.
  *
  * The filter itself is an `ARRAY<BIGINT>` of m/64 words. Building is a
  * single-pass [[BitSetOrAgg]] — OR is commutative/associative/idempotent,
  * so partials merge in any order (map-side combine) and re-adding an
  * element is a no-op: the aggregate is deterministic under any
  * partitioning and retry.
  */
object BloomFilter {

  val P: Long = 1000000007L
  private val Knuth1 = 2654435761L
  private val Knuth2 = 2246822519L
  private val SaltOffset = 1315423911L

  /** Seed reduced mod p first, so (fp + seed') · c never wraps 64-bit —
    * same contract as TextAnalysis's salted selector.
    */
  def reduceSeed(seed: Long): Long = ((seed % P) + P) % P

  /** The j-th bit position for a document with portable fingerprint `fp`
    * (a BIGINT column in [0, p)). Pure codegen arithmetic, no UDF.
    *
    * `h2 = x mod (p−1) + 1` ∈ [1, p−1] — NEVER ≡ 0 mod p, so the k
    * probes are always distinct residues (p prime ⇒ any nonzero step
    * generates them all). The earlier `(x mod p) | 1` form had a
    * 1-in-1e9 degenerate: when `x mod p = p−1` (even), OR-ing 1 yields
    * exactly p ≡ 0, collapsing all k positions onto h1 — such an item's
    * false-positive rate became the filter FILL instead of fill^k.
    * Intermediates stay < 2^63 ((fp+s) < 2p ≈ 2.1e9, ×Knuth2 ≈ 4.8e18),
    * so the oracle replays the same expression without pre-reduction.
    */
  def position(fp: Column, seed: Long, j: Int, mBits: Int): Column = {
    val s1 = reduceSeed(seed)
    val s2 = (s1 + SaltOffset) % P
    val h1 = pmod((fp + lit(s1)) * lit(Knuth1), lit(P))
    val h2 = pmod((fp + lit(s2)) * lit(Knuth2), lit(P - 1)) + lit(1L)
    pmod(pmod(h1 + lit(j.toLong) * h2, lit(P)), lit(mBits.toLong))
  }

  /** All k positions as an `ARRAY<BIGINT>` — unrolled (k is small and
    * fixed), so the whole thing stays inside whole-stage codegen instead
    * of a CodegenFallback higher-order function.
    */
  def positions(fp: Column, seed: Long, k: Int, mBits: Int): Column =
    array((0 until k).map(j => position(fp, seed, j, mBits)): _*)

  /** True iff ALL k positions for `fp` are set in `words` (the filter's
    * m/64 BIGINT words) — the Bloom membership test, unrolled and
    * codegen-friendly (bit test = element_at + unsigned shift + mask).
    */
  def mightContain(words: Column, fp: Column, seed: Long, k: Int,
                   mBits: Int): Column =
    (0 until k).map { j =>
      val pos = position(fp, seed, j, mBits)
      // word index: pos < mBits ≤ 2^26 ≪ 2^53, so the double division in
      // floor() is exact; element_at is 1-based
      val word = element_at(words, (floor(pos / 64L).cast(IntegerType) + 1))
      val bit = column(ShiftRightUnsigned(expression(word),
        expression(pmod(pos, lit(64L)).cast(IntegerType))))
      bit.bitwiseAND(lit(1L)) === lit(1L)
    }.reduce(_ && _)

  /** Single-pass bit-set OR aggregate: input is an `ARRAY<BIGINT>` of bit
    * positions in [0, mBits); output the filter's `ARRAY<BIGINT>` words.
    * Buffer = long[(mBits+63)/64] per group per partition; size mBits so
    * the buffer fits comfortably in the aggregate hash map (2^20 bits =
    * 16 KB; shard the filter — [[graft.operators.SeenFilter]] — rather
    * than growing one buffer past ~2^24 bits).
    */
  case class BitSetOrAgg(
      child: Expression,
      mBits: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    private val numWords = (mBits + 63) / 64

    override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) {
            val pos = arr.getLong(i)
            if (pos >= 0 && pos < mBits)
              buf((pos >>> 6).toInt) |= (1L << (pos & 63))
          }
          i += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < numWords) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(o: Int): BitSetOrAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BitSetOrAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): BitSetOrAgg = copy(child = c)
  }

  /** Element-wise OR of `ARRAY<BIGINT>` filter words — merges independently
    * built filters for the same shard (e.g. yesterday's filter plus
    * today's batch). Word counts must match (same mBits).
    */
  case class OrWordsAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) return buf
      val arr = v.asInstanceOf[ArrayData]
      val words = arr.toLongArray()
      merge(buf, words)
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      if (buf.isEmpty) return other.clone()
      if (other.isEmpty) return buf
      require(buf.length == other.length,
        s"filter word counts differ: ${buf.length} vs ${other.length} (mixed mBits?)")
      var i = 0
      while (i < buf.length) { buf(i) |= other(i); i += 1 }
      buf
    }

    override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

    override def serialize(buf: Array[Long]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      buf.foreach(bb.putLong)
      bb.array()
    }
    override def deserialize(bytes: Array[Byte]): Array[Long] = {
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.fill(bytes.length / 8)(bb.getLong)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false

    override def withNewMutableAggBufferOffset(o: Int): OrWordsAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): OrWordsAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): OrWordsAgg = copy(child = c)
  }

  // ------------------------------------------------------ Column wrappers

  /** Aggregate: Bloom filter words from a column of position arrays. */
  def bitset_or_agg(positions: Column, mBits: Int): Column =
    column(BitSetOrAgg(expression(positions), mBits).toAggregateExpression())

  /** Aggregate: element-wise OR of already-built filter word arrays. */
  def or_words_agg(words: Column): Column =
    column(OrWordsAgg(expression(words)).toAggregateExpression())
}
