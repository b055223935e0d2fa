package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge.{toColumn => column, toExpression => expression}
import org.apache.spark.sql.types._

/** Count–min sketch primitives with ENGINE-RECOMPUTABLE counter
  * positions — the frequency-estimation sibling of [[BloomFilter]]: a
  * `depth × width` counter grid where each key increments one counter
  * per row (position = the same Kirsch–Mitzenmacher double-hashing
  * arithmetic as the Bloom filter, row index = j), and
  * `estimate(key) = min_j grid[j][pos_j]` — an upper bound on the true
  * count that is exact when the key never collides in some row.
  *
  * Because the positions are exact BIGINT arithmetic over the portable
  * token hash, another engine reproduces the GRID, not just the
  * semantics: estimates — overestimates from collisions included — gate
  * bit-for-bit. Counter updates are integer sums, so partials merge in
  * any order (map-side combine) and two sketches over disjoint corpora
  * merge by element-wise addition ([[sum_words_agg]]) into exactly the
  * sketch of the union.
  */
object CountMin {

  /** The depth positions for a key hash `fp` (reuses the Bloom double
    * hashing; row j's counter column). Unrolled per row — codegen.
    */
  def position(fp: Column, seed: Long, j: Int, width: Int): Column =
    BloomFilter.position(fp, seed, j, width)

  /** `min_j grid[j·width + pos_j]` over the flattened grid. The grid is
    * a driver-held array shipped into codegen via `addReferenceObj`
    * ([[TextExpressions.LongArrayGet]]) — NOT a `typedlit` literal: at
    * the 2^21-counter cap a literal grid is 16 MB of plan tree,
    * re-serialized into every task.
    */
  def estimate(grid: Array[Long], fp: Column, seed: Long, depth: Int,
               width: Int): Column = {
    require(grid.length == depth * width,
      s"grid has ${grid.length} counters, expected $depth x $width")
    val rows = (0 until depth).map { j =>
      TextExpressions.long_array_get(
        position(fp, seed, j, width) + lit(j.toLong * width), grid)
    }
    if (rows.length == 1) rows.head else least(rows: _*)
  }

  /** Single-pass sketch aggregate: input is the key's `ARRAY<BIGINT>` of
    * depth positions (pre-offset by row — see [[gridPositions]]); the
    * buffer is the flattened depth×width grid (≤ 2^21 counters by the
    * operator contract — 16 MB of longs).
    */
  case class CountMinAgg(
      child: Expression,
      depth: Int,
      width: Int,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    private val size = depth * width

    override def createAggregationBuffer(): Array[Long] = new Array[Long](size)

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[ArrayData]
        var j = 0
        val n = arr.numElements()
        while (j < n && j < depth) {
          if (!arr.isNullAt(j)) {
            val pos = arr.getLong(j)
            if (pos >= 0 && pos < width) buf(j * width + pos.toInt) += 1L
          }
          j += 1
        }
      }
      buf
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      var i = 0
      while (i < size) { buf(i) += other(i); i += 1 }
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

    override def withNewMutableAggBufferOffset(o: Int): CountMinAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): CountMinAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): CountMinAgg = copy(child = c)
  }

  /** Element-wise SUM of flattened grids — merges sketches built over
    * disjoint corpora into the union's sketch. Grid sizes must match.
    */
  case class SumWordsAgg(
      child: Expression,
      mutableAggBufferOffset: Int = 0,
      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

    override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

    override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
      val v = child.eval(input)
      if (v == null) return buf
      merge(buf, v.asInstanceOf[ArrayData].toLongArray())
    }

    override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
      if (buf.isEmpty) return other.clone()
      if (other.isEmpty) return buf
      require(buf.length == other.length,
        s"grid sizes differ: ${buf.length} vs ${other.length} (mixed depth×width?)")
      var i = 0
      while (i < buf.length) { buf(i) += other(i); i += 1 }
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

    override def withNewMutableAggBufferOffset(o: Int): SumWordsAgg = copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): SumWordsAgg = copy(inputAggBufferOffset = o)
    override protected def withNewChildInternal(c: Expression): SumWordsAgg = copy(child = c)
  }

  // ------------------------------------------------------ Column wrappers

  /** The per-key positions array (one per sketch row, un-offset). */
  def positions(fp: Column, seed: Long, depth: Int, width: Int): Column =
    array((0 until depth).map(j => position(fp, seed, j, width)): _*)

  /** Aggregate: flattened depth×width sketch from a positions column. */
  def countmin_agg(positions: Column, depth: Int, width: Int): Column =
    column(CountMinAgg(expression(positions), depth, width).toAggregateExpression())

  /** Aggregate: element-wise sum of flattened grids. */
  def sum_words_agg(grid: Column): Column =
    column(SumWordsAgg(expression(grid)).toAggregateExpression())
}
