package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Z-order (Morton-curve) data layout — multi-dimensional file pruning for
  * the serving layer. Parquet skips files/row-groups by per-column min/max
  * stats, but a single-column sort gives selectivity on ONE column only: a
  * table sorted by `day` answers `day = d` with a handful of files yet
  * scans everything for `app_id = x`. Interleaving the bits of both keys
  * (the classic Morton code) and range-partitioning + sorting on THAT
  * value clusters rows so every file covers a small rectangle of the
  * (a, b) space — predicates on EITHER column prune to ~√F of F files
  * instead of all of them. This is the layout step a 100 TB store runs at
  * write/compaction time; reads need no new machinery (the existing
  * min/max skipping does the pruning).
  *
  * Everything is built from codegen'd built-in expressions (shifts, masks)
  * — no UDF, no custom Expression needed — and the bit arithmetic is
  * engine-portable: the oracle replays it exactly (`q_zorder`).
  *
  * Scale shape: one `repartitionByRange` exchange on the z-value (range
  * bounds from Spark's reservoir sampling), in-partition sort, write.
  * Same cost as any global sort — run it where you'd run compaction.
  */
object ZOrderLayout {

  // spread steps: after each mask no set bit sits above bit 62, so every
  // shift below stays inside a signed 64-bit value (DuckDB's BIGINT
  // overflow-checks `<<`, so the oracle needs this property too)
  private val SpreadSteps = Seq(
    (16, 0x0000FFFF0000FFFFL), (8, 0x00FF00FF00FF00FFL),
    (4, 0x0F0F0F0F0F0F0F0FL), (2, 0x3333333333333333L),
    (1, 0x5555555555555555L))

  /** Spread the low 31 bits of `c` so bit i lands at position 2i (the
    * even-bit half of a Morton code). Inputs are masked to 31 bits —
    * callers with wider domains should bucket first (layout cares about
    * ORDER locality, not exact values, so e.g. `xxhash64(id) & 0x7FFFFFFF`
    * or a time bucket are the right feeds).
    */
  def spreadBits(c: Column): Column =
    SpreadSteps.foldLeft(c.cast(LongType).bitwiseAND(lit(0x7FFFFFFFL))) {
      case (x, (sh, m)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** The 62-bit Morton code of two 31-bit keys: bits of `a` on even
    * positions, bits of `b` on odd. Pure codegen'd column arithmetic.
    */
  def zValue(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  // 3-way spread: bit i of a 21-bit key lands at position 3i. Same
  // signed-64 discipline: every mask keeps set bits low enough that the
  // next shift (and the final << 2) stays below bit 63.
  private val Spread3Steps = Seq(
    (32, 0x001F00000000FFFFL), (16, 0x001F0000FF0000FFL),
    (8, 0x100F00F00F00F00FL), (4, 0x10C30C30C30C30C3L),
    (2, 0x1249249249249249L))

  /** Spread the low 21 bits of `c` so bit i lands at position 3i. */
  def spreadBits3(c: Column): Column =
    Spread3Steps.foldLeft(c.cast(LongType).bitwiseAND(lit(0x1FFFFFL))) {
      case (x, (sh, m)) => x.bitwiseOR(shiftleft(x, sh)).bitwiseAND(lit(m))
    }

  /** The 63-bit Morton code of THREE 21-bit keys — the (day, app, hour)-
    * shaped layout: predicates on any one of three columns prune to
    * ~F^(2/3) of F files. 21 bits per key; bucket wider domains first
    * (same guidance as [[spreadBits]]).
    */
  def zValue3(a: Column, b: Column, c: Column): Column =
    spreadBits3(a)
      .bitwiseOR(shiftleft(spreadBits3(b), 1))
      .bitwiseOR(shiftleft(spreadBits3(c), 2))

  /** Write `df` z-ordered on `(a, b)` into `numFiles` files: range-
    * partition on the Morton code (bounds via Spark's sampling), sort
    * within partitions, drop the helper column, write. Files then hold
    * near-rectangular (a, b) blocks — min/max stats on BOTH columns are
    * tight, which is the whole point.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
                    numFiles: Int): Unit = {
    require(numFiles > 0, s"numFiles must be positive (got $numFiles)")
    require(!df.columns.contains("_z"),
      "input already has a _z column — rename it; the layout writer uses _z " +
        "as its helper and would silently drop yours")
    df.withColumn("_z", zValue(a, b))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.parquet(path)
  }

  /** Per-file [min, max] spans of `cols` for a written table — the
    * observable a layout is judged by (parquet's file skipping consults
    * exactly these stats). One scan, grouped on `input_file_name()`.
    */
  def fileSpans(spark: SparkSession, path: String, cols: Seq[String]): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)

  /** How many files a point predicate `colName = value` could touch, by
    * the min/max spans alone — the file-skipping selectivity a reader
    * gets for free from this layout.
    */
  def candidateFiles(spans: DataFrame, colName: String, value: Long): Long =
    spans.where(col(s"min_$colName") <= value && col(s"max_$colName") >= value)
      .count()
}
