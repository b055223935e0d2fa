package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrderLayout

/** Z-order layout: Morton-code arithmetic, two-dimensional file locality
  * and the file-skipping selectivity it buys.
  */
class ZOrderLayoutSpec extends SparkSpecBase {
  import spark.implicits._

  private def refSpread(x0: Long): Long = {
    var x = x0 & 0x7FFFFFFFL
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  test("zValue matches the reference Morton interleave bit-for-bit") {
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (123456L, 987654L),
      (0x7FFFFFFFL, 0x7FFFFFFFL), (0x55555555L, 0x2AAAAAAAL),
      // 31-bit masking: wider inputs fold, never overflow
      (0xFFFFFFFFL, 1L), (Long.MaxValue, Long.MaxValue))
    val out = cases.toDF("a", "b")
      .select(ZOrderLayout.zValue(col("a"), col("b")).as("z"))
      .as[Long].collect()
    out.zip(cases).foreach { case (z, (a, b)) =>
      assert(z == (refSpread(a) | (refSpread(b) << 1)), s"($a, $b)")
      assert(z >= 0, "62-bit code must stay positive")
    }
    // monotonic in each dimension when the other is fixed (order locality)
    val mono = (0L until 64L).toDF("a")
      .select(ZOrderLayout.zValue(col("a"), lit(7L)).as("z")).as[Long].collect()
    assert(mono.sameElements(mono.sorted))
  }

  test("zValue3 matches the reference 3-way interleave and clusters all three dimensions") {
    def refSpread3(x0: Long): Long = {
      var x = x0 & 0x1FFFFFL
      x = (x | (x << 32)) & 0x001F00000000FFFFL
      x = (x | (x << 16)) & 0x001F0000FF0000FFL
      x = (x | (x << 8)) & 0x100F00F00F00F00FL
      x = (x | (x << 4)) & 0x10C30C30C30C30C3L
      x = (x | (x << 2)) & 0x1249249249249249L
      x
    }
    val cases = Seq((0L, 0L, 0L), (1L, 2L, 4L), (0x1FFFFFL, 0x1FFFFFL, 0x1FFFFFL),
      (12345L, 67890L, 54321L), (Long.MaxValue, 7L, 0xFFFFFFFFL))
    val out = cases.toDF("a", "b", "c")
      .select(ZOrderLayout.zValue3(col("a"), col("b"), col("c")).as("z"))
      .as[Long].collect()
    out.zip(cases).foreach { case (z, (a, b, c)) =>
      val expect = refSpread3(a) | (refSpread3(b) << 1) | (refSpread3(c) << 2)
      assert(z == expect && z >= 0, s"($a,$b,$c)")
    }
    // interleaving round-trips: de-interleave the bits and recover each key
    val (a, b, c) = (0x155555L, 0x0ABCDL, 0x1F0F0L)
    val z = refSpread3(a) | (refSpread3(b) << 1) | (refSpread3(c) << 2)
    def unspread(v: Long, off: Int): Long =
      (0 until 21).map(i => (((v >> (3 * i + off)) & 1L) << i)).reduce(_ | _)
    assert(unspread(z, 0) == a && unspread(z, 1) == b && unspread(z, 2) == c)
  }

  test("z-ordered layout clusters BOTH dimensions; single-sort clusters one") {
    val n = 20000
    val rows = (0 until n).map { i =>
      (i.toLong, (i.toLong * 48271) % 1000L, (i.toLong * 69621) % 1000L)
    }.toDF("id", "a", "b")
    val dir = graft.sources.BucketedTables.scratchDir("graft_z_")
    val zPath = s"$dir/zorder"; val sPath = s"$dir/bsort"
    ZOrderLayout.writeZOrdered(rows, zPath, col("a"), col("b"), numFiles = 16)
    // baseline: the conventional single-column layout (sorted on b only)
    rows.repartitionByRange(16, col("b")).sortWithinPartitions(col("b"))
      .write.parquet(sPath)

    def avgSpan(path: String, c: String): Double = {
      val spans = ZOrderLayout.fileSpans(spark, path, Seq("a", "b"))
        .select((col(s"max_$c") - col(s"min_$c")).cast("double")).as[Double].collect()
      spans.sum / spans.length
    }
    // both z spans must be FAR tighter than the unclustered dimension of
    // the single-sort layout (which covers ~the full 0..999 domain)
    val (za, zb) = (avgSpan(zPath, "a"), avgSpan(zPath, "b"))
    val sortedA = avgSpan(sPath, "a") // the dimension b-sort does NOT cluster
    assert(sortedA > 900, s"baseline un-clustered span should be ~full domain, got $sortedA")
    assert(za < 0.55 * sortedA, s"z span on a: $za vs baseline $sortedA")
    assert(zb < 0.55 * sortedA, s"z span on b: $zb vs baseline $sortedA")

    // file-skipping selectivity: a point predicate on EITHER column can
    // touch only a fraction of the 16 files
    val spans = ZOrderLayout.fileSpans(spark, zPath, Seq("a", "b"))
    assert(spans.count() == 16)
    // a point predicate on either column touches a strict fraction of the
    // 16 files (500 sits on a z-quadrant boundary — the worst case for
    // straddling files — and interior points do better)
    Seq("a", "b").foreach { c =>
      assert(ZOrderLayout.candidateFiles(spans, c, 500L) <= 10, s"boundary point, $c")
      assert(ZOrderLayout.candidateFiles(spans, c, 100L) <= 8, s"interior point, $c")
    }
    // and the data is intact
    assert(spark.read.parquet(zPath).count() == n)
    assert(spark.read.parquet(zPath).agg(sum("id")).as[Long].head() ==
      (0 until n).map(_.toLong).sum)
  }
}
