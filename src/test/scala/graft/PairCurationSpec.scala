package graft

import org.apache.spark.sql.functions._

import graft.multimodal.{JdkMedia, PairCuration}

/** Cross-modal pair curation: stage order, ledger counts, keep-best and
  * dedup tie-breaks, decode gating — on a hand-computable fixture.
  */
class PairCurationSpec extends SparkSpecBase {
  import spark.implicits._

  // 9 pairs over 3 image classes (solid luma 0 / 60 / 120, spacing > the
  // 4.0 mean tolerance), with one corrupt image, one short caption, one
  // blocked caption, and a caption collision across image classes
  private def fixture = Seq(
    // class 0 (luma 0): 3 members — keep-best must pick the LONGEST
    // caption (id 2, 6 tokens), not the min id
    (0L, JdkMedia.solidPng(8, 8, 0, 0, 0), "alpha beta gamma delta"),
    (1L, JdkMedia.solidPng(8, 8, 0, 0, 0), "alpha beta gamma delta x"),
    (2L, JdkMedia.solidPng(8, 8, 0, 0, 0), "alpha beta gamma delta x y"),
    // class 1 (luma 60): two members with EQUAL length — tie breaks min id
    (3L, JdkMedia.solidPng(8, 8, 60, 60, 60), "epsilon zeta eta theta"),
    (4L, JdkMedia.solidPng(8, 8, 60, 60, 60), "iota kappa lambda mu"),
    // class 2 (luma 120): survivor whose caption COLLIDES with class 0's
    // winner — exact caption dedup keeps the min id
    (5L, JdkMedia.solidPng(8, 8, 120, 120, 120), "alpha beta gamma delta x y"),
    // corrupt image: dropped at decode however good the caption
    (6L, "definitely not a png".getBytes("UTF-8"), "nu xi omicron pi rho"),
    // short caption (3 < min 4): dropped at quality
    (7L, JdkMedia.solidPng(8, 8, 180, 180, 180), "too few tokens"),
    // blocked phrase: dropped at quality
    (8L, JdkMedia.solidPng(8, 8, 240, 240, 240),
      "sigma tau click here now upsilon"))
    .toDF("pair_id", "image", "caption")

  test("curatePairsAudited: ledger counts every stage; keep-best ranks caption length, dedup and ties break min id") {
    val (out, ledger) = PairCuration.curatePairsAudited(fixture, "pair_id",
      cfg = PairCuration.Config(minCaptionTokens = 4,
        blockPhrases = Seq("click here now")))
    val led = ledger.toMap
    assert(led("input") == 9)
    assert(led("image_decode") == 8, s"corrupt image must drop: $ledger")
    assert(led("caption_quality") == 6, s"short + blocked drop: $ledger")
    // classes {0,60,120} → 3 keep-best survivors: 2 (longest), 3 (tie →
    // min id), 5 (singleton)
    assert(led("image_neardup_keep_best") == 3, ledger.toString)
    // pair 5's caption equals pair 2's → dedup keeps min id 2
    assert(led("final") == 2, ledger.toString)
    val rows = out.orderBy("pair_id")
      .select("pair_id", "caption").as[(Long, String)].collect().toSeq
    assert(rows == Seq(
      (2L, "alpha beta gamma delta x y"),
      (3L, "epsilon zeta eta theta")), rows.toString)
    // survivors carry the pHash for downstream banding without re-decode
    assert(out.columns.toSeq == Seq("pair_id", "caption", "phash"))
  }

  test("caption keep-one stage is a partial-aggregated min_by keyed by hash pair, not a window over the caption") {
    // the exact shape curatePairsAudited's `final` stage runs (the stage
    // itself is checkpoint-hidden, so witness the building block on the
    // same (id, caption, ahash) slice): hot captions ("stock photo"-class
    // Zipf heads) must reduce map-side, and raw caption bytes must not be
    // the shuffle key
    val slice = Seq((1L, "stock photo", 11L), (2L, "stock photo", 12L),
      (3L, "a real caption", 13L)).toDF("pair_id", "caption", "ahash")
    val deduped = graft.operators.Dedup.dropExactDups(slice, "pair_id", "caption")
    assert(deduped.select("pair_id").as[Long].collect().toSet == Set(1L, 3L))
    val physical = deduped.queryExecution.executedPlan.toString
    assert(!physical.contains("WindowExec") && !physical.contains("row_number"),
      physical)
    assert(physical.contains("partial_min_by"), physical)
    // the exchange keys are the hoisted 64-bit hash fields (Catalyst
    // projects them as _groupingexpression longs), never the caption bytes
    val exchange = physical.linesIterator
      .filter(_.contains("hashpartitioning")).mkString("\n")
    assert(exchange.nonEmpty && !exchange.contains("caption#"), physical)
  }

  test("pair release: blobs round-trip byte-exact through pack pointers; tampering fails loudly on open") {
    import org.apache.spark.sql.functions.crc32
    val big = Array.tabulate[Byte](512)(i => (i % 251).toByte) // > inlineMax
    val pairs = Seq(
      (1L, JdkMedia.solidPng(8, 8, 10, 10, 10), "alpha beta gamma delta"),
      (2L, big, "epsilon zeta eta theta"),
      (3L, JdkMedia.solidPng(4, 4, 99, 99, 99), "iota kappa lambda mu"))
      .toDF("pair_id", "image", "caption")
    val root = graft.sources.BucketedTables.scratchDir("pair_rel_").toString
    val gen = PairCuration.writePairRelease(pairs, root, inlineMax = 256)
    val back = PairCuration.readPairRelease(spark, root)
    assert(back.count() == 3)
    // byte-exact: crc32 of every image matches the source, inline and
    // packed alike
    val diff = back.select($"pair_id", crc32($"image").as("c"))
      .join(pairs.select($"pair_id", crc32($"image").as("c2")), Seq("pair_id"))
      .where($"c" =!= $"c2").count()
    assert(diff == 0)
    assert(back.where($"pair_id" === 2L).select("caption").as[String].head()
      == "epsilon zeta eta theta")
    // the big blob really went through a pack file
    val packs = new java.io.File(s"$root/$gen/packs").listFiles()
    assert(packs != null && packs.nonEmpty, "expected at least one pack file")
    // tamper: flip the pack's bytes (same length) — and drop the local
    // FS checksum sidecars so the corruption reaches OUR verification
    // layer instead of Hadoop's (HDFS/S3 have no sidecar files)
    new java.io.File(s"$root/$gen/packs").listFiles()
      .filter(_.getName.endsWith(".crc"))
      .foreach(_.delete())
    val pack = packs.filter(_.getName.endsWith(".bin")).head.toPath
    val bytes = java.nio.file.Files.readAllBytes(pack)
    java.nio.file.Files.write(pack,
      bytes.map(b => (b ^ 0x5A).toByte))
    val e = intercept[IllegalStateException] {
      PairCuration.readPairRelease(spark, root).collect()
    }
    assert(e.getMessage.contains("fails verification"), e.getMessage)
    // a missing manifest is equally loud
    intercept[IllegalStateException] {
      PairCuration.readPairRelease(spark,
        graft.sources.BucketedTables.scratchDir("pair_rel_none_").toString)
    }
  }

  test("pairs in no near-dup group pass through; empty blocklist disables the phrase gate") {
    val solo = Seq(
      (10L, JdkMedia.solidPng(4, 4, 30, 30, 30), "one two three four"),
      (11L, JdkMedia.solidPng(4, 4, 90, 90, 90),
        "five six click here now seven"))
      .toDF("pair_id", "image", "caption")
    val (out, ledger) = PairCuration.curatePairsAudited(solo, "pair_id",
      cfg = PairCuration.Config(minCaptionTokens = 2))
    assert(ledger.toMap.apply("final") == 2, ledger.toString)
    assert(out.select("pair_id").as[Long].collect().toSet == Set(10L, 11L))
    intercept[IllegalArgumentException] {
      PairCuration.curatePairsAudited(solo, "pair_id",
        cfg = PairCuration.Config(minCaptionTokens = 5, maxCaptionTokens = 4))
    }
  }
}
