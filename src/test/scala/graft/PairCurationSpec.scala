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
