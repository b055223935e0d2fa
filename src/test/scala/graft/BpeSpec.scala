package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe
import graft.operators.Bpe.Merge
import graft.sources.Tables

/** Real BPE: training against a hand-computed reference, the shared
  * replace semantics, distributed encode parity.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("trainBpe reproduces the hand-computed merge sequence and stops when exhausted") {
    // classic fixture: low ×2, lower ×1 (no end-of-word marker)
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, "text", numMerges = 10)
    // (l,o) ties (o,w) at 3 → lexicographic smallest wins; then (lo,w);
    // then (e,r) beats (low,e) on the tiebreak; then (low,er); exhausted
    assert(merges == Seq(Merge(0, "l", "o"), Merge(1, "lo", "w"),
      Merge(2, "e", "r"), Merge(3, "low", "er")))
    // requesting fewer stops at the requested rank
    assert(Bpe.trainBpe(docs, "text", numMerges = 2) == merges.take(2))
  }

  test("encodeWord applies rules in rank order and round-trips the characters") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, "text", numMerges = 10)
    assert(Bpe.encodeWord("low", merges) == Seq("low"))
    assert(Bpe.encodeWord("lower", merges) == Seq("lower"))
    // unseen word: known prefixes merge, the rest stays character-level
    assert(Bpe.encodeWord("lowest", merges) == Seq("low", "e", "s", "t"))
    // round trip: concatenated tokens are exactly the word
    Seq("low", "lower", "lowest", "wool", "q").foreach { w =>
      assert(Bpe.encodeWord(w, merges).mkString == w, w)
    }
  }

  test("overlapping pair chains merge left-to-right non-overlapping (the shared replace semantics)") {
    val m = Seq(Merge(0, "a", "a"))
    assert(Bpe.encodeWord("aaa", m) == Seq("aa", "a"))
    assert(Bpe.encodeWord("aaaa", m) == Seq("aa", "a", "a"),
      "the consumed separator blocks chaining, same as Java/SQL replace")
    // a second rank can pick up what the first left behind
    val m2 = m :+ Merge(1, "aa", "a")
    assert(Bpe.encodeWord("aaa", m2) == Seq("aaa"))
  }

  test("applyBpe is map-parallel, partitioning-invariant, and matches encodeWord") {
    val docs = Seq(
      (1L, "low lower"), (2L, "slow glow"), (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs.where(col("doc_id") < 3), "text", 10)
    val out = Bpe.applyBpe(docs, "doc_id", merges).orderBy("id")
      .as[(Long, Long, String)].collect()
    val expect = Map(
      1L -> Seq("low", "lower").flatMap(Bpe.encodeWord(_, merges)),
      2L -> Seq("slow", "glow").flatMap(Bpe.encodeWord(_, merges)),
      3L -> Seq.empty[String])
    out.foreach { case (id, n, toks) =>
      assert(toks == expect(id).mkString(" "), s"doc $id")
      assert(n == expect(id).length, s"doc $id count")
    }
    val repartitioned = Bpe.applyBpe(docs.repartition(5), "doc_id", merges)
      .orderBy("id").as[(Long, Long, String)].collect()
    assert(repartitioned.toSeq == out.toSeq)
    // the word memo is a pure cache: size 0 (every entry evicted, all
    // misses) and size 1 (thrashing) produce identical output
    Seq(0, 1).foreach { cap =>
      val un = Bpe.applyBpe(docs, "doc_id", merges, wordCacheSize = cap)
        .orderBy("id").as[(Long, Long, String)].collect()
      assert(un.toSeq == out.toSeq, s"cache size $cap")
    }
    // plan witness: the encode is a codegen scalar inside the stage —
    // no typed mapPartitions (DeserializeToObject/SerializeFromObject
    // round-trip on the one every-document tokenizer stage), no regex
    // in the token count
    val plan = Bpe.applyBpe(docs.repartition(2), "doc_id", merges)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_bpe_encode"), plan)
    assert(!plan.contains("DeserializeToObject") && !plan.contains("MapPartitions"),
      plan)
    assert(!plan.contains("regexp"), plan)
  }

  test("vocabulary cap keeps the most frequent words (deterministic tiebreak)") {
    val docs = Seq((1L, "zz zz zz yy yy xx")).toDF("doc_id", "text")
    // cap 1: only 'zz' trains → the single merge is (z,z)
    assert(Bpe.trainBpe(docs, "text", 10, maxVocab = 1) == Seq(Merge(0, "z", "z")))
  }

  test("corpus integration: token count sits between word count and char count and compresses") {
    val docs = Tables.documents(spark, sfDir)
    val merges = Bpe.trainBpe(docs, "text", numMerges = 40)
    assert(merges.length == 40)
    val enc = Bpe.applyBpe(docs, "doc_id", merges)
    val (nTokens, nDocs) = enc.agg(sum("n_tokens"), count(lit(1)))
      .as[(Long, Long)].head()
    val (nWords, nChars) = docs.select(
        sum(size(split(col("text"), "\\s+"))).cast("long"),
        sum(length(regexp_replace(col("text"), "\\s+", ""))).cast("long"))
      .as[(Long, Long)].head()
    assert(nDocs == 500)
    assert(nTokens >= nWords, "BPE can at best reach one token per word")
    assert(nTokens < (nChars * 65) / 100, s"40 merges should compress well " +
      s"below character level ($nTokens vs $nChars chars)")
    // more merges strictly help on this corpus (monotone improvement)
    val fewer = Bpe.applyBpe(docs, "doc_id", merges.take(10))
      .agg(sum("n_tokens")).as[Long].head()
    assert(nTokens < fewer, s"40 merges ($nTokens) must beat 10 ($fewer)")
  }

  test("astral characters are single symbols, never surrogate halves") {
    // 😀 is one codepoint (two UTF-16 units): the first merge must pair
    // the WHOLE emoji with 'x' — a UTF-16 split would emit lone
    // surrogates as symbols, which no codepoint-based replay can match
    val docs = Seq((1L, "😀x 😀x")).toDF("doc_id", "text")
    val merges = Bpe.trainBpe(docs, "text", numMerges = 4)
    assert(merges == Seq(Merge(0, "😀", "x")), merges.toString)
    assert(Bpe.encodeWord("😀x", merges) == Seq("😀x"))
    assert(Bpe.trainBpeDistributed(docs, "text", numMerges = 4) == merges)
  }

  test("merge tie-break is codepoint order — identical in the driver loop, the DataFrame loop and binary collation") {
    // (😀, a) and (, a) tie at count 1; codepoint order puts
    // U+E000 (57344) below U+1F600 (128512), but Java's UTF-16 compareTo
    // would order the surrogate pair (0xD83D...) FIRST — the collations
    // disagree exactly here, so this pins all flavors to one winner
    val docs = Seq((1L, "😀a a")).toDF("doc_id", "text")
    val m1 = Bpe.trainBpe(docs, "text", numMerges = 1)
    assert(m1 == Seq(Merge(0, "", "a")), m1.toString)
    assert(Bpe.trainBpeDistributed(docs, "text", numMerges = 1) == m1)
  }

  test("trainBpeDistributed: identical rules to the driver loop, exhaustion, partitioning invariance") {
    val docs = Seq((1L, "low low lower")).toDF("doc_id", "text")
    val dist = Bpe.trainBpeDistributed(docs, "text", numMerges = 10)
    assert(dist == Bpe.trainBpe(docs, "text", numMerges = 10))
    assert(dist.length == 4, dist.toString) // exhausted after 4 merges
    assert(Bpe.trainBpeDistributed(docs, "text", numMerges = 2) ==
      dist.take(2))
    // a bigger corpus, adversarially repartitioned: the pair-count
    // aggregate and the (cnt desc, lhs, rhs) winner rule are
    // order-insensitive, so the rule sequence cannot move
    val corpus = graft.sources.Tables.load(spark, sfDir, "documents")
      .where(col("doc_id") < 120).select("doc_id", "text")
    val a = Bpe.trainBpeDistributed(corpus, "text", numMerges = 12)
    val b = Bpe.trainBpeDistributed(corpus.repartition(17), "text",
      numMerges = 12)
    assert(a == b)
    assert(a == Bpe.trainBpe(corpus, "text", numMerges = 12),
      "uncapped DataFrame loop must equal the driver loop when the vocab fits")
    intercept[IllegalArgumentException] {
      Bpe.trainBpeDistributed(docs, "text", numMerges = 0)
    }
  }
}
