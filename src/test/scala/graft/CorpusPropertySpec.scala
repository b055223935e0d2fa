package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextAnalysis

/** Property-based invariants for the corpus batching operators — random
  * document sets (varied lengths, repeated tokens, single-token and
  * near-empty docs) must uphold the structural contracts the fixed-fixture
  * tests assert pointwise.
  */
class CorpusPropertySpec extends SparkSpecBase {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(1234L + i)))
    }

  /** Random corpus: 1-12 docs of 1-40 single-char tokens from a small
    * alphabet (forces shared n-grams and repeated tokens).
    */
  private val genCorpus: Gen[Seq[(Long, String)]] = for {
    n <- Gen.chooseNum(1, 12)
    docs <- Gen.sequence[Seq[String], String]((0 until n).map { _ =>
      for {
        len <- Gen.chooseNum(1, 40)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield toks.mkString(" ")
    })
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("chunk: full coverage, no empty chunks, contiguous chunk_idx (random corpora)") {
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(2, 8), Gen.chooseNum(1, 8)), 8) {
      case (corpus, c, sRaw) =>
        val s = math.min(sRaw, c) // stride <= chunkTokens (operator contract)
        val docs = corpus.toDF("doc_id", "text")
        val chunks = TextAnalysis.chunk(docs, "doc_id", c, s).collect()
        // no empty or oversized chunk
        assert(chunks.forall { r =>
          val n = r.getAs[Long]("chunk_tokens"); n >= 1 && n <= c
        })
        // contiguous chunk_idx from 0 per doc
        chunks.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
          val idxs = rs.map(_.getAs[Int]("chunk_idx")).sorted
          assert(idxs.head == 0 && idxs.zipWithIndex.forall { case (v, i) => v == i })
        }
        // disjoint-cover token preservation when stride == chunkTokens
        val disjoint = TextAnalysis.chunk(docs, "doc_id", c, c)
          .agg(sum("chunk_tokens")).as[Long].head()
        val totalTokens = corpus.map(_._2.split(" ").length.toLong).sum
        assert(disjoint == totalTokens)
    }
  }

  test("packSequences: exactly-once docs, replay stability, cut discipline (random corpora)") {
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(4, 64), Gen.chooseNum(1, 4)), 8) {
      case (corpus, budget, bins) =>
        val docs = corpus.toDF("doc_id", "text")
        val packed = TextAnalysis.packSequences(docs, "doc_id", budget, bins).collect()
        // every doc exactly once, token counts faithful
        assert(packed.length == corpus.length)
        assert(packed.map(_.getAs[Long]("doc_id")).toSet == corpus.map(_._1).toSet)
        val tokenByDoc = corpus.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
        assert(packed.forall(r => r.getAs[Long]("n_tokens") == tokenByDoc(r.getAs[Long]("doc_id"))))
        // pack_id = floor(cum_before / budget): replay the fold per bin and
        // check every assignment (total-order replay of the window spec)
        packed.groupBy(_.getAs[Long]("bin")).foreach { case (_, rows) =>
          // operator orders by (fp, id); fp is not in the output, but the
          // assignment must still be consistent with SOME order where
          // cum_before of the first doc of pack p lies in [p*b, (p+1)*b):
          // check pack token-prefix sums against pack ids
          val byPack = rows.groupBy(_.getAs[Long]("pack_id")).toSeq.sortBy(_._1)
          var cum = 0L
          byPack.foreach { case (pid, rs) =>
            assert(cum / budget == pid,
              s"pack $pid starts at cumulative offset $cum (budget $budget)")
            cum += rs.map(_.getAs[Long]("n_tokens")).sum
          }
        }
    }
  }

  test("dropSharedSpans: output token mass never exceeds input; single-doc corpus untouched") {
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(2, 5)), 6) { case (corpus, k) =>
      val docs = corpus.toDF("doc_id", "text")
      val out = TextAnalysis.dropSharedSpans(docs, "doc_id", k).collect()
      assert(out.length == corpus.length) // every doc represented
      val tokenByDoc = corpus.map { case (id, t) => id -> t.split(" ").length.toLong }.toMap
      assert(out.forall(r =>
        r.getAs[Long]("n_tokens_kept") <= tokenByDoc(r.getAs[Long]("doc_id"))))
    }
    // a single doc shares nothing with "other docs" — fully preserved
    val solo = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val kept = TextAnalysis.dropSharedSpans(solo, "doc_id", k = 3)
      .select("kept_text").as[String].head()
    assert(kept == "a b c d e")
  }
}
