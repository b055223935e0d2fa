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

  test("lmFamiliarity: bounds, self-model saturation, every doc represented (random corpora)") {
    forSamples(genCorpus, 6) { corpus =>
      val docs = corpus.toDF("doc_id", "text")
      val lm = TextAnalysis.bigramCounts(docs)
      val out = TextAnalysis.lmFamiliarity(docs, lm, "doc_id").collect()
      // every doc exactly once
      assert(out.map(_.getAs[Long]("doc_id")).toSet == corpus.map(_._1).toSet)
      out.foreach { r =>
        val n = r.getAs[Long]("n_bigrams"); val h = r.getAs[Long]("hit_bigrams")
        val f = r.getAs[Double]("familiarity")
        assert(h >= 0 && h <= n && f >= 0.0 && f <= 1.0)
        // model trained on the SAME corpus: every bigram of every doc is
        // in the model, so familiarity saturates at 1 (0 for bigram-less)
        assert(if (n == 0) f == 0.0 && h == 0 else f == 1.0 && h == n)
        assert(r.getAs[Long]("hit_mass") >= h) // each hit counts >= 1
      }
    }
  }

  test("qualityGate: per-group floor count, kept set invariant under reordering (random corpora)") {
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(1, 3)), 6) { case (corpus, num) =>
      val den = 3
      val docs = corpus.toDF("doc_id", "text")
        .withColumn("source", (col("doc_id") % 2).cast("string"))
      val kept = TextAnalysis.qualityGate(docs, "source", "doc_id", num, den)
      // exactly floor(n_group * num / den) docs survive per group
      val groupSizes = corpus.groupBy(_._1 % 2).view.mapValues(_.size.toLong).toMap
      val keptSizes = kept.groupBy("source").count()
        .collect().map(r => r.getString(0).toLong -> r.getAs[Long]("count")).toMap
      groupSizes.foreach { case (g, n) =>
        assert(keptSizes.getOrElse(g, 0L) == n * num / den,
          s"group $g: expected ${n * num / den} of $n kept")
      }
      // membership is a pure function of content — row order must not matter
      val again = TextAnalysis.qualityGate(
        docs.orderBy(rand(7)), "source", "doc_id", num, den)
      assert(kept.select("doc_id").exceptAll(again.select("doc_id")).isEmpty &&
        again.select("doc_id").exceptAll(kept.select("doc_id")).isEmpty)
    }
  }

  test("corpusShuffle: dense permutation equal to the global (selector, id) sort for random corpora/seeds/buckets") {
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(1L, 1000L),
      Gen.chooseNum(1, 64)), 8) { case (corpus, seed, buckets) =>
      val docs = corpus.toDF("doc_id", "text")
      val sh = TextAnalysis.corpusShuffle(docs, "doc_id", seed, buckets)
      val pos = sh.select("shuffle_pos").as[Long].collect().sorted
      assert(pos.toSeq == (0L until corpus.size.toLong).toSeq,
        s"not dense for seed=$seed buckets=$buckets")
      val seedR = ((seed % 1000000007L) + 1000000007L) % 1000000007L
      val sel = pmod((TextAnalysis.portableFingerprint(col("text")) +
        seedR) * 2654435761L, lit(1000000007L))
      val exp = docs.orderBy(sel, col("doc_id")).select("doc_id")
        .as[Long].collect().toSeq
      val got = sh.orderBy("shuffle_pos").select("doc_id")
        .as[Long].collect().toSeq
      assert(got == exp, s"order drift for seed=$seed buckets=$buckets")
    }
  }

  test("Bloom seen-set: zero false negatives for random corpora and geometries") {
    import graft.operators.SeenFilter
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(1L, 999L),
      Gen.chooseNum(1, 8), Gen.chooseNum(1, 6)), 8) {
      case (corpus, seed, k, shards) =>
        val docs = corpus.toDF("doc_id", "text")
        val filter = SeenFilter.buildFilter(docs, seed = seed, kHashes = k,
          mBits = 256, numShards = shards)
        assert(SeenFilter.markSeen(docs, filter)
          .where(!col("maybe_seen")).count() == 0,
          s"false negative at seed=$seed k=$k shards=$shards")
    }
  }

  test("count-min: estimate >= true count for every token, random corpora and geometries") {
    import graft.functions.{Functions => F}
    import graft.operators.FrequencySketch
    forSamples(Gen.zip(genCorpus, Gen.chooseNum(1L, 999L),
      Gen.chooseNum(1, 4), Gen.oneOf(8, 16, 64)), 8) {
      case (corpus, seed, depth, width) =>
        val docs = corpus.toDF("doc_id", "text")
        val sketch = FrequencySketch.tokenSketch(docs, seed = seed,
          depth = depth, width = width)
        val truth = docs.select(explode(filter(F.tokens(col("text")),
            t => length(t) > 0)).as("token"))
          .groupBy("token").count()
        val under = FrequencySketch.estimateTokens(truth, sketch, "token")
          .where(col("est") < col("count")).count()
        assert(under == 0,
          s"underestimate at seed=$seed depth=$depth width=$width")
    }
  }
}
