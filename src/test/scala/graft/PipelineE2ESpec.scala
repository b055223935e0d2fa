package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.model.EventModel
import graft.model.EventModel.Frame
import graft.sources.FrameSource
import graft.streaming.EventSink

/** End-to-end streaming pipeline (SURVEY §3.2 batch-dump path): binary
  * wire frames → lazy codegen decode → day-partitioned checkpointed
  * Parquet sink → catalog-style readback with partition pruning.
  */
class PipelineE2ESpec extends SparkSpecBase {
  import spark.implicits._

  test("prepareAudited: the drop ledger is stage-ordered, monotone, and matches the plain run") {
    import graft.operators.TrainingPipeline
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    val cfg = TrainingPipeline.Config(minQuality = 0.1,
      gateGroupCol = Some("source"), gateKeepFrac = 0.8)
    val (out, ledger) = TrainingPipeline.prepareAudited(docs, "doc_id",
      cfg = cfg, evalDocs = Some(docs.where(col("doc_id") < 3)))
    val names = ledger.map(_._1)
    assert(names == Seq("exact_dedup", "near_dup_keep_best", "decontaminated",
      "quality_floor", "group_gate", "final"), names.mkString(", "))
    // drop-only stages: survivor counts never increase
    ledger.map(_._2).sliding(2).foreach { case Seq(a, b) => assert(b <= a, ledger) }
    assert(ledger.last._2 == out.count())
    // audit mode changes nothing about the result (id-set compare — an
    // exceptAll would plan the JOIN of two full pipeline lineages, which
    // the small test JVM cannot hold)
    val plain = TrainingPipeline.prepare(docs, "doc_id",
      cfg = cfg, evalDocs = Some(docs.where(col("doc_id") < 3)))
    val outIds = out.select("doc_id").as[Long].collect().sorted.toSeq
    val plainIds = plain.select("doc_id").as[Long].collect().sorted.toSeq
    assert(outIds == plainIds)
    out.unpersist()
  }

  test("preClean stage: mojibake'd and decomposed spellings dedup with their clean twins") {
    import graft.operators.TrainingPipeline
    def garble(s: String) =
      new String(s.getBytes("UTF-8"), java.nio.charset.StandardCharsets.ISO_8859_1)
    val body = "the café menu lists thé and crème for the naïve visitor today"
    val docs = Seq(
      (1L, body),
      (2L, garble(body)),                                      // mojibake twin
      (3L, java.text.Normalizer.normalize(body,
        java.text.Normalizer.Form.NFD)),                       // decomposed twin
      (4L, "a completely different document about spark plans today")
    ).toDF("doc_id", "text")
    val cleaned = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(preClean = true))
    // the three spellings collapse to ONE survivor; the unrelated doc stays
    assert(cleaned.count() == 2, cleaned.collect().mkString("\n"))
    assert(cleaned.where(col("doc_id") === 4L).count() == 1)
    // without preClean the byte-different spellings all survive exact dedup
    val dirty = TrainingPipeline.prepare(docs, "doc_id")
    assert(dirty.count() == 4)
  }

  test("paragraphDedup stage: boilerplate-differing docs collapse at the doc level") {
    import graft.operators.TrainingPipeline
    val content = "the actual article body with enough words to score on quality"
    val docs = Seq(
      (1L, s"COOKIE BANNER\n$content\nsite footer text"),
      (2L, s"COOKIE BANNER\n$content\nsite footer text"), // exact dup anyway
      (3L, s"DIFFERENT BANNER\n$content"),                // boilerplate-differing dup
      (4L, "COOKIE BANNER\nsite footer text"),            // pure boilerplate — vanishes
      (5L, "another article entirely, about spark physical plans")
    ).toDF("doc_id", "text")
    val out = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(paragraphDedup = true)).persist()
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(4L), "pure-boilerplate doc must vanish")
    assert(ids.contains(5L))
    // docs 1 and 2 were exact dups → one survivor carrying the article
    // (plus its banner/footer, which it owns as first carrier)
    assert(ids.count(Set(1L, 2L)) == 1, s"exact dups must collapse: $ids")
    // doc 3 lost its article body to the first carrier: all that remains
    // is its unique banner — exactly the husk a downstream quality floor
    // exists to drop
    assert(out.where(col("doc_id") === 3L).select("text").as[String]
      .collect().toSeq == Seq("DIFFERENT BANNER"))
    val floored = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(paragraphDedup = true, minQuality = 0.45))
      .select("doc_id").as[Long].collect().toSet
    assert(!floored.contains(3L), s"the husk must fail the quality floor: $floored")
    // ledger carries the stage; note the exact dup (doc 2) ALSO vanishes
    // here — every one of its paragraphs loses to doc 1 — so paragraph
    // dedup subsumes exact dedup for same-text docs
    val (_, ledger) = TrainingPipeline.prepareAudited(docs, "doc_id",
      cfg = TrainingPipeline.Config(paragraphDedup = true))
    assert(ledger.head._1 == "paragraph_dedup" && ledger.head._2 == 3L, ledger)
    out.unpersist()
  }

  test("lineDedup stage: intra-doc repeats collapse BEFORE dedup, so line-spam twins become exact dups") {
    import graft.operators.TrainingPipeline
    val body = "the real article content with enough distinct words here"
    val docs = Seq(
      (1L, s"$body\npromo line"),
      // same content, promo line spammed — identical to doc 1 AFTER the pass
      (2L, s"$body\npromo line\npromo line\npromo line"),
      (3L, "a different article about catalyst plan shapes entirely")
    ).toDF("doc_id", "text")
    val out = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(lineDedup = true))
    val ids = out.select("doc_id").as[Long].collect().toSet
    assert(ids.count(Set(1L, 2L)) == 1,
      s"line-spam twins must collapse to one survivor: $ids")
    assert(ids.contains(3L))
    assert(out.where(col("text").contains("promo line\npromo line")).isEmpty,
      "no surviving text may carry a repeated line")
    // the ledger shows WHERE the twins collapse: with the stage they are
    // byte-identical and die at EXACT dedup (3 → 2); without it they are
    // byte-different and only the near-dup stage can catch them
    val (_, ledgerOn) = TrainingPipeline.prepareAudited(docs, "doc_id",
      cfg = TrainingPipeline.Config(lineDedup = true))
    assert(ledgerOn.toMap.apply("exact_dedup") == 2L, ledgerOn)
    val (_, ledgerOff) = TrainingPipeline.prepareAudited(docs, "doc_id")
    assert(ledgerOff.toMap.apply("exact_dedup") == 3L, ledgerOff)
  }

  test("gopherRules + blockPhrases stages: map-only drop gates run before the dedup shuffles") {
    import graft.operators.TrainingPipeline
    val good = "the cat and the dog have been with us for many good years now"
    val docs = Seq(
      (1L, good),
      (2L, "it is the story of lorem ipsum placeholder text and that is all we have here today"),
      (3L, "zz qq rr ss tt uu vv ww xx yy aa bb cc dd") // fails stop-word rule
    ).toDF("doc_id", "text")
    val (out, ledger) = TrainingPipeline.prepareAudited(docs, "doc_id",
      cfg = TrainingPipeline.Config(gopherRules = true, gopherMinWords = 10L,
        blockPhrases = Seq("lorem ipsum")))
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L))
    val m = ledger.toMap
    assert(m("gopher_rules") == 2L, ledger) // doc 3 dies on the rules
    assert(m("phrase_blocklist") == 1L, ledger) // doc 2 dies on the phrase
    // stages off by default: nothing drops
    val off = TrainingPipeline.prepare(docs, "doc_id")
    assert(off.count() == 3)
  }

  test("training pipeline: dedup -> keep-best -> quality floor -> split, idempotent") {
    import graft.operators.{Dedup, TrainingPipeline}
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val out = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(minQuality = 0.1)).persist()
    val n = out.count()
    assert(n > 0 && n < docs.count()) // fixture contains dups → something dropped
    // no exact duplicates survive
    assert(out.groupBy(xxhash64(col("text"))).count().where(col("count") > 1).isEmpty)
    // no near-dup pair survives either: re-running detection on the output is empty
    assert(Dedup.minHashNearDupsExact(out, "doc_id").isEmpty)
    // quality floor holds, split covers both sides
    assert(out.where(col("quality") < 0.1).isEmpty)
    assert(out.select("split").distinct().count() == 2)
    // deterministic: running the whole pipeline again yields the same rows
    val again = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(minQuality = 0.1))
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty)
    out.unpersist()
  }

  test("classifier gate: spam-shaped docs are removed by the trained model, ledger records the stage") {
    import graft.operators.TrainingPipeline
    // corpus: half clean prose, half spam-shaped — each doc unique
    val corpus = ((0L until 30L).map(i =>
        (i, s"excellent prose quality writing unique$i common words")) ++
      (30L until 60L).map(i =>
        (i, s"spam junk clickbait garbage unique$i common words")))
      .toDF("doc_id", "text")
    // labeled seed: disjoint ids, same vocabulary signal
    val seed = ((100L until 120L).map(i =>
        (i, 1, s"excellent prose quality writing seed$i common words")) ++
      (120L until 140L).map(i =>
        (i, -1, s"spam junk clickbait garbage seed$i common words")))
      .toDF("doc_id", "y", "text")
    val (out, ledger) = TrainingPipeline.prepareAudited(corpus, "doc_id",
      classifierSeed = Some(seed))
    val kept = out.select("doc_id").as[Long].collect().toSet
    assert(kept == (0L until 30L).toSet,
      s"model must keep exactly the prose half: ${kept.toSeq.sorted}")
    assert(ledger.map(_._1).contains("classifier_gate"), ledger)
    // without the seed the stage does not run and spam survives
    val plain = TrainingPipeline.prepare(corpus, "doc_id")
    assert(plain.count() == 60)
  }

  test("release layer: write, verified read-back, tamper and lost-partition are loud") {
    import graft.operators.TrainingPipeline
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val (out, ledger) = TrainingPipeline.prepareAudited(docs, "doc_id")
    val root = java.nio.file.Files.createTempDirectory("release_").toString
    val gen = TrainingPipeline.writeRelease(out, root, ledger = ledger)
    val back = TrainingPipeline.readRelease(spark, root)
    assert(back.count() == out.count())
    assert(back.select("doc_id").exceptAll(out.select("doc_id")).isEmpty)
    // the manifest records the ledger
    val manifest = graft.operators.Manifests.read(spark, s"$root/_DATASET.json").get
    assert(manifest.contains("exact_dedup=") && manifest.contains(s""""generation":"$gen""""))
    // tamper: delete one split dir → verification must fail loudly
    val dataDir = new java.io.File(s"$root/$gen/data")
    val splitDir = dataDir.listFiles().filter(_.getName.startsWith("split=")).head
    def rmRf(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rmRf); f.delete()
    }
    rmRf(splitDir)
    intercept[IllegalStateException] {
      TrainingPipeline.readRelease(spark, root).count()
    }
    intercept[IllegalStateException] {
      TrainingPipeline.readRelease(spark,
        java.nio.file.Files.createTempDirectory("release_none_").toString)
    }
    // fingerprint-version guard: a release cut under different fingerprint
    // arithmetic (or predating versioning) must fail loudly — its split
    // membership is fingerprint-derived, so mixing versions leaks holdout
    val root2 = java.nio.file.Files.createTempDirectory("release_fpv_").toString
    TrainingPipeline.writeRelease(out, root2, ledger = ledger)
    val mf = graft.operators.Manifests.read(spark, s"$root2/_DATASET.json").get
    assert(mf.contains("\"fp_version\":"), mf)
    graft.operators.Manifests.writeAtomic(spark, s"$root2/_DATASET.json",
      mf.replaceAll("\"fp_version\":\\d+", "\"fp_version\":1"))
    val drift = intercept[Exception] {
      TrainingPipeline.readRelease(spark, root2)
    }
    assert(drift.getMessage.contains("fingerprint"), drift.getMessage)
    graft.operators.Manifests.writeAtomic(spark, s"$root2/_DATASET.json",
      mf.replaceAll("\"fp_version\":\\d+,", ""))
    val legacy = intercept[IllegalStateException] {
      TrainingPipeline.readRelease(spark, root2)
    }
    assert(legacy.getMessage.contains("predates fingerprint versioning"),
      legacy.getMessage)
  }

  test("training pipeline with decontamination: eval-overlapping docs dropped") {
    import graft.operators.{TextAnalysis, TrainingPipeline}
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text")
    val eval = docs.where(col("doc_id") % 20 === 0)
    val corpus = docs.where(col("doc_id") % 20 =!= 0)
    val out = TrainingPipeline.prepare(corpus, "doc_id",
      cfg = TrainingPipeline.Config(decontaminateK = 8), evalDocs = Some(eval)).persist()
    // nothing in the output shares an 8-gram with the eval set
    assert(TextAnalysis.contaminatedIds(out, eval, "doc_id", k = 8).isEmpty)
    // decontamination only ever removes rows vs the plain pipeline
    val plain = TrainingPipeline.prepare(corpus, "doc_id")
    assert(out.count() <= plain.count())
    assert(out.select("doc_id").exceptAll(plain.select("doc_id")).isEmpty)
    out.unpersist()
  }

  test("training pipeline: LM floor and per-source gate only remove rows, honor bounds") {
    import graft.operators.{TextAnalysis, TrainingPipeline}
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "source")
    val plain = TrainingPipeline.prepare(docs, "doc_id").persist()
    // LM floor against an en-slice model: survivors all clear the floor,
    // and the stage is drop-only vs the plain pipeline
    val ref = graft.sources.Tables.load(spark, sfDir, "documents")
      .where(col("lang") === "en").select("doc_id", "text")
    val withLm = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(minFamiliarity = 0.3), lmRefDocs = Some(ref))
    assert(withLm.where(col("familiarity") < 0.3).isEmpty)
    assert(withLm.select("doc_id").exceptAll(plain.select("doc_id")).isEmpty)
    // per-source gate: kept mass ≈ the target fraction, drop-only
    val gated = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(gateGroupCol = Some("source"), gateKeepFrac = 0.5))
      .persist()
    val n = plain.count(); val kept = gated.count()
    assert(kept >= n * 45 / 100 && kept <= n * 60 / 100,
      s"gate kept $kept of $n — far from the 50% target")
    assert(gated.select("doc_id").exceptAll(plain.select("doc_id")).isEmpty)
    plain.unpersist(); gated.unpersist()
  }

  test("training pipeline: upsample stage repeats small train strata, never val") {
    import graft.operators.TrainingPipeline
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text", "lang")
    val plain = TrainingPipeline.prepare(docs, "doc_id").persist()
    val up = TrainingPipeline.prepare(docs, "doc_id",
      cfg = TrainingPipeline.Config(upsampleStrataCol = Some("lang"),
        upsampleMaxFactor = 4.0)).persist()
    // same underlying docs, same split decisions — only repetition added
    assert(up.select("doc_id").distinct()
      .exceptAll(plain.select("doc_id").distinct()).isEmpty)
    assert(up.where(col("epoch") === 0).select("doc_id", "split")
      .exceptAll(plain.select("doc_id", "split")).isEmpty)
    // val rows are never repeated; some train stratum is
    assert(up.where(col("split") === "val" && col("epoch") > 0).isEmpty)
    assert(up.where(col("split") === "train").count() >
      plain.where(col("split") === "train").count())
    plain.unpersist(); up.unpersist()
  }

  private def frame(marker: Int, dayOffsetMs: Long, body: String): Array[Byte] =
    EventModel.encode(Frame(marker,
      java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime + dayOffsetMs,
      Array[Byte](1), body.getBytes("UTF-8")))

  test("frames stream through decode into the partitioned sink exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val dir = Files.createTempDirectory("e2e-sink").toString
    val ckpt = Files.createTempDirectory("e2e-ckpt").toString

    val input = MemoryStream[(Array[Byte], Long)]
    input.addData(
      frame(1, 0L, "fs-1") -> 1L,                      // FS_EVENT day 1
      frame(1000, 3600 * 1000L, "gc-1") -> 2L,         // GC_EVENT day 1
      frame(1, 25L * 3600 * 1000, "fs-2") -> 3L,       // FS_EVENT day 2
      frame(3, 0L, "state") -> 4L,                     // STATE_EVENT filtered out
      Array.fill[Byte](5)(0) -> 5L)                    // corrupt dropped
    val decoded = FrameSource.decodeFramesFast(
      input.toDF().toDF("value", "offset"),
      acceptedTypes = Seq("FS_EVENT", "GC_EVENT"))
      .drop("header", "body") // parquet-friendly projection
    val q = EventSink.partitionedStreamWriter(decoded, dir, ckpt,
      trigger = Trigger.AvailableNow()).start()
    q.awaitTermination(60000)

    val out = spark.read.parquet(dir)
    assert(out.count() == 3)
    // layout prunes on both partition columns
    assert(new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-01").isDirectory)
    assert(new java.io.File(s"$dir/event_type=FS_EVENT/day=2024-03-02").isDirectory)
    assert(new java.io.File(s"$dir/event_type=GC_EVENT/day=2024-03-01").isDirectory)
    assert(out.where(col("event_type") === "FS_EVENT" && col("day") === "2024-03-01").count() == 1)

    // restart with same checkpoint + same data → no duplicates (exactly-once resume)
    val q2 = EventSink.partitionedStreamWriter(
      FrameSource.decodeFramesFast(input.toDF().toDF("value", "offset"),
        acceptedTypes = Seq("FS_EVENT", "GC_EVENT")).drop("header", "body"),
      dir, ckpt, trigger = Trigger.AvailableNow()).start()
    q2.awaitTermination(60000)
    assert(spark.read.parquet(dir).count() == 3)
  }
}
