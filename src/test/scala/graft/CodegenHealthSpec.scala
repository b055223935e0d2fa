package graft

import org.apache.spark.sql.functions._

import graft.functions.FrameExpressions._
import graft.model.EventModel

/** Every custom expression must actually COMPILE under codegen — a janino
  * parse/compile failure silently falls back to the interpreted path and
  * only shows up as lost throughput. This spec evaluates each expression
  * family and fails if the codegen compiler reported an error.
  */
class CodegenHealthSpec extends SparkSpecBase {
  import spark.implicits._

  /** Run `body` with interpreter fallback DISABLED (factoryMode=CODEGEN_ONLY
    * turns an expression-codegen failure into a thrown error; codegen.fallback
    * =false does the same for whole-stage codegen) and return any
    * codegen-compile failures Spark logged anyway — belt and suspenders: the
    * hard-fail confs catch what log wording changes would hide, the log scrape
    * catches paths the confs don't govern.
    */
  private def codegenErrors(body: => Unit): Seq[String] = {
    val ctx = org.apache.logging.log4j.LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val collected = scala.collection.mutable.ArrayBuffer.empty[String]
    val appender = new org.apache.logging.log4j.core.appender.AbstractAppender(
      "graft-codegen-probe", null, null, true,
      org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(event: org.apache.logging.log4j.core.LogEvent): Unit = {
        val msg = event.getMessage.getFormattedMessage
        if (msg.contains("Failed to compile the generated Java code") ||
            msg.contains("falling back to interpreter mode")) {
          collected.synchronized {
            collected += s"${event.getLoggerName}: $msg" +
              Option(event.getThrown).map(t => s" :: ${t.getMessage}").getOrElse("")
          }
        }
      }
    }
    appender.start()
    val cfg = ctx.getConfiguration
    cfg.getRootLogger.addAppender(appender, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    val prevFactory = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFallback = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try { body; collected.synchronized(collected.toList) }
    finally {
      prevFactory.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFallback.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
      cfg.getRootLogger.removeAppender("graft-codegen-probe")
      ctx.updateLoggers()
      appender.stop()
    }
  }

  test("frame-field expressions compile under codegen (no interpreter fallback)") {
    val frames = (0L until 64L).map { i =>
      (EventModel.encode(EventModel.Frame(
        EventModel.markerForName("FS_EVENT"), 1700000000000L + i,
        Array.fill(8)(i.toByte), Array.fill(16)((i + 1).toByte))), i)
    }.toDF("value", "offset")
    val errs = codegenErrors {
      // the exact shape Verify/throughput run: all four fields + marker filter
      frames.repartition(4)
        .select(frame_marker(col("value")).as("m"), frame_ts_millis(col("value")).as("ts"),
          frame_header(col("value")).as("h"), frame_body(col("value")).as("b"))
        .where(col("m").isNotNull)
        .agg(count(lit(1)), min(col("ts")), sum(length(col("h"))), sum(length(col("b"))))
        .collect()
    }
    assert(errs.isEmpty, s"codegen fell back to interpreter:\n${errs.mkString("\n")}")
  }

  test("full wire path (frame fields + proto_decode + union) compiles under codegen") {
    import graft.model.ProtoDescriptors
    val header = ProtoDescriptors.header.encode(Seq(
      "app_1", "1", "fw", "user_1", "c_1", "h_1", "", "YARN", "EXECUTOR",
      "", Seq("TAG"), "", "", "", 0, ""))
    val fsBody = ProtoDescriptors.fsEvent.encode(Seq(
      "hdfs://nn:8020/tmp/a", "", "WRITE", "hdfs://nn:8020", 1L, "user1", "SUCCESS"))
    val frames = (0L until 64L).map { i =>
      (EventModel.encode(EventModel.Frame(
        EventModel.markerForName("FS_EVENT"), 1700000000000L + i, header, fsBody)), i)
    }.toDF("value", "offset")
    val errs = codegenErrors {
      val decoded = graft.sources.FrameSource.decodeFramesFast(frames.repartition(4))
      val typed = graft.sources.FrameSource.typedTable(decoded, "FS_EVENT")
      typed.groupBy(col("action")).agg(count(lit(1))).collect()
    }
    assert(errs.isEmpty, s"codegen fell back to interpreter:\n${errs.mkString("\n")}")
  }

  test("UnsafeProjection path (object-producer boundary) compiles: the stripMargin pipe trap") {
    // q_jvmstats_pivot runs the wire decode in a ProjectExec ABOVE a
    // mapPartitions object boundary — that projection compiles through
    // GenerateUnsafeProjection, whose class body is assembled inside
    // s\"\"\"...\"\"\".stripMargin: any generated line BEGINNING with `|`
    // loses the operator and the whole projection silently degrades to the
    // interpreted path. This is the exact query that caught it.
    val errs = codegenErrors {
      SparkEntry.queries("q_jvmstats_pivot")(spark, sfDir).collect()
    }
    assert(errs.isEmpty, s"codegen fell back to interpreter:\n${errs.mkString("\n")}")
  }

  test("custom-expression query families run with zero codegen fallbacks") {
    // one gate query per custom-expression family (WordShingles/MinHashAgg/
    // SigBandHashes, SimHashAgg/PortableTokenHash64, HyperplaneSig,
    // VecDot/VecL2Norm/VecCosine, CentroidProbes) at sf0.001 — any compile failure in
    // any plan shape these reach surfaces here instead of as silent
    // interpreted-path throughput loss
    val families = Seq("q_minhash_pairs", "q_simhash_pairs", "q_embed_neardup",
      "q_knn_brute", "q_ivf_ann",
      // round-10 families: Bloom bit test (bridged ShiftRightUnsigned),
      // count-min grid lookup, html_text/preClean scalars, the
      // perceptron's unrolled fold scoring
      "q_bloom_seen", "q_countmin", "q_html_extract", "q_perceptron")
    val errs = codegenErrors {
      families.foreach(q => SparkEntry.queries(q)(spark, sfDir).collect())
    }
    assert(errs.isEmpty, s"codegen fell back to interpreter:\n${errs.mkString("\n")}")
  }

  test("portable token hash (two-hash combine) compiles in a forced projection") {
    import graft.functions.TextExpressions.portable_token_hash
    val docs = (0 until 64).map(i => (i.toLong, s"alpha beta $i")).toDF("doc_id", "text")
    val errs = codegenErrors {
      // route through an object boundary so the hash lands in a
      // GenerateUnsafeProjection (not WSCG) — the stripMargin-sensitive path
      val objBoundary = docs.as[(Long, String)].mapPartitions(identity).toDF("doc_id", "text")
      objBoundary.select(col("doc_id"), portable_token_hash(col("text")).as("h"))
        .agg(count(lit(1)), max(col("h")), sum(pmod(col("h"), lit(1000000L)))).collect()
    }
    assert(errs.isEmpty, s"codegen fell back to interpreter:\n${errs.mkString("\n")}")
  }
}
