package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.EventModel
import graft.model.EventModel.Frame
import graft.sources.FrameSource

/** Wire-path throughput benchmark: the BASELINE criterion is ~45 k
  * decoded-filtered-aggregated events/s (the reference pipeline's
  * single-threaded reader rate; BASELINE.md "BENCH target"). This drives
  * the §7.2 minimum slice over the envelope codec: synthesize frames →
  * decode → marker filter → per-type counts, and reports events/s and
  * events/s/core.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toInt).getOrElse(2000000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // Synthesize realistic frames: FS_EVENT-ish ~200B bodies, GC ~100B,
    // 10% corrupt records (the reference drops these, we must too).
    val markers = Array(0, 1, 3, 1000, 1001, 2000, 4000)
    val header = Array.fill[Byte](120)(7)
    val raw = spark.sparkContext.parallelize(0 until nEvents, cpus * 4).map { i =>
      if (i % 10 == 9) Array.fill[Byte](15)((i % 97).toByte) // corrupt
      else {
        val body = Array.fill[Byte](100 + (i % 5) * 40)((i % 127).toByte)
        EventModel.encode(Frame(markers(i % markers.length), 1700000000000L + i, header, body))
      }
    }.toDF("value").withColumn("offset", monotonically_increasing_id())

    raw.persist().count() // stage the input so we time decode only

    def run(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val counts = mk.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      val decodedN = counts.values.sum
      println(f"""{"metric":"$name","events_in":$nEvents,"decoded_matched":$decodedN,"sec":$secs%.3f,"events_per_sec":${(nEvents / secs).toLong},"events_per_sec_per_core":${(nEvents / secs / cpus).toLong},"cores":$cpus}""")
    }

    run("decode_throughput_fast") {
      FrameSource.decodeFramesFast(raw, acceptedTypes = Seq("FS_EVENT", "GC_EVENT", "STATE_EVENT"))
        .groupBy(col("event_type")).count()
    }
    run("decode_throughput_flatmap") {
      FrameSource.decodeFrames(spark, raw)
        .where(col("event_type").isin("FS_EVENT", "GC_EVENT", "STATE_EVENT"))
        .groupBy(col("event_type")).count()
    }
    spark.stop()
  }
}
