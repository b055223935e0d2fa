package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** S7/ST4/ST5/Q12: the day-partitioned Parquet sink with late-data grace,
  * small-file compaction and retention.
  *
  * The reference hand-rolls offset recovery, heartbeats, tmp-file renames
  * and row-group merges (reference: readers/hdfs/src/main/java/.../writer/
  * PartitionedWriter.java, offset/HdfsOffsetComputer.java,
  * writer/ProtoParquetWriterWithOffset.java:99-180). In Spark all of ST1-ST3
  * collapses into the checkpointed file sink; what remains ours is the
  * layout (partition columns), the watermark (26 h late-data grace,
  * ReaderFactory.java:221-229), compaction and retention.
  *
  * Layout for 100 TB: partitionBy(event_type, day) — queries prune on both;
  * the union-view `event_type` filter becomes partition pruning, which is
  * exactly the reference's one candidate Catalyst rule (SURVEY §4.2).
  */
object EventSink {

  /** Streaming writer: day-partitioned parquet with 26 h watermark. */
  def partitionedStreamWriter(events: DataFrame, path: String, checkpoint: String,
                              lateness: String = "26 hours",
                              trigger: Trigger = Trigger.ProcessingTime("10 seconds"))
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    events
      .withWatermark("timestamp", lateness)
      .withColumn("day", to_date(date_trunc("day", col("timestamp"))))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy("event_type", "day")
      .trigger(trigger)
  }

  /** Batch writer with the same layout (used by tests and backfills). */
  def writePartitioned(events: DataFrame, path: String, tsCol: String = "timestamp"): Unit =
    events
      .withColumn("day", to_date(date_trunc("day", col(tsCol))))
      .write.mode(SaveMode.Append)
      .partitionBy("event_type", "day")
      .parquet(path)

  /** ST5: small-file compaction — rewrite partitions whose file count
    * exceeds `maxFiles` into `targetFiles` files. Rewrite-then-swap per
    * partition directory; idempotent (re-running compacts nothing new).
    * The reference merges row groups binary-wise on close
    * (ProtoParquetWriterWithOffset.java:137-172); a relational rewrite is
    * the Spark-native equivalent (no Catalyst support for in-place merge).
    */
  def compactPartition(spark: SparkSession, tablePath: String, partitionSpec: Map[String, String],
                       maxFiles: Int = 8, targetFiles: Int = 1): Boolean = {
    val partPath = partitionSpec.map { case (k, v) => s"$k=$v" }.mkString("/")
    val dir = new org.apache.hadoop.fs.Path(s"$tablePath/$partPath")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return false
    val files = fs.listStatus(dir).filter(f => f.getPath.getName.endsWith(".parquet"))
    if (files.length <= maxFiles) return false
    val tmp = new org.apache.hadoop.fs.Path(s"$tablePath/.compact_tmp/$partPath")
    spark.read.parquet(dir.toString)
      .repartition(targetFiles)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    // swap: move new files in, drop old ones
    val newFiles = fs.listStatus(tmp).filter(f => f.getPath.getName.endsWith(".parquet"))
    files.foreach(f => fs.delete(f.getPath, false))
    newFiles.zipWithIndex.foreach { case (f, i) =>
      fs.rename(f.getPath, new org.apache.hadoop.fs.Path(dir, s"compacted-$i.parquet"))
    }
    fs.delete(new org.apache.hadoop.fs.Path(s"$tablePath/.compact_tmp"), true)
    true
  }

  /** Q12: retention — drop day partitions older than `retainDays` relative
    * to `today` (the reference's ILM hot→warm→delete collapses to partition
    * removal on a partitioned table).
    */
  def dropExpiredPartitions(spark: SparkSession, tablePath: String, eventType: String,
                            today: java.time.LocalDate, retainDays: Int): Seq[String] = {
    val base = new org.apache.hadoop.fs.Path(s"$tablePath/event_type=$eventType")
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) return Nil
    val cutoff = today.minusDays(retainDays.toLong)
    fs.listStatus(base).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .filter { p =>
        p.getName.startsWith("day=") &&
          java.time.LocalDate.parse(p.getName.stripPrefix("day=")).isBefore(cutoff)
      }
      .map { p => fs.delete(p, true); p.toString }
  }

  /** S9: register the dump as a partitioned external table in the catalog. */
  def registerTable(spark: SparkSession, name: String, path: String): Unit = {
    spark.sql(s"CREATE TABLE IF NOT EXISTS $name USING parquet LOCATION '$path'")
    spark.sql(s"MSCK REPAIR TABLE $name")
  }
}
