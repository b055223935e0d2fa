package graft
import org.apache.spark.sql.SparkSession
/** Dev utility: time individual SparkEntry queries at a given SF dir.
  * Each query runs twice (cold, warm) against the noop sink — the same
  * full-evaluation measurement Bench uses.
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    // %f formatting must be locale-independent or the JSON line breaks
    // on decimal-comma locales
    java.util.Locale.setDefault(java.util.Locale.ROOT)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { q =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val cold = once(); val warm = once()
      println(f"BENCHONE $q cold=$cold%.2f warm=$warm%.2f sec")
    }
    spark.stop()
  }
}
