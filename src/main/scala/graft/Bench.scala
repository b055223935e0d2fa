package graft

import org.apache.spark.sql.SparkSession

/** Driver contract: run every SparkEntry query at SPARK_GRAFT_SF_DIR and
  * print ONE JSON line of per-query wall-clock seconds.
  *
  * Measurement hygiene:
  *  - results are written to the `noop` sink, which evaluates every output
  *    column (a bare `count()` lets Catalyst prune unreferenced projection
  *    work, so map-only queries would measure as free);
  *  - one unmeasured warmup run per query (codegen + JIT), then
  *    median-of-3 measured runs (this box shows large transient outliers);
  *  - failures propagate — a broken query must fail the bench, not record
  *    a fake fast time.
  */
object Bench {

  private def runOnce(spark: SparkSession, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame, sfDir: String): Double = {
    val t0 = System.nanoTime()
    fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/session so the first query isn't charged for executor
    // start; per-query warmup below handles per-plan codegen.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    graft.sources.Tables.load(spark, sfDir, "lineitem").write.format("noop").mode("overwrite").save()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      runOnce(spark, fn, sfDir) // warmup (codegen, shuffle-file cache)
      val times = Seq.fill(runs)(runOnce(spark, fn, sfDir)).sorted
      name -> times(times.length / 2)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
