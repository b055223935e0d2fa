package graft.operators

import scala.concurrent.duration.Duration

/** Shared concurrency harness for partition-wise maintenance sweeps
  * ([[IvfIndexStore.compactGeneration]], the day-partition compaction in
  * [[graft.streaming.StreamingGate.sinkMaintenance]], …).
  *
  * Different partitions of one table may be maintained in parallel — each
  * rewrite takes its own per-partition lock and the Spark scheduler is
  * thread-safe — and MUST be, or the sweep's latency is O(partitions) in
  * job-launch overhead. This helper owns the pool lifecycle, including the
  * failure discipline the sweeps share: a timed-out/failed sweep must not
  * return while background rewrites are still mutating partitions, because
  * the caller's next move is recovery, whose contract is "no maintainer
  * live" — so on failure the pool is interrupted and DRAINED, and an
  * un-drained pool surfaces loudly instead of returning.
  */
object Maintenance {

  /** Default sweep parallelism: enough to hide per-partition job-launch
    * latency without saturating the scheduler; override per deployment
    * (the knob the hard-coded pools lacked).
    */
  val DefaultSweepParallelism: Int = 8

  /** Run `work` over `items` on a bounded pool; returns the results in
    * input order. Throws the first failure (or a TimeoutException) AFTER
    * interrupting and draining the pool; an un-drained pool escalates to
    * an IllegalStateException naming `what`.
    */
  def parallelSweep[A, B](items: Seq[A], what: String,
                          parallelism: Int = DefaultSweepParallelism,
                          timeout: Duration = Duration(600, "s"))
                         (work: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(parallelism, items.length)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    var completed = false
    try {
      val futs = items.map(a => scala.concurrent.Future(work(a)))
      val out = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs), timeout)
      completed = true
      out
    } finally {
      if (completed) pool.shutdown()
      else {
        pool.shutdownNow()
        val drained = pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
        if (!drained) throw new IllegalStateException(
          s"$what sweep failed AND its worker threads did not drain within 60 s — " +
            "partitions may still be mutating; do NOT run recovery until they stop")
      }
    }
  }
}
