package graft.heuristics

/** Severity scale and threshold rules of the heuristics reader, as pure
  * functions over aggregated counters — unit-testable exactly like the
  * reference's threshold tests.
  *
  * Scale (reference: readers/heuristics/src/main/java/.../HeuristicsResultDB.java:14-20):
  * NONE=0 LOW=1 MODERATE=2 SEVERE=3 CRITICAL=4.
  */
object Severity {
  val None = 0
  val Low = 1
  val Moderate = 2
  val Severe = 3
  val Critical = 4

  /** HeapUsage: severity from unused-heap ratio (max-peak)*100/max, only
    * when no major GC ran and peak < max
    * (reference: HeapUsage.java:79-89: >30 LOW, >50 MODERATE, >70 SEVERE).
    */
  def heapUsage(max: Long, peak: Long, majorGcCount: Long): Int =
    if (majorGcCount > 0 || max <= peak) None
    else {
      val ratio = (max - peak) * 100 / max
      if (ratio > 70) Severe
      else if (ratio > 50) Moderate
      else if (ratio > 30) Low
      else None
    }

  /** Locks: contention/s thresholds
    * (reference: Locks.java:36-40: >10 LOW, >50 MODERATE, >100 SEVERE, >500 CRITICAL).
    */
  def locks(contentionPerSec: Long): Int =
    if (contentionPerSec > 500) Critical
    else if (contentionPerSec > 100) Severe
    else if (contentionPerSec > 50) Moderate
    else if (contentionPerSec > 10) Low
    else None

  /** Safepoints: safepoints/s thresholds
    * (reference: Safepoints.java:36-40: >3 LOW, >5 MODERATE, >7 SEVERE, >10 CRITICAL).
    */
  def safepoints(safepointsPerSec: Long): Int =
    if (safepointsPerSec > 10) Critical
    else if (safepointsPerSec > 7) Severe
    else if (safepointsPerSec > 5) Moderate
    else if (safepointsPerSec > 3) Low
    else None

  /** Threads: severity from live-peak vs created-total ratio
    * (reference: Threads.java:43-52: ratio = maxCount*100/total;
    * <=10 LOW, <=0 impossible → the reference treats <=0 as MODERATE).
    */
  def threads(maxCount: Long, total: Long): Int = {
    if (total == 0) return None
    val ratio = maxCount * 100 / total
    if (ratio <= 0) Moderate
    else if (ratio <= 10) Low
    else None
  }

  /** CodeCacheUsage: MODERATE iff peak came within 5% of max
    * (reference: CodeCacheUsage.java:43-46). Degenerate max = 0 is
    * MODERATE (`max > peak` short-circuits before the division), exactly
    * like the reference AND [[graft.heuristics.HeuristicAggs
    * .codeCacheUsage]] — an extra `max > 0` guard here once made the two
    * flavors contradict each other on degenerate stats.
    */
  def codeCache(max: Long, peak: Long): Int =
    if (!(max > peak && (max - peak) * 100 / max >= 5)) Moderate else None

  /** GCCause: any Metadata-GC-Threshold / Ergonomics GC ⇒ MODERATE
    * (reference: GCCause.java:22-53).
    */
  def gcCause(flaggedGcCount: Long): Int = if (flaggedGcCount > 0) Moderate else None

  /** FileHeuristic: files-created thresholds vs configured max
    * (reference: FileHeuristic.java:76-84).
    */
  def filesCreated(created: Long, maxCreatedFiles: Long): Int =
    if (created > maxCreatedFiles) Severe
    else if (created > maxCreatedFiles / 2) Moderate
    else if (created > maxCreatedFiles / 10) Low
    else None

  /** G1GC full-GC: any MAJOR G1 collection ⇒ SEVERE (reference: G1GC.java:24-29). */
  def g1FullGc(majorCount: Long): Int = if (majorCount > 0) Severe else None

  /** FlinkCheckpointDuration: sticky SEVERE if > 15 min
    * (reference: flink/FlinkCheckpointDuration.java:96-110).
    */
  def flinkCheckpoint(maxDurationMillis: Long): Int =
    if (maxDurationMillis > 15 * 60 * 1000L) Severe else None

  /** Per-container detail cap before collapsing to cross-container sums
    * (reference: HeuristicHelper.java:13).
    */
  val MaxContainersPerHeuristic = 10
}
