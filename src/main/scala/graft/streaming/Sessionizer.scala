package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** D10/A11: sessionized stateful aggregation per application lifetime.
  *
  * The reference folds every event into per-(app#attempt, container)
  * counters and flushes one result row per app when the END StateEvent
  * empties the container registry; state is lost on crash and there is no
  * safety-net timeout (acknowledged TODO,
  * reference: readers/heuristics/src/main/java/.../Heuristics.java:129-167).
  *
  * Spark mapping: `groupByKey(app#attempt).flatMapGroupsWithState` with an
  * event-time timeout — same flush-on-END semantics plus the missing
  * safety net, and state survives restarts via the state store (strictly
  * stronger than the reference). Scale: state is partitioned by app key
  * across executors; per-key state is O(#containers) capped logically by
  * the heuristics' 10-container detail limit.
  */
object Sessionizer {

  /** Input: the generic shape every heuristic fold consumes. */
  final case class SessionEvent(
      appKey: String,          // applicationId + "#" + attemptId
      containerId: String,
      eventType: String,       // e.g. GC_EVENT / JVMSTATS_EVENT / STATE_EVENT
      state: String,           // StateEvent payload ("END" closes the app)
      tsMillis: Long,
      metric: Double)          // the folded measure (pause time, heap used, ...)

  /** Per-session accumulated state. `ended` marks a TOMBSTONE: the session
    * closed on END but the key's state is retained (until the event-time
    * timeout reaps it) so at-least-once stragglers arriving after the END
    * cannot restart the session as a bogus second one.
    */
  final case class SessionState(
      containers: Set[String],
      count: Long,
      sum: Double,
      max: Double,
      min: Double,
      firstTs: Long,
      lastTs: Long,
      ended: Boolean = false)

  /** Output row on session close. */
  final case class SessionResult(
      appKey: String,
      nContainers: Int,
      count: Long,
      sum: Double,
      max: Double,
      min: Double,
      durationMillis: Long,
      closedBy: String)        // "END" | "TIMEOUT"

  val emptyState: SessionState =
    SessionState(Set.empty, 0L, 0.0, Double.MinValue, Double.MaxValue, Long.MaxValue, Long.MinValue)

  def fold(s: SessionState, e: SessionEvent): SessionState =
    SessionState(
      containers = s.containers + e.containerId,
      count = s.count + 1,
      sum = s.sum + e.metric,
      max = math.max(s.max, e.metric),
      min = math.min(s.min, e.metric),
      firstTs = math.min(s.firstTs, e.tsMillis),
      lastTs = math.max(s.lastTs, e.tsMillis))

  def result(key: String, s: SessionState, closedBy: String): SessionResult =
    SessionResult(key, s.containers.size, s.count, s.sum, s.max, s.min,
      if (s.count == 0) 0L else s.lastTs - s.firstTs, closedBy)

  /** The stateful session operator. Works on a streaming or batch Dataset
    * (Spark runs flatMapGroupsWithState in batch as a single-pass group
    * fold) — with the one inherent difference that TIMEOUT flushes are a
    * streaming concept: batch planning eliminates the watermark, so in
    * batch only END closes sessions (non-ENDed groups emit nothing) and no
    * timeout is registered (registering one would throw — there is no
    * watermark to time out against).
    *
    * @param timeoutMillis optional safety-net flush once the WATERMARK
    *                      passes `last event + timeoutMillis` — the missing
    *                      "safety net" the reference acknowledges at
    *                      Heuristics.java:139-140. Event-time, not
    *                      processing-time, so a replay of the same stream
    *                      closes the same sessions at the same points
    *                      (SURVEY §2.5/A11's determinism requirement).
    *                      Callers must put a watermark on the stream (e.g.
    *                      `timestamp_millis(tsMillis)` + `withWatermark`)
    *                      before this operator. None ⇒ flush only on END,
    *                      and a straggler after END restarts state for the
    *                      key (there is no timeout to reap a tombstone);
    *                      with a timeout configured, an ENDed key leaves a
    *                      tombstone that swallows stragglers until the
    *                      timeout reaps it.
    */
  def sessionAggregate(events: Dataset[SessionEvent],
                       timeoutMillis: Option[Long] = None): Dataset[SessionResult] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionResult]
    implicit val keyEnc = Encoders.STRING

    val timeoutConf =
      if (timeoutMillis.isDefined) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(_.appKey)
      .flatMapGroupsWithState[SessionState, SessionResult](
        OutputMode.Append, timeoutConf) {
        (key: String, it: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          // batch planning eliminates the watermark (EliminateEventTime-
          // Watermark); getCurrentWatermarkMs then THROWS. No watermark ⇒
          // timeouts can never fire ⇒ register none.
          def watermarkMs: Option[Long] =
            try Some(state.getCurrentWatermarkMs)
            catch { case _: UnsupportedOperationException => None }
          // fire when the watermark passes last-event + timeout (must
          // stay above the current watermark or Spark rejects it)
          def armTimeout(lastTs: Long): Unit =
            for (t <- timeoutMillis; wm <- watermarkMs)
              state.setTimeoutTimestamp(math.max(lastTs + t, wm + 1))
          if (state.hasTimedOut) {
            // a tombstone reaping is silent — its END row already went out
            val out = state.getOption.filterNot(_.ended)
              .map(s => result(key, s, "TIMEOUT")).iterator
            state.remove()
            out
          } else {
            val prior = state.getOption.getOrElse(emptyState)
            if (prior.ended) {
              // at-least-once straggler after END: swallow, keep the
              // tombstone armed so the timeout still reaps it
              armTimeout(prior.lastTs)
              Iterator.empty
            } else {
              var s = prior
              var ended = false
              it.foreach { e =>
                s = fold(s, e)
                if (e.eventType == "STATE_EVENT" && e.state == "END") ended = true
              }
              if (ended) {
                if (timeoutMillis.isDefined && watermarkMs.isDefined) {
                  // leave a tombstone (see SessionState.ended) instead of
                  // removing: stragglers must not restart the session
                  state.update(s.copy(ended = true))
                  armTimeout(s.lastTs)
                } else state.remove()
                Iterator.single(result(key, s, "END"))
              } else {
                state.update(s)
                armTimeout(s.lastTs)
                Iterator.empty
              }
            }
          }
      }
  }
}
