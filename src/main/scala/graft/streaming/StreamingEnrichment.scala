package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** J1, streaming flavor: enrich every event with application-level
  * attributes maintained as keyed state.
  *
  * The reference keeps a first-wins cache `application_id → app attrs`
  * built from APPLICATION_EVENTs with 5-minute expire-after-access, and a
  * container→component registry; every event is enriched on arrival
  * (reference: readers/elasticsearch/src/main/java/.../cache/
  * ElasticSearchCacheManager.java:15-92, AppEventEnrichment.java:6-23).
  *
  * Spark mapping: union the app-event stream and the fact stream into one
  * Dataset keyed by application_id, `flatMapGroupsWithState` holds the
  * first-wins attrs per app (TTL via processing-time timeout). Events that
  * arrive before their app's attrs pass through un-enriched — exactly the
  * reference's cache-miss behavior.
  *
  * Scale: state is one small record per live application (≪ events), hash
  * partitioned by app id; the event stream shuffles once on app id, which
  * a 1000-executor cluster absorbs as the natural keyed repartition.
  */
object StreamingEnrichment {

  /** App-level attributes (first-wins). */
  final case class AppAttrs(
      applicationName: String,
      framework: String,
      username: String,
      amContainerId: String,
      yarnTags: Seq[String])

  /** Union input: either an APPLICATION_EVENT carrying attrs, or a fact event. */
  final case class EnrichInput(
      applicationId: String,
      isAppEvent: Boolean,
      attrs: Option[AppAttrs],
      eventType: String,
      containerId: String,
      component: String,
      tsMillis: Long)

  final case class EnrichedEvent(
      applicationId: String,
      eventType: String,
      containerId: String,
      tsMillis: Long,
      applicationName: Option[String],
      framework: Option[String],
      username: Option[String],
      component: String,
      enriched: Boolean)

  /** Resolve UNKNOWN components against the AM container id
    * (reference: AppEventEnrichment.java:14-22).
    */
  def resolveComponent(component: String, containerId: String, attrs: Option[AppAttrs]): String =
    if (component == "UNKNOWN") attrs match {
      case Some(a) if a.amContainerId == containerId => "APP_MASTER"
      case Some(_) => "APP_SLAVE"
      case None => component
    } else component

  /** J2 per-app state: first-wins app attrs + the container→component
    * registry learned from every header
    * (reference: ElasticSearchCacheManager.java:48-92). Registry size is
    * bounded by live containers per application — small next to the events.
    */
  final case class EnrichState(attrs: Option[AppAttrs], containers: Map[String, String])

  def enrich(events: Dataset[EnrichInput], ttlMillis: Option[Long] = None): Dataset[EnrichedEvent] = {
    implicit val stateEnc = Encoders.product[EnrichState]
    implicit val outEnc = Encoders.product[EnrichedEvent]
    implicit val keyEnc = Encoders.STRING
    val timeoutConf =
      if (ttlMillis.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    events.groupByKey(_.applicationId)
      .flatMapGroupsWithState[EnrichState, EnrichedEvent](OutputMode.Append, timeoutConf) {
        (appId: String, it: Iterator[EnrichInput], state: GroupState[EnrichState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val out = scala.collection.mutable.ArrayBuffer.empty[EnrichedEvent]
            var st = state.getOption.getOrElse(EnrichState(None, Map.empty))
            // In-batch determinism: fold in event-time order so "first-wins"
            // is by timestamp, not arrival order (SURVEY §7.4 risk 3).
            // MEMORY BOUND, stated: the sort buffers ONE app's micro-batch
            // slice in the task heap. The bound is per-(app, batch), not
            // per-corpus — at the reference's rates (10^4-10^5 live apps
            // sharing a trigger's events) a slice is thousands of events;
            // an adversarially hot single app needs a shorter trigger (the
            // knob that bounds every per-batch structure here) or the
            // batch Enrichment flavor. Determinism is the contract the
            // sort buys; dropping it re-opens arrival-order replays.
            it.toSeq.sortBy(e => (e.tsMillis, e.eventType)).foreach { e =>
              if (e.isAppEvent) {
                if (st.attrs.isEmpty) st = st.copy(attrs = e.attrs) // first-wins
              } else {
                // learn container→component from every header carrying a
                // real component (first-wins, UNKNOWN/empty never learned —
                // ElasticSearchCacheManager.java:48-56)
                if (e.containerId.nonEmpty && e.component.nonEmpty &&
                    e.component != "UNKNOWN" && !st.containers.contains(e.containerId))
                  st = st.copy(containers = st.containers + (e.containerId -> e.component))
                val attrs = st.attrs
                // component enrichment only runs once app attrs are cached
                // (enrichEvent returns early on cache miss,
                // ElasticSearchCacheManager.java:58-70); registry hit
                // overrides, UNKNOWN resolves via AM container and the
                // resolution is learned back (lines 71-92)
                val component =
                  if (attrs.isEmpty || e.containerId.isEmpty) e.component
                  else st.containers.get(e.containerId) match {
                    case Some(c) => c
                    case None if e.component == "UNKNOWN" =>
                      val resolved = resolveComponent(e.component, e.containerId, attrs)
                      st = st.copy(containers = st.containers + (e.containerId -> resolved))
                      resolved
                    case None => e.component
                  }
                out += EnrichedEvent(
                  appId, e.eventType, e.containerId, e.tsMillis,
                  attrs.map(_.applicationName), attrs.map(_.framework), attrs.map(_.username),
                  component,
                  enriched = attrs.isDefined)
              }
            }
            if (st.attrs.isDefined || st.containers.nonEmpty) {
              state.update(st)
              ttlMillis.foreach(state.setTimeoutDuration)
            }
            out.iterator
          }
      }
  }
}
