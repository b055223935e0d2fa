package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** J1: enrichment of an event stream with per-application reference
  * attributes, batch flavor.
  *
  * The reference builds a first-wins cache `application_id → app attrs`
  * from APPLICATION_EVENTs and enriches every subsequent event
  * (reference: readers/elasticsearch/src/main/java/.../cache/ElasticSearchCacheManager.java:15-92,
  * cache/AppEventEnrichment.java:6-23). In batch, "first-wins" must be made
  * explicit (Kafka arrival order doesn't exist): we take the row with the
  * minimum (orderCols) per key via min_by-style window, then LEFT-join.
  *
  * Scale notes: the dimension side is one row per key (small — app-level
  * cardinality), so we `broadcast()` it; the fact side never shuffles.
  */
object Enrichment {

  /** Build a first-wins dimension: one row per `key`, the earliest by
    * `order` (deterministic — include a unique tiebreaker in `order`).
    *
    * `min_by` over the lexicographic order struct, not a `row_number() = 1`
    * window: the hash aggregate folds first-wins map-side with no
    * per-partition sort of the event stream (struct comparison is
    * field-by-field ascending — exactly `orderBy(order)`).
    */
  def firstWinsDim(df: DataFrame, key: String, order: Seq[String], attrs: Seq[String]): DataFrame =
    df.select((key +: order ++: attrs).distinct.map(col): _*)
      .groupBy(col(key))
      .agg(min_by(struct(attrs.map(col): _*), struct(order.map(col): _*)).as("_best"))
      .select(col(key) +: attrs.map(a => col("_best").getField(a).as(a)): _*)

  /** LEFT-enrich `facts` with a (small) dimension on `factKey == dimKey`.
    * Broadcasts the dimension: no shuffle of the fact side.
    */
  def enrich(facts: DataFrame, dim: DataFrame, factKey: String, dimKey: String): DataFrame =
    facts.join(broadcast(dim), facts(factKey) === dim(dimKey), "left")

  /** The reference's component resolution: a container whose component is
    * UNKNOWN becomes APP_MASTER iff it is the app's AM container, else
    * APP_SLAVE (reference: cache/AppEventEnrichment.java:14-22).
    */
  def resolveComponent(component: Column, containerId: Column, amContainerId: Column): Column =
    when(component === "UNKNOWN",
      when(containerId === amContainerId, "APP_MASTER").otherwise("APP_SLAVE"))
      .otherwise(component)
}
