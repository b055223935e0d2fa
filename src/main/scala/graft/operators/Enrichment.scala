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
    */
  def firstWinsDim(df: DataFrame, key: String, order: Seq[String], attrs: Seq[String]): DataFrame =
    df.select((key +: order ++: attrs).distinct.map(col): _*)
      .withColumn("_rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(order.map(col): _*)))
      .where(col("_rn") === 1)
      .select((key +: attrs).map(col): _*)

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
