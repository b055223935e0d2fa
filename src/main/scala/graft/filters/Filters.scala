package graft.filters

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The routing/filter algebra of the event pipeline, as pure `Column`
  * predicates so Catalyst can push them into the scan.
  *
  * Mirrors the reference's filter combinators
  * (reference: readers/common/src/main/java/.../reader/GarmadonMessageFilter.java:34-196,
  * GarmadonMessageFilters.java:31-37): hasType / hasTag / hasContainerId /
  * hasFramework / and / or / not / ANY / NONE. The reference's two-phase
  * lazy evaluation (type marker before header parse) is subsumed by
  * Catalyst predicate pushdown + column pruning: a `Column` predicate on
  * `event_type` reaches the Parquet scan as a pushed filter, so header/body
  * columns of rejected rows are never materialized.
  */
object Filters {

  /** F1: equality on the envelope type. */
  def hasType(eventType: String): Column = col("event_type") === eventType

  /** F1 variant over several accepted types (used by the per-type fan-out). */
  def hasAnyType(eventTypes: String*): Column = col("event_type").isin(eventTypes: _*)

  /** F2: membership in the header tag list. */
  def hasTag(tag: String): Column = array_contains(col("tags"), tag)

  /** F3: equality on the container id header field. */
  def hasContainerId(id: String): Column = col("container_id") === id

  /** F4: equality on the framework header field. */
  def hasFramework(framework: String): Column = col("framework") === framework

  /** F7: constant-true filter. */
  val any: Column = lit(true)

  /** F7: constant-false filter. */
  val none: Column = lit(false)

  /** F5/F6 combinators — thin aliases over Column's boolean algebra, kept so
    * callers can compose route predicates the way the reference does.
    */
  def and(ps: Column*): Column = ps.reduceLeft(_ && _)
  def or(ps: Column*): Column = ps.reduceLeft(_ || _)
  def not(p: Column): Column = !p

  /** F10: path-prefix predicate (reference's path_hierarchy-analyzed match). */
  def pathStartsWith(pathCol: Column, prefix: String): Column =
    startswith(pathCol, lit(prefix))

  /** F9: composite-route dispatch as ONE scan. The reference registers N
    * listeners each with its own (composed) filter and delivers every
    * message to EVERY matching listener
    * (reference: readers/common/.../reader/GarmadonReader.java:141-174 —
    * the per-listener `filter.accepts` loop). The relational form: an
    * array of matched route names per row; `explode` of it IS the
    * at-least-once fan-out (a row matching k routes becomes k rows, a row
    * matching none disappears) — one pass over the data where a
    * union-of-filters plan would scan the source once per route.
    */
  def matchedRoutes(routes: Seq[(String, Column)]): Column =
    filter(
      array(routes.map { case (name, p) => when(p, lit(name)) }: _*),
      x => x.isNotNull)

  /** F9 dispatch over a frame: `where(OR of all routes)` THEN the matched-
    * array explode. The explode alone already drops no-route rows, but
    * only AFTER the scan — Catalyst cannot derive a scan predicate from a
    * lambda inside `filter(array(...))`. Stating the disjunction
    * explicitly makes it a pushable filter (parquet row-group pruning /
    * partition pruning on the sink layout), so rows no route wants never
    * leave the scan. Semantically redundant, physically load-bearing.
    */
  def routeFanout(df: org.apache.spark.sql.DataFrame,
                  routes: Seq[(String, Column)],
                  routeCol: String = "route"): org.apache.spark.sql.DataFrame =
    df.where(or(routes.map(_._2): _*))
      .withColumn(routeCol, explode(matchedRoutes(routes)))
}
