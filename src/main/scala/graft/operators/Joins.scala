package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-safe join shapes (SURVEY §7's scale toolkit).
  *
  * Spark's built-in answers come first: broadcast the small side
  * (`broadcast(dim)` — used throughout the enrichment and star-join
  * operators) or let AQE's skew-join split oversized sort-merge
  * partitions. Explicit salting is the remaining case: the non-skewed
  * side is too large to broadcast AND one key dominates so badly that a
  * single task would own it.
  */
object Joins {

  /** Salted equi-join: the skewed side's hot keys are split `salt` ways
    * (row-dependent salt), the other side is replicated once per salt
    * value, and the join key becomes (keys…, salt) — a key owning X% of
    * the rows now spreads over `salt` tasks instead of one.
    *
    * Cost: `other` is scanned/shuffled `salt`× — size the factor to the
    * skew, not bigger. Supported joinTypes: inner / left / left_outer /
    * left_semi / left_anti (right/full-outer would emit unmatched `other`
    * rows once per salt — rejected).
    *
    * The salt value never affects the result (every salt matches a full
    * copy of `other`), so task retries re-salting rows differently are
    * harmless.
    */
  def saltedEquiJoin(skewed: DataFrame, other: DataFrame, keys: Seq[String],
                     salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val allowed = Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")
    require(allowed.contains(joinType.toLowerCase(java.util.Locale.ROOT)),
      s"joinType $joinType would duplicate unmatched right rows per salt")
    val saltedL = skewed.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    val saltedR = other.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedL.join(saltedR, keys :+ "_salt", joinType).drop("_salt")
  }
}
