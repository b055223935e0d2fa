package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{Functions => F}
import graft.operators.{Manifests, TextAnalysis}

/** The streaming "stop at N tokens" valve — the admission stage a crawl
  * ingest (CrawlIngest → gates → dedup stores) runs in `foreachBatch` to
  * cut a continuously arriving corpus at a token budget, the way
  * [[TextAnalysis.tokenBudgetSample]] cuts a batch one. Micro-batches
  * are admitted WHOLE while they fit; the batch that crosses the budget
  * is cut with the batch-level content-keyed sampler (same selector
  * arithmetic, so the crossing batch's survivors are the deterministic
  * within-batch prefix); every later batch admits nothing.
  *
  * The running total persists Manifests-style (the [[graft.operators
  * .SeenFilterStore]] discipline): one tiny JSON state
  * `(batch_id, total_before, total_after, budget)` written by atomic
  * temp-and-rename, flipped LAST. Replays are idempotent by the
  * high-water mark: a `foreachBatch` RETRY of batch N re-reads
  * `total_before` (the total as of BEFORE N), recomputes the identical
  * deterministic cut, and does NOT advance the state — so a crash on
  * either side of the flip can never count a batch's tokens twice nor
  * emit a different slice on the re-run. A batch id BELOW the high-water
  * mark is a checkpoint/state mismatch and fails loudly.
  *
  * Scale shape per batch: one token-sum aggregate over the micro-batch;
  * the cut (crossing batch only) is [[TextAnalysis.tokenBudgetSample]]'s
  * one exchange with per-bucket-bounded sorts; state IO is two tiny
  * manifest ops. Nothing is corpus-sized on the driver.
  */
object StreamingTokenBudget {

  val StateName = "_TOKEN_BUDGET"

  /** Persisted admission state: totals are cumulative ADMITTED tokens —
    * `totalBefore` as of before `batchId`, `totalAfter` as of after it.
    */
  final case class State(batchId: Long, totalBefore: Long,
                         totalAfter: Long, budget: Long)

  private def render(s: State): String =
    s"""{"batch_id": ${s.batchId}, "total_before": ${s.totalBefore}, """ +
      s""""total_after": ${s.totalAfter}, "budget": ${s.budget}}"""

  def readState(spark: SparkSession, root: String): Option[State] =
    Manifests.read(spark, s"$root/$StateName").map { j =>
      State(Manifests.numField(j, "batch_id").toLong,
        Manifests.numField(j, "total_before").toLong,
        Manifests.numField(j, "total_after").toLong,
        Manifests.numField(j, "budget").toLong)
    }

  /** Tokens still admissible under `budget` given the persisted state. */
  def remaining(spark: SparkSession, root: String, budget: Long): Long =
    math.max(0L, budget - readState(spark, root).map(_.totalAfter).getOrElse(0L))

  /** Has the admitted total reached the recorded budget? */
  def exhausted(spark: SparkSession, root: String): Boolean =
    readState(spark, root).exists(s => s.totalAfter >= s.budget)

  private def tokenSum(df: DataFrame, textCol: String): Long =
    Option(df.agg(sum(F.tokenCount(col(textCol)).cast(LongType))).first().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)

  /** Compute batch `batchId`'s admitted slice against the persisted
    * total WITHOUT flipping the state: returns (admitted — materialized,
    * so it stays valid across the flip —, the post-batch state, and
    * whether this was a replay of the recorded batch).
    */
  private def admitPrepared(batch: DataFrame, batchId: Long, root: String,
                            budgetTokens: Long, idCol: String,
                            textCol: String, seed: Long,
                            numBuckets: Int): (DataFrame, State, Boolean) = {
    require(budgetTokens > 0, s"budgetTokens must be positive, got $budgetTokens")
    val spark = batch.sparkSession
    val st = readState(spark, root)
    st.foreach(s => require(s.budget == budgetTokens,
      s"budget changed mid-stream: state carries ${s.budget}, caller " +
        s"passed $budgetTokens — a silent budget swap would make the " +
        "already-admitted prefix unaccountable; use a fresh state root"))
    val (before, isReplay) = st match {
      case Some(s) if batchId == s.batchId => (s.totalBefore, true)
      case Some(s) if batchId < s.batchId =>
        throw new IllegalStateException(
          s"batch $batchId is older than the recorded high-water mark " +
            s"${s.batchId} under $root — this state dir belongs to a " +
            "different query/checkpoint")
      case Some(s) => (s.totalAfter, false)
      case None => (0L, false)
    }
    val rem = budgetTokens - before
    val (admitted, admittedToks) =
      if (rem <= 0L) (batch.limit(0).localCheckpoint(true), 0L)
      else {
        val total = tokenSum(batch, textCol)
        if (total <= rem) (batch, total)
        else {
          // the crossing batch: the deterministic content-keyed prefix —
          // materialized NOW so the emitted slice is fixed before any
          // state flip (and identical on a replay, which recomputes it
          // from the same total_before)
          val cut = TextAnalysis.tokenBudgetSample(batch, idCol, rem,
            seed, numBuckets, textCol).drop("cum_tokens").localCheckpoint(true)
          (cut, tokenSum(cut, textCol))
        }
      }
    (admitted, State(batchId, before, before + admittedToks, budgetTokens),
      isReplay)
  }

  /** The batch-equivalent admission step: admit-or-cut `batch` against
    * the persisted total, flip the state (first run only — a replay
    * re-emits the identical slice and leaves the state untouched), and
    * return the admitted slice. This is exactly the `foreachBatch` body
    * of [[admitStream]], exposed so batch harnesses and oracles can
    * drive the same arithmetic.
    */
  def admitCommitted(batch: DataFrame, batchId: Long, root: String,
                     budgetTokens: Long, idCol: String,
                     textCol: String = "text", seed: Long = 1L,
                     numBuckets: Int = 1024): DataFrame = {
    val (admitted, newState, isReplay) = admitPrepared(batch, batchId, root,
      budgetTokens, idCol, textCol, seed, numBuckets)
    if (!isReplay)
      Manifests.writeAtomic(batch.sparkSession, s"$root/$StateName",
        render(newState))
    admitted
  }

  // ------------------------------------------- per-stratum (mixture) flavor

  val MixStateName = "_TOKEN_BUDGET_MIX"

  /** Per-stratum admission state — the streaming counterpart of
    * [[TextAnalysis.tokenBudgetMix]]'s mixture-in-tokens spec ("2 B of
    * code, 500 M of forums", admitted LIVE). Totals map budgeted strata
    * to cumulative admitted tokens; unbudgeted (and NULL) strata pass
    * whole and are not tracked.
    */
  final case class MixState(batchId: Long, before: Map[String, Long],
                            after: Map[String, Long], budgets: Map[String, Long])

  private def renderMap(m: Map[String, Long]): String =
    m.toSeq.sorted.map { case (g, v) => s"$g:$v" }.mkString(",")

  private def parseMap(s: String): Map[String, Long] =
    if (s.isEmpty) Map.empty
    else s.split(",").map { kv =>
      val i = kv.lastIndexOf(':')
      kv.substring(0, i) -> kv.substring(i + 1).toLong
    }.toMap

  private def renderMix(s: MixState): String =
    s"""{"batch_id": ${s.batchId}, "mix_before": "${renderMap(s.before)}", """ +
      s""""mix_after": "${renderMap(s.after)}", "mix_budgets": "${renderMap(s.budgets)}"}"""

  def readMixState(spark: SparkSession, root: String): Option[MixState] =
    Manifests.read(spark, s"$root/$MixStateName").map { j =>
      MixState(Manifests.numField(j, "batch_id").toLong,
        parseMap(Manifests.strField(j, "mix_before")),
        parseMap(Manifests.strField(j, "mix_after")),
        parseMap(Manifests.strField(j, "mix_budgets")))
    }

  /** Budgeted strata whose admitted total has reached their budget. */
  def exhaustedStrata(spark: SparkSession, root: String): Set[String] =
    readMixState(spark, root).map(s =>
      s.budgets.keySet.filter(g =>
        s.after.getOrElse(g, 0L) >= s.budgets(g))).getOrElse(Set.empty)

  private def admitPreparedMix(batch: DataFrame, batchId: Long, root: String,
                               budgets: Map[String, Long], idCol: String,
                               strataCol: String, textCol: String,
                               seed: Long, numBuckets: Int)
      : (DataFrame, MixState, Boolean) = {
    require(budgets.nonEmpty && budgets.values.forall(_ > 0),
      s"budgets must be non-empty and positive, got $budgets")
    budgets.keys.foreach(g => require(
      !g.contains(":") && !g.contains(",") && !g.contains("\"") &&
        !g.contains("\\") && g.forall(_ >= ' '),
      s"stratum name '$g' cannot carry ':', ',', '\"', '\\' or control " +
        "characters (the state encoding's delimiters and JSON " +
        "metacharacters); rename the stratum"))
    val spark = batch.sparkSession
    val st = readMixState(spark, root)
    st.foreach(s => require(s.budgets == budgets,
      s"budgets changed mid-stream: state carries ${s.budgets}, caller " +
        s"passed $budgets — use a fresh state root"))
    val (before, isReplay) = st match {
      case Some(s) if batchId == s.batchId => (s.before, true)
      case Some(s) if batchId < s.batchId =>
        throw new IllegalStateException(
          s"batch $batchId is older than the recorded high-water mark " +
            s"${s.batchId} under $root — this state dir belongs to a " +
            "different query/checkpoint")
      case Some(s) => (s.after, false)
      case None => (Map.empty[String, Long], false)
    }
    val remaining = budgets.map { case (g, b) =>
      g -> (b - before.getOrElse(g, 0L)) }
    val exhausted = remaining.filter(_._2 <= 0L).keys.toSeq
    val open = remaining.filter(_._2 > 0L)
    val pruned =
      if (exhausted.isEmpty) batch
      else batch.where(col(strataCol).isNull ||
        !col(strataCol).isin(exhausted: _*))
    val admitted = (if (open.isEmpty) pruned
      else TextAnalysis.tokenBudgetMix(pruned, idCol, strataCol, open,
        seed, numBuckets, textCol).drop("cum_tokens"))
      .localCheckpoint(true)
    // bounded collect: one (stratum, token sum) row per budgeted stratum
    val admittedToks = admitted
      .where(col(strataCol).isin(budgets.keys.toSeq: _*))
      .groupBy(col(strataCol).as("_g"))
      .agg(sum(F.tokenCount(col(textCol)).cast(LongType)).as("_t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val after = budgets.keys.map { g =>
      g -> (before.getOrElse(g, 0L) + admittedToks.getOrElse(g, 0L)) }.toMap
    (admitted, MixState(batchId, before, after, budgets), isReplay)
  }

  /** The per-stratum batch-equivalent admission step — [[admitCommitted]]
    * with a budget per stratum: strata admit independently (whole while
    * they fit, content-keyed prefix on their crossing batch, nothing
    * after), unbudgeted and NULL strata always pass whole. Same
    * flip-last + replay-from-`before` discipline as the global flavor.
    */
  def admitCommittedMix(batch: DataFrame, batchId: Long, root: String,
                        budgets: Map[String, Long], idCol: String,
                        strataCol: String, textCol: String = "text",
                        seed: Long = 1L, numBuckets: Int = 1024): DataFrame = {
    val (admitted, newState, isReplay) = admitPreparedMix(batch, batchId,
      root, budgets, idCol, strataCol, textCol, seed, numBuckets)
    if (!isReplay)
      Manifests.writeAtomic(batch.sparkSession, s"$root/$MixStateName",
        renderMix(newState))
    admitted
  }

  /** Streaming per-stratum admission — [[admitStream]] with a budget per
    * stratum (see [[admitCommittedMix]]).
    */
  def admitStreamMix(batches: DataFrame, root: String,
                     budgets: Map[String, Long], idCol: String,
                     strataCol: String, textCol: String = "text",
                     seed: Long = 1L, numBuckets: Int = 1024)
                    (route: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    batches.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (admitted, newState, isReplay) = admitPreparedMix(batch, batchId,
        root, budgets, idCol, strataCol, textCol, seed, numBuckets)
      route(admitted)
      if (!isReplay)
        Manifests.writeAtomic(batch.sparkSession, s"$root/$MixStateName",
          renderMix(newState))
    }

  /** Streaming admission: each micro-batch's admitted slice is handed to
    * `route`; the state flips LAST (after the route), so a crash at any
    * point replays the batch into the identical slice — before the flip
    * because the total never moved, after it because the replay path
    * recomputes from the recorded `total_before`. Stop the query once
    * [[exhausted]] turns true (checked from the caller or a listener);
    * post-budget batches route an empty slice.
    */
  def admitStream(batches: DataFrame, root: String, budgetTokens: Long,
                  idCol: String, textCol: String = "text", seed: Long = 1L,
                  numBuckets: Int = 1024)
                 (route: DataFrame => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    batches.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      val (admitted, newState, isReplay) = admitPrepared(batch, batchId,
        root, budgetTokens, idCol, textCol, seed, numBuckets)
      route(admitted)
      if (!isReplay)
        Manifests.writeAtomic(batch.sparkSession, s"$root/$StateName",
          render(newState))
    }
}
