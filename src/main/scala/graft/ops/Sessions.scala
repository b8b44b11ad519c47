package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization — the relational twin of the streaming
  * `session_window` (q38): split each user's event sequence into
  * sessions wherever the inactivity gap exceeds `gapSeconds`, without
  * any streaming state machinery. The warehouse surface the reference
  * delegates (SURVEY.md §2.2) serves exactly this query class over
  * behavioral tables.
  *
  * Shape at 100 TB: ONE shuffle, on `user_id`, feeds everything —
  * the lag window, the running-sum session index, and the per-session
  * aggregate all share the same partitioning. `HashPartitioning(user)`
  * satisfies `ClusteredDistribution(user, session_idx)` (a subset of
  * the grouping keys co-locates every group), so Catalyst plans the
  * final aggregate WITHOUT a second exchange — EXPLAINS.md q61 pins
  * one Exchange in the whole plan. Per-user event counts bound window
  * buffer memory; there is no global sort and no driver-side state.
  */
object Sessions {

  /** Tag each event with its session index (1-based per user).
    * Session boundary: first event, or gap from the previous event
    * strictly greater than `gapSeconds` (second granularity — both
    * engines floor sub-second parts identically via epoch seconds). */
  def sessionize(events: DataFrame, gapSeconds: Long,
      userCol: String = "user_id", tsCol: String = "ts",
      tieCol: String = "event_id"): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(tsCol, tieCol)
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(
      prev.isNull ||
        unix_timestamp(col(tsCol)) - unix_timestamp(prev) > gapSeconds,
      1L).otherwise(0L)
    events.withColumn("session_idx",
      sum(newSession).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session stats: bounds, size, duration, exact-decimal value
    * sum (Canon discipline so the hash matches the oracle). */
  def sessionStats(events: DataFrame, gapSeconds: Long): DataFrame = {
    val s = sessionize(events, gapSeconds)
    s.groupBy(col("user_id"), col("session_idx"))
      .agg(
        graft.Canon.tsStr(min(col("ts"))).as("session_start"),
        graft.Canon.tsStr(max(col("ts"))).as("session_end"),
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_s"),
        graft.Canon.dsum(col("value")).as("total_value"))
  }
}
