package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event sessionization — gap-based session assignment over an event-time
  * ordered stream per key (the batch analog of a session window; the
  * streaming variant is `session_window` in Structured Streaming).
  *
  * One shuffle on the user key; the lag/cumulative-sum windows reuse that
  * partitioning. Ordering includes the event id as a tie-break so session
  * boundaries are deterministic under timestamp ties (oracle requirement).
  */
object Sessions {

  /** Assign `session_id` (0-based per user) with a `gap` split threshold.
    * `tsCol` must be monotonically comparable (here: raw epoch nanos). */
  def sessionize(df: DataFrame, userCol: String, idCol: String,
                 tsCol: String, gapNanos: Long): DataFrame = {
    val order = Window.partitionBy(userCol).orderBy(col(tsCol), col(idCol))
    val newSession = when(
      lag(col(tsCol), 1).over(order).isNull ||
        col(tsCol) - lag(col(tsCol), 1).over(order) > gapNanos, 1L)
      .otherwise(0L)
    df.withColumn("session_id",
      sum(newSession).over(order.rowsBetween(Window.unboundedPreceding, 0)))
  }

  /** Per-session rollup: event count + second-truncated start/end. */
  def sessionStats(df: DataFrame, userCol: String, idCol: String,
                   tsCol: String, gapNanos: Long): DataFrame =
    sessionize(df, userCol, idCol, tsCol, gapNanos)
      .groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        // DIV: exact integer division — a double `/` would round 1e18-scale
        // nanos (> 2^53) and could land on the wrong second vs the oracle
        expr(s"timestamp_seconds(min($tsCol) DIV 1000000000)").as("session_start"),
        expr(s"timestamp_seconds(max($tsCol) DIV 1000000000)").as("session_end"))
      .orderBy(col(userCol), col("session_id"))

  /** Ordered N-stage funnel, per user: `t{i}` = the earliest `stages(i)`
    * event at/after the user's earliest stage-(i-1) qualifier (null once
    * a stage is never reached — later stages stay null too).
    *
    * Shape: cascading running-window minimums — stage i's qualifier
    * condition reads the running min of stage i-1's qualifiers on the SAME
    * (user, ts, order) window, so all N stages and the final per-user
    * aggregate share ONE shuffle. The per-stage self-join alternative
    * shuffles the event table once per stage. `orderCol` breaks timestamp
    * ties deterministically. */
  def funnelUserTimes(df: DataFrame, userCol: String, typeCol: String,
                      tsCol: String, orderCol: String,
                      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "stages must be non-empty")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(orderCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    var cur = df
    stages.zipWithIndex.foreach { case (st, i) =>
      val cond =
        if (i == 0) col(typeCol) === st
        else col(typeCol) === st && col(s"__v${i - 1}").isNotNull &&
          col(tsCol) >= col(s"__v${i - 1}")
      cur = cur.withColumn(s"__c$i", when(cond, col(tsCol)))
      if (i < stages.length - 1)
        cur = cur.withColumn(s"__v$i", min(col(s"__c$i")).over(w))
    }
    val aggs = stages.indices.map(i => min(col(s"__c$i")).as(s"t$i"))
    cur.groupBy(col(userCol)).agg(aggs.head, aggs.tail: _*)
  }
}
