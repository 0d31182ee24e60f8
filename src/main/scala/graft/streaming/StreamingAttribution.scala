package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming leg of multi-touch attribution: a watermarked STREAM-STREAM
  * time-interval join — conversions joined to the same user's touches in
  * the trailing lookback window, emitted as append-mode pairs.
  *
  * This is the one stateful shape the rest of the streaming suite didn't
  * cover (validator = stream-static broadcast join, dedup =
  * dropDuplicatesWithinWatermark, sessions/funnel = custom
  * mapGroupsWithState): both sides buffer in the state store, and the
  * range predicate lets Spark derive per-side eviction bounds from the
  * watermarks — a touch can be dropped once the watermark passes
  * `touch_ts + lookback` (no future conversion can reach back to it), a
  * conversion once it passes `conv_ts` (no earlier touch can still
  * arrive). State is therefore bounded by lookback × arrival rate per
  * side, independent of stream age.
  *
  * Credit math deliberately does NOT live here: the join emits pairs and
  * [[graft.ops.Attribution.creditRollup]] — the same code the batch path
  * runs — turns pairs into per-channel credit, so the two legs cannot
  * drift. (Chaining the rollup as a second stateful operator in the same
  * query would trade exactness under late data for incremental output;
  * the pair stream is the exact contract.)
  *
  * Inputs carry event-time TIMESTAMP columns (Structured Streaming
  * watermarks require TimestampType; the batch path's epoch-nanos longs
  * don't apply here).
  */
object StreamingAttribution {

  /** Join streaming `conversions` (conv_id, user_id, conv_ts, cents) to
    * streaming `touches` (user_id, channel, touch_ts, touch_id):
    * same user, `touch_ts ∈ [conv_ts − lookback, conv_ts)`.
    *
    * @param delay    watermark delay for BOTH sides, e.g. "10 minutes" —
    *                 pairs are exact for events no later than this
    * @param lookback attribution window, e.g. "7 days"
    */
  def touchPairs(conversions: DataFrame, touches: DataFrame,
                 delay: String, lookback: String): DataFrame = {
    val c = conversions.withWatermark("conv_ts", delay).alias("c")
    val t = touches.withWatermark("touch_ts", delay).alias("t")
    c.join(t,
      expr(s"""c.user_id = t.user_id
              |AND t.touch_ts < c.conv_ts
              |AND t.touch_ts >= c.conv_ts - INTERVAL $lookback""".stripMargin))
      .select(col("c.conv_id"), col("c.cents"), col("t.channel"),
        col("t.touch_ts"), col("t.touch_id"))
  }
}
