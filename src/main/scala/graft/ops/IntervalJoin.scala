package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a nested loop — the attribution-window
  * operator: for each left row, aggregate the right rows of the same key
  * whose timestamp falls in `[left.ts − window, left.ts)`.
  *
  * A naive `l JOIN r ON key AND r.ts BETWEEN ...` plans a broadcast-
  * nested-loop once the equi-key alone doesn't bound candidates (or a
  * full per-key cross product under skew). This implementation buckets
  * time by the window width: a right row at bucket `b` can only match
  * left rows in buckets `{b, b+1}`, so the right side is exploded to
  * those two buckets and the join becomes a plain hash equi-join on
  * `(key, bucket)` with the exact interval re-checked as a residual
  * filter. Cost: 2× the right rows through one shuffle, never a cross
  * product; both sides stay partition-pruned on the key.
  */
object IntervalJoin {

  /** `left` keeps all its columns and gains `countAlias` = the number of
    * right rows with the same `keyCol` and `rightTs` ∈
    * `[leftTs − window, leftTs)`. Timestamps are integral (epoch nanos —
    * the `events` table shape); `window` is in the same unit. Left rows
    * with no match count 0 (left join). `left`'s columns must identify
    * rows uniquely (they are the grouping key). */
  def countPreceding(left: DataFrame, right: DataFrame, keyCol: String,
                     leftTs: String, rightTs: String, window: Long,
                     countAlias: String = "n_in_window"): DataFrame = {
    require(window > 0, "window must be positive")
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_lts", col(leftTs).cast("long"))
      .withColumn("_b", expr(s"_lts div ${window}L"))
    val r = right.select(
        col(keyCol).as("_k"), col(rightTs).cast("long").as("_rts"))
      .withColumn("_rb", expr(s"_rts div ${window}L"))
      // a right row can only serve left buckets {its own, the next}
      .select(col("_k"), col("_rts"),
        explode(array(col("_rb"), col("_rb") + 1)).as("_b"))
    l.join(r,
        l(keyCol) === r("_k") && l("_b") === r("_b") &&
          col("_rts") >= col("_lts") - window && col("_rts") < col("_lts"),
        "left")
      .groupBy(leftCols.map(col): _*)
      .agg(count(col("_rts")).as(countAlias))
  }
}
