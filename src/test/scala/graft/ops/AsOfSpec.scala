package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** As-of join semantics on hand data: inclusive match, per-key isolation,
  * nulls before any right row, deterministic tie-break. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("latest at-or-before right row wins; null when none") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 150L), (3L, 10L, 250L),
      (4L, 99L, 100L)).toDF("event_id", "user_id", "ts")
    val right = Seq((11L, 10L, 100L, 1.0), (12L, 10L, 200L, 2.0),
      (13L, 77L, 50L, 9.9)).toDF("event_id", "user_id", "ts", "value")
    val out = AsOf.joinAsOf(left,
      right.select("user_id", "ts", "value", "event_id"),
      "user_id", "ts", "value", "event_id")
      .orderBy("event_id").collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(out(1L).contains(1.0)) // inclusive: ts == right ts
    assert(out(2L).contains(1.0)) // between right rows -> earlier one
    assert(out(3L).contains(2.0)) // after both -> latest
    assert(out(4L).isEmpty)       // other user, no purchases
  }
}
