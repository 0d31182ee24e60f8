package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import graft.ops.Attribution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join vs the batch attribution join: the pair
  * stream fed through the SHARED creditRollup must equal the batch
  * byChannel result over the same events, and the join state must not
  * grow without bound (watermark eviction). */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val base = 1700000000000L
  private def ts(m: Int) = new Timestamp(base + m * 60000L)

  case class Conv(conv_id: Long, user_id: Long, conv_ts: Timestamp,
                  cents: Long)
  case class Touch(user_id: Long, channel: String, touch_ts: Timestamp,
                   touch_id: Long)

  test("pairs + shared rollup == batch byChannel; cross-batch late " +
    "touches inside the watermark still pair") {
    implicit val sqlCtx = spark.sqlContext
    val convS = MemoryStream[Conv]
    val touchS = MemoryStream[Touch]
    val pairs = StreamingAttribution.touchPairs(
      convS.toDF(), touchS.toDF(),
      delay = "30 minutes", lookback = "10 minutes")
    val q = pairs.writeStream.format("memory").queryName("attr_pairs")
      .outputMode("append").start()
    // user 1: touches at 0,4 then purchase at 8 ($2.00); the second
    // touch arrives a BATCH AFTER the conversion (late but in-watermark).
    // user 2: touch at 3, purchase at 20 — outside the 10 min lookback.
    try {
      convS.addData(Conv(100, 1, ts(8), 200), Conv(200, 2, ts(20), 500))
      touchS.addData(Touch(1, "click", ts(0), 10), Touch(2, "view", ts(3), 20))
      q.processAllAvailable()
      touchS.addData(Touch(1, "view", ts(4), 11))
      q.processAllAvailable()

      val got = Attribution.creditRollup(spark.table("attr_pairs"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      // batch twin over the identical events, ts as epoch nanos
      val events = Seq(
        (10L, 1L, 0, "click", 0.0), (11L, 1L, 4, "view", 0.0),
        (100L, 1L, 8, "purchase", 2.00),
        (20L, 2L, 3, "view", 0.0), (200L, 2L, 20, "purchase", 5.00))
        .map { case (id, u, m, ty, v) =>
          (id, u, (base + m * 60000L) * 1000000L, ty, v)
        }.toDF("event_id", "user_id", "ts", "event_type", "value")
      val batch = Attribution.byChannel(events, "event_id", "user_id",
        "ts", "event_type", "value", "purchase", Seq("click", "view"),
        lookbackNanos = 10L * 60 * 1000000000L)
        .as[(String, Long, Long, Long, Long)].collect().toSet
      assert(got === batch)
      // hand check: only user 1 converts with k=2 (click first, view last)
      assert(got === Set(
        ("click", 1L, 200L, 0L, 1000000L),
        ("view", 1L, 0L, 200L, 1000000L)))
    } finally q.stop()
  }

  test("watermark evicts join state (bounded by lookback, not stream age)") {
    implicit val sqlCtx = spark.sqlContext
    val convS = MemoryStream[Conv]
    val touchS = MemoryStream[Touch]
    val pairs = StreamingAttribution.touchPairs(
      convS.toDF(), touchS.toDF(),
      delay = "1 minutes", lookback = "2 minutes")
    val q = pairs.writeStream.format("memory").queryName("attr_evict")
      .outputMode("append").start()
    try {
      touchS.addData((0 until 20).map(i =>
        Touch(1, "click", ts(i), 1000L + i)): _*)
      convS.addData(Conv(1, 1, ts(20), 100))
      q.processAllAvailable()
      // push both watermarks far past everything buffered
      touchS.addData(Touch(9, "click", ts(500), 9999))
      convS.addData(Conv(9, 9, ts(500), 1))
      q.processAllAvailable()
      touchS.addData(Touch(9, "view", ts(501), 10000))
      q.processAllAvailable()
      val state = q.lastProgress.stateOperators
      assert(state.nonEmpty)
      val rows = state.map(_.numRowsTotal).sum
      assert(rows <= 4,
        s"join state should have evicted the aged-out touches, found $rows")
    } finally q.stop()
  }
}
