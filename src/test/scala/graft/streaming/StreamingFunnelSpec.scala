package graft.streaming

import graft.SparkSpec
import graft.ops.Sessions
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming funnel vs the batch funnel: stage events must appear exactly
  * when stages are reached, in order, matching the batch result over the
  * same event set; completed users leave the state store. */
class StreamingFunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("stages emit on reach, cascade within a batch, match the batch funnel") {
    implicit val sqlCtx = spark.sqlContext
    val stages = Seq("view", "click", "purchase")
    val stream = MemoryStream[StreamingFunnel.FunnelEvent]
    val out = StreamingFunnel.stageEvents(
      stream.toDS().withWatermark("ts", "10 minutes")
        .as[StreamingFunnel.FunnelEvent],
      stages)
    val q = out.writeStream.format("memory").queryName("funnel")
      .outputMode("append").start()
    val all = Seq(
      // user 1 completes across batches; user 2's click precedes its view
      // (never qualifies); user 3 cascades all three in one batch
      StreamingFunnel.FunnelEvent(1L, 10L, "view", ts(0)),
      StreamingFunnel.FunnelEvent(2L, 20L, "click", ts(0)),
      StreamingFunnel.FunnelEvent(2L, 21L, "view", ts(1)),
      StreamingFunnel.FunnelEvent(1L, 11L, "click", ts(2)),
      StreamingFunnel.FunnelEvent(3L, 30L, "view", ts(3)),
      StreamingFunnel.FunnelEvent(3L, 31L, "click", ts(3)),
      StreamingFunnel.FunnelEvent(3L, 32L, "purchase", ts(4)),
      StreamingFunnel.FunnelEvent(1L, 12L, "purchase", ts(5)))
    try {
      stream.addData(all.take(4))
      q.processAllAvailable()
      stream.addData(all.drop(4))
      q.processAllAvailable()
      val got = spark.table("funnel").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
        .sortBy(t => (t._1, t._2))
      assert(got.toSeq == Seq(
        (1L, 0, "view"), (1L, 1, "click"), (1L, 2, "purchase"),
        (2L, 0, "view"),
        (3L, 0, "view"), (3L, 1, "click"), (3L, 2, "purchase")))
      // batch equivalence: stages reached == non-null stage times in batch
      val batch = Sessions.funnelUserTimes(
        all.toDF().withColumn("ts", col("ts").cast("long")),
        "user_id", "event_type", "ts", "event_id", stages)
        .collect()
        .map(r => r.getLong(0) ->
          Seq(r.get(1), r.get(2), r.get(3)).count(_ != null)).toMap
      val streamedCounts = got.groupBy(_._1).view.mapValues(_.length).toMap
      assert(streamedCounts == batch.filter(_._2 > 0))
      // completed funnels (users 1, 3) drop their state; user 2 remains
      assert(q.lastProgress.stateOperators.exists(_.numRowsTotal == 1))
    } finally q.stop()
  }
}
