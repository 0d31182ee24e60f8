package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-static enrichment: a streaming event feed joined against a
  * static dimension (the streaming analog of the validator's broadcast
  * dim join) — the static side re-resolves per micro-batch, no state. */
class StreamStaticJoinSpec extends SparkSpec {
  import spark.implicits._

  test("streaming events enrich against a static dimension, stateless") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", 1.0), ("purchase", 10.0), ("view", 0.1))
      .toDF("event_type", "weight")
    val stream = MemoryStream[(Long, String, Timestamp)]
    val t = Timestamp.valueOf("2026-01-01 10:00:00")
    val enriched = stream.toDF().toDF("event_id", "event_type", "ts")
      .join(broadcast(dim), Seq("event_type"), "left")
      .select(col("event_id"), col("event_type"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
    val q = enriched.writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      stream.addData((1L, "click", t), (2L, "purchase", t), (3L, "error", t))
      q.processAllAvailable()
      stream.addData((4L, "view", t))
      q.processAllAvailable()
      val rows = spark.table("enriched")
        .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      // matched rows carry dim weights; unmatched default — across batches
      assert(rows == Map(1L -> 1.0, 2L -> 10.0, 3L -> 0.0, 4L -> 0.1))
      // stateless: no state store rows for a stream-static join
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }
}
