package graft.streaming

import graft.SparkSpec
import graft.pipeline.PipelineConfig
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import java.sql.Timestamp

/** Streaming validator: MemoryStream drive, watermarked windowed counts
  * converge to the batch rollup. */
class StreamingValidatorSpec extends SparkSpec {
  import spark.implicits._

  case class Doc(doc_id: Long, filename: String, sit_ids: String,
                 labels: String, instances: String,
                 created_at: Timestamp, text: String)

  test("windowed report matches hand counts and windows correctly") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[Doc]
    val t0 = Timestamp.valueOf("2026-01-01 10:00:00")
    val t1 = Timestamp.valueOf("2026-01-01 10:15:00") // second window
    stream.addData(
      Doc(1, "d1", "SIT_CCN", "TP", "1", t0, "card 5133 2181 9600 1338 ok"),
      Doc(2, "d2", "SIT_CCN", "TP", "2", t0, "only 5133 2181 9600 1338 here"),
      Doc(3, "d3", "SIT_ABA", "FP", "1", t1, "routing 123456789"))

    val report = StreamingValidator.windowedReport(
      stream.toDF(), PipelineConfig.default.sitDim(spark).toDF(),
      windowLength = "10 minutes", watermarkDelay = "1 minute")

    val q = report.writeStream
      .format("memory").queryName("win_report")
      .outputMode(OutputMode.Complete) // test reads all state
      .start()
    try {
      q.processAllAvailable()
      val rows = spark.table("win_report")
        .select(col("window.start").cast("string").as("ws"), col("sit_id"),
          col("docs"), col("tp_docs"), col("fp_flagged"))
        .collect()
        .map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(rows(("2026-01-01 10:00:00", "SIT_CCN")) == ((2L, 1L, 0L)))
      assert(rows(("2026-01-01 10:10:00", "SIT_ABA")) == ((1L, 0L, 1L)))
    } finally q.stop()
  }
}
