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

  test("file-source stream: mapping CSVs landing in a dir produce windowed parquet") {
    val inDir = java.nio.file.Files.createTempDirectory("graft_stream_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_stream_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_ck").toString
    // two files "landing" with headers matching mappingStream's schema
    val header = "doc_id,filename,format,word_count_target,sit_ids,labels," +
      "instances,confidences,tcs,created_at,text"
    def row(id: Long, ts: String, text: String) =
      s"$id,d$id,email,100,SIT_CCN,TP,1,Low,Finance,$ts,$text"
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(inDir, "batch1.csv"),
      header + "\n" + row(1, "2026-01-01T10:00:00Z", "card 5133 2181 9600 1338") +
        "\n" + row(2, "2026-01-01T10:01:00Z", "nothing here"))
    val q = StreamingValidator.run(spark, inDir, outDir, ckpt,
      graft.pipeline.PipelineConfig.default.sitDim(spark).toDF())
    try {
      q.processAllAvailable()
      // append mode: the first window is still open (no later watermark), so
      // land a second file far in the future to close it
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(inDir, "batch2.csv"),
        header + "\n" + row(3, "2026-01-01T12:00:00Z", "x"))
      q.processAllAvailable()
      val out = spark.read.parquet(outDir)
      val rows = out.selectExpr("sit_id", "docs", "tp_docs").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(rows.get("SIT_CCN").exists(v => v._1 == 2 && v._2 == 1))
    } finally q.stop()
  }
}
