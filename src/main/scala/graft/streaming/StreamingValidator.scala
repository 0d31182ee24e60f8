package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, Trigger}
import graft.expr.{Placeholder, RegexMatches}
import graft.pipeline.Validator

/** Structured Streaming extension (SURVEY.md §2.9 / §7.3 step 7).
  *
  * The reference is strictly batch — four run-to-completion processes with
  * file handoff (`README.md:63-74`). A production corpus, however, arrives
  * continuously; this module re-expresses stage 4 as an incremental query:
  * the same narrow verdict pipeline (P8 explode → broadcast dim join → P2
  * regex scan → P5 gate), then an event-time tumbling window with a
  * watermark so state is bounded and late documents are handled. The
  * stateful aggregation is exactly the batch `report` keyed additionally by
  * window — results converge to the batch rollup when the stream drains.
  */
object StreamingValidator {

  /** File-source stream of mapping CSVs (the reference's inter-stage
    * exchange format, read incrementally as files land). */
  def mappingStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .option("header", "true")
      .schema("doc_id LONG, filename STRING, format STRING, " +
        "word_count_target INT, sit_ids STRING, labels STRING, " +
        "instances STRING, confidences STRING, tcs STRING, " +
        "created_at TIMESTAMP, text STRING")
      .csv(dir)

  /** Incremental per-SIT verdict counts over event-time tumbling windows.
    *
    * `mapping` must be a *streaming* DataFrame carrying `created_at`
    * (event time) and `text` (the rendered document — carried inline so the
    * stream stays self-contained; a corpus join against a static DataFrame
    * would also work and stays a broadcast join).
    */
  def windowedReport(mapping: DataFrame, sitDim: DataFrame,
                     windowLength: String = "10 minutes",
                     watermarkDelay: String = "5 minutes"): DataFrame = {
    // carry event-time + text through the explode — a stream-stream
    // self-join is unsupported, and unnecessary
    val assignments = Validator.explodeAssignments(
      mapping.select("doc_id", "created_at", "text",
        "sit_ids", "labels", "instances"),
      carry = Seq("created_at", "text"))
    val joined = assignments
      .join(broadcast(sitDim.select(col("id").as("sit_id"), col("regex"))),
        Seq("sit_id"), "left")
    val matches = when(
      col("regex").isNotNull && col("regex") =!= "" && col("text").isNotNull,
      graft.expr.RegexMatchesExpr.regexMatchesNative(col("text"), col("regex")))
      .otherwise(array().cast("array<struct<value:string,start:int,excerpt:string>>"))
    joined
      .withColumn("found_real",
        size(filter(matches, m => !Placeholder.isPlaceholderCol(m.getField("value")))))
      .withColumn("tp_ok",
        col("label") === "TP" && col("found_real") >= greatest(lit(1), col("instances")))
      .withColumn("fp_flagged", col("label") =!= "TP" && col("found_real") > 0)
      .withWatermark("created_at", watermarkDelay)
      .groupBy(window(col("created_at"), windowLength), col("sit_id"))
      .agg(
        count(lit(1)).as("docs"),
        count_if(col("tp_ok")).as("tp_docs"),
        count_if(col("fp_flagged")).as("fp_flagged"),
        sum("instances").as("total_instances"))
  }

  /** Convenience runner: stream mapping CSVs from `inDir`, write windowed
    * report parquet to `outDir` (append mode — watermark closes windows). */
  def run(spark: SparkSession, inDir: String, outDir: String,
          checkpoint: String, sitDim: DataFrame): StreamingQuery =
    windowedReport(mappingStream(spark, inDir), sitDim)
      .writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.ProcessingTime("10 seconds"))
      .format("parquet")
      .option("path", outDir)
      .start()
}
