package graft.streaming

import graft.SparkSpec
import graft.ops.Dedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming span-dedup lane: micro-batch spans equal the batch
  * incremental lane (and therefore `repeatedSpans` over the accumulated
  * corpus, restricted per batch — IncrementalDedupSpec pins that
  * equality), state advances to exactly the direct occurrence table, and
  * a replayed batch is idempotent. */
class StreamingSpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val common = "alpha bravo charlie delta echo foxtrot"
  private val rep = "papa quebec romeo sierra tango"
  // batch 0 seeds `common` once and `rep` twice (rep covered immediately);
  // batch 1 re-uses `common` (covered only via batch-0 history) and seeds
  // nothing new; batch 2 re-uses `rep` (covered via batch-0 history)
  private val b0 = Seq(
    (1L, s"one two $common three"),
    (2L, s"$rep zulu $rep"))
  private val b1 = Seq(
    (11L, s"x1 x2 x3 $common"),
    (12L, "mike november oscar whiskey xray yankee"))
  private val b2 = Seq(
    (21L, s"y1 y2 $rep y3"))

  private def spanRows(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "span_id", "span_start", "span_end", "n_shingles")
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getLong(4))).toSeq

  test("stream over three micro-batches == chained batch incremental " +
    "lane; state == direct occurrence table") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_span_stream_").toString
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val q = StreamingSpanDedup.spanDedupStream(
      stream.toDF().toDF("doc_id", "text"),
      "doc_id", "text", s"$root/state", s"$root/spans",
      s"$root/ckpt", n = 5)
    try {
      for (b <- Seq(b0, b1, b2)) {
        stream.addData(b)
        q.processAllAvailable()
      }
    } finally q.stop()

    // streamed spans (all batches) == the chained batch-incremental lane
    val streamed = spark.read.parquet(s"$root/spans")
    val occ0 = Dedup.shingleOccurrenceTable(b0.toDF("doc_id", "text"),
      "text", n = 5)
    val inc0 = Dedup.incrementalRepeatedSpans(b0.toDF("doc_id", "text"),
      "doc_id", "text",
      spark.emptyDataset[(Long, Long)].toDF("shingle", "occ"), n = 5)
    val occ1 = Dedup.mergeOccurrenceTables(occ0,
      Dedup.shingleOccurrenceTable(b1.toDF("doc_id", "text"), "text", n = 5))
    val inc1 = Dedup.incrementalRepeatedSpans(b1.toDF("doc_id", "text"),
      "doc_id", "text", occ0, n = 5)
    val inc2 = Dedup.incrementalRepeatedSpans(b2.toDF("doc_id", "text"),
      "doc_id", "text", occ1, n = 5)
    assert(spanRows(streamed) ===
      spanRows(inc0.unionByName(inc1).unionByName(inc2)))
    // the engineered history crossings actually fired: doc 2's
    // within-batch repeat in batch 0, doc 11 via batch-0's common, doc 21
    // via batch-0's rep; doc 12 clean
    assert(spanRows(streamed).map(_._1).distinct.sorted === Seq(2L, 11L, 21L))
    // per-batch attribution is carried by the partition column
    assert(streamed.filter(col("batch_id") === 1L)
      .select("id").as[Long].collect().toSet === Set(11L))

    // final persisted state == the direct table over everything
    val finalState = spark.read.parquet(s"$root/state/v=2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val direct = Dedup.shingleOccurrenceTable(
        (b0 ++ b1 ++ b2).toDF("doc_id", "text"), "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(finalState === direct)

    // replay idempotency: re-running batch 1 (a foreachBatch retry)
    // rewrites the same outputs — no span duplication, identical state
    val preReplay = spanRows(streamed)
    StreamingSpanDedup.processBatch(b1.toDF("doc_id", "text"), 1L,
      "doc_id", "text", s"$root/state", s"$root/spans", n = 5)
    // the overwrite replaced part files under batch_id=1 — drop the
    // cached file listing before re-reading
    spark.catalog.refreshByPath(s"$root/spans")
    assert(spanRows(spark.read.parquet(s"$root/spans")) === preReplay)
    val replayedV1 = spark.read.parquet(s"$root/state/v=1")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val directV1 = Dedup.shingleOccurrenceTable(
        (b0 ++ b1).toDF("doc_id", "text"), "text", n = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(replayedV1 === directV1)
  }
}
