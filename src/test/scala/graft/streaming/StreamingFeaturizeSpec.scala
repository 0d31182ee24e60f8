package graft.streaming

import graft.SparkSpec
import graft.ops.{Featurize, Similarity}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Pins the streaming-ingest lane of the vector stack: the content-hash
  * gate + stateless featurizer emit BIT-IDENTICAL embeddings to the batch
  * featurizer on the first-arrival set, and the accumulated stream feeds
  * `semanticDedup` to EXACTLY the batch q99 composition's result — the
  * lambda-split contract StreamingFeaturize documents. */
class StreamingFeaturizeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // 12 docs: 2 exact-duplicate pairs across micro-batches (ids 11/12 lose
  // to ids 1/2), plus heavy-overlap paraphrase pairs for the semantic leg
  private val batch1 = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta", ts(0)),
    (2L, "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty",
      ts(1)),
    (3L, "alpha beta gamma delta epsilon zeta eta iota", ts(2)),
    (4L, "crimson tide rolls over the quiet harbor tonight", ts(3)),
    (5L, "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen thirty",
      ts(4)),
    (6L, "completely different words about spark query planning", ts(5)))
  private val batch2 = Seq(
    (11L, "alpha beta gamma delta epsilon zeta eta theta", ts(6)), // dup of 1
    (12L, "one two three four five six seven eight nine ten eleven twelve " +
      "thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty",
      ts(7)), // dup of 2
    (13L, "crimson tide rolls over the quiet harbor again", ts(8)),
    (14L, "totally unrelated sentence mentioning nothing shared", ts(9)))
  private val winners = (batch1 ++ batch2.drop(2)).map(_._1) // 11/12 gated

  private def runStream(): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, java.sql.Timestamp)]
    val out = StreamingFeaturize.featurizeStream(
      stream.toDF().toDF("doc_id", "text", "event_ts"),
      "doc_id", "text", "event_ts", dim = 64)
    val q = out.writeStream.format("memory").queryName("feats")
      .outputMode("append").start()
    try {
      stream.addData(batch1)
      q.processAllAvailable()
      stream.addData(batch2)
      q.processAllAvailable()
    } finally q.stop()
    spark.table("feats")
  }

  test("stream gate keeps first arrivals; embeddings bit-identical to the " +
    "batch featurizer") {
    val got = runStream()
    assert(got.columns.toSeq ==
      Seq("id", "counts", "event_ts", "embedding_micro", "embedding"))
    val gotRows = got.select("id", "embedding_micro").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(gotRows.map(_._1).toSeq == winners.sorted,
      "gate must drop exactly the later exact-duplicate arrivals")
    val batchRows = Featurize.featurize(
        (batch1 ++ batch2).toDF("doc_id", "text", "event_ts")
          .filter(col("doc_id").isin(winners: _*)),
        "doc_id", "text", dim = 64)
      .select("id", "embedding_micro").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).sortBy(_._1)
    assert(gotRows.toSeq == batchRows.toSeq,
      "streamed embedding_micro must be bit-identical to batch featurize")
  }

  test("accumulated stream -> semanticDedup converges to the batch q99 " +
    "composition") {
    val streamedVecs = runStream()
      .select(col("id"), col("embedding"))
    val streamed = Similarity.semanticDedup(streamedVecs, threshold = 0.9,
        centroidStride = 5, idCol = "id", vecCol = "embedding")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    // batch q99 composition over the same corpus: exact-dedup first
    // arrivals -> featurize -> semanticDedup (same params)
    val batchVecs = Featurize.featurize(
      (batch1 ++ batch2).toDF("doc_id", "text", "event_ts")
        .filter(col("doc_id").isin(winners: _*)),
      "doc_id", "text", dim = 64)
    val batch = Similarity.semanticDedup(
        batchVecs.select("id", "embedding"), threshold = 0.9,
        centroidStride = 5, idCol = "id", vecCol = "embedding")
      .collect().map(_.toSeq).sortBy(_.head.asInstanceOf[Long])
    assert(streamed.nonEmpty,
      "corpus is built to contain at least one semantic near-dup pair")
    assert(streamed.toSeq == batch.toSeq,
      "lambda split must converge to the batch featurize->semanticDedup")
  }
}
