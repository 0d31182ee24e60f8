package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, Dataset, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming substring-level (span) dedup — the micro-batch driver of
  * [[graft.ops.Dedup.incrementalRepeatedSpans]], closing the streaming
  * suite's counterpart of the lane q100 gates in batch: each arriving
  * micro-batch probes the PERSISTED occurrence table (base history never
  * re-shingles, never crosses the wire), emits its repeated spans, then
  * advances the table with [[graft.ops.Dedup.mergeOccurrenceTables]].
  *
  * Why `foreachBatch` and not `mapGroupsWithState`: the lane's state is
  * the per-shingle occurrence table — DISTINCT-SHINGLE-sized, i.e.
  * corpus-proportional. Corpus-sized state belongs in a relation that
  * shuffles/persists on 8-byte keys, not in executor state-store memory
  * (contrast [[StreamingDedup]], whose per-content-hash state is bounded
  * by the watermark horizon and so fits the state store). The price is
  * micro-batch (not per-row) latency — the right trade for an operator
  * whose unit of work is a corpus-wide threshold.
  *
  * Exactly-once across failures WITHOUT sink transactions: everything is
  * keyed by Structured Streaming's monotone `batchId`, so a replayed
  * batch is idempotent —
  *  - spans land at `spansDir/batch_id=<id>` with mode OVERWRITE (a
  *    retry rewrites the same partition directory, never appends dups);
  *  - the advanced table lands at `stateDir/v=<id>` with OVERWRITE, and
  *    a batch always READS the latest version STRICTLY BELOW its own id
  *    (a retry that already half-wrote `v=k` re-reads `v=k-1`, not its
  *    own partial output).
  * StreamingSpanDedupSpec pins batch-vs-stream span equality, the
  * chained-history contract, and the replay idempotency.
  *
  * Semantics match the batch lane exactly: batch k's spans are computed
  * against base + batches 1..k (history-ordered); a span in an EARLIER
  * batch that a later batch would push over the threshold is not
  * retroactively emitted — the immutable-history contract documented on
  * [[graft.ops.Dedup.incrementalRepeatedSpans]]. A caller wanting
  * retroactive coverage runs batch `repeatedSpans` over the accumulated
  * corpus — the standard lambda split, same as [[StreamingDedup]]'s
  * horizon contract.
  *
  * Reference basis: the reference pipeline is batch-only
  * (`/root/reference` generate→validate, no incremental lane); this is a
  * Spark-native extension via Structured Streaming. */
object StreamingSpanDedup {

  /** Latest persisted occurrence-table version strictly below `batchId`
    * (None before the first batch commits). */
  private def latestStateBefore(spark: SparkSession, stateDir: String,
                                batchId: Long): Option[String] = {
    val path = new Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).toSeq.map(_.getPath)
      .filter(_.getName.startsWith("v="))
      .flatMap(p => scala.util.Try(p.getName.stripPrefix("v=").toLong)
        .toOption.map(v => (v, p.toString)))
      .filter(_._1 < batchId)
      .sortBy(-_._1)
      .headOption.map(_._2)
  }

  /** One micro-batch: emit spans for `batch` against the persisted
    * history, then persist the advanced table. Public so the spec (and a
    * backfill job) can drive it directly with explicit batch ids. */
  def processBatch(batch: DataFrame, batchId: Long, idCol: String,
                   textCol: String, stateDir: String, spansDir: String,
                   n: Int = 10, minOcc: Int = 2): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val baseOcc = latestStateBefore(spark, stateDir, batchId)
      .map(spark.read.parquet(_))
      .getOrElse(spark.emptyDataset[(Long, Long)].toDF("shingle", "occ"))
    // the micro-batch shingles twice (spans probe + table advance) — it
    // is the SMALL side by construction; persist so the source (often a
    // non-replayable foreachBatch frame) is scanned once
    val b = batch.persist()
    try {
      graft.ops.Dedup
        .incrementalRepeatedSpans(b, idCol, textCol, baseOcc, n, minOcc)
        .write.mode("overwrite").parquet(s"$spansDir/batch_id=$batchId")
      graft.ops.Dedup.mergeOccurrenceTables(baseOcc,
          graft.ops.Dedup.shingleOccurrenceTable(b, textCol, n))
        .write.mode("overwrite").parquet(s"$stateDir/v=$batchId")
    } finally b.unpersist()
  }

  /** Start the streaming query: `docs` is a streaming DataFrame carrying
    * `idCol` + `textCol`; spans accumulate under
    * `spansDir/batch_id=<k>/` (read them back with
    * `spark.read.parquet(spansDir)` — `batch_id` becomes a partition
    * column), the occurrence table advances under `stateDir/v=<k>/`. */
  def spanDedupStream(docs: DataFrame, idCol: String, textCol: String,
                      stateDir: String, spansDir: String,
                      checkpointDir: String, n: Int = 10,
                      minOcc: Int = 2): StreamingQuery = {
    val fn: (Dataset[Row], Long) => Unit = (b, id) =>
      processBatch(b, id, idCol, textCol, stateDir, spansDir, n, minOcc)
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(fn)
      .start()
  }
}
