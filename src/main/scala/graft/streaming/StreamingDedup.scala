package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the incremental leg of the dedup suite
  * (`ops/Dedup` is the batch leg).
  *
  * A continuously-arriving corpus can't groupBy its full history; instead
  * the stream keeps first-arrival-wins state per content hash. State is
  * BOUNDED by the watermark: `dropDuplicatesWithinWatermark` drops a
  * remembered hash once the watermark passes its event time + delay, so
  * memory is O(docs per watermark horizon), not O(corpus). Duplicates
  * farther apart than the horizon are left for a batch `Dedup.exactGroups`
  * sweep — the standard lambda split for dedup at ingest.
  */
object StreamingDedup {

  /** First occurrence of each content hash within the watermark horizon.
    * `docs` must be a streaming DataFrame with an event-time column. */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermarkDelay: String = "10 minutes"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
}
