package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental text→embedding ingest — the streaming lane of the vector
  * stack (`ops/Featurize` → `ops/Similarity.semanticDedup` is the batch
  * lane; q99 gates that composition against the DuckDB oracle).
  *
  * Two stages, both already proven stream-safe elsewhere in the repo:
  *
  *  1. **Content-hash gate** — [[StreamingDedup]]'s first-arrival-wins
  *     `dropDuplicatesWithinWatermark` on `md5(text)`: exact duplicates
  *     never reach the featurizer, and state stays O(docs per watermark
  *     horizon), not O(corpus).
  *  2. **Stateless featurizer** — [[graft.ops.Featurize.featurize]] is a
  *     narrow fused map (tokenize → md5 hashing trick → scaled-integer
  *     L2 normalize, no shuffle, no state), so the SAME operator runs
  *     unchanged on the stream (the property StreamingCurationSpec pins
  *     for the other narrow curation kernels). Embeddings are
  *     bit-identical to the batch featurizer on the same text.
  *
  * What stays batch: SemDeDup itself. Its codebook is a corpus-wide
  * deterministic stride sample and its cells must see every vector that
  * ever mapped to them — a streaming query can't retract an emitted
  * "kept" verdict when a better cell-mate arrives later, so incremental
  * semantic dedup would change the operator's semantics, not just its
  * schedule. The supported composition is the standard lambda split
  * (same contract as [[StreamingDedup]]'s horizon): featurize at ingest
  * with this stream, then run `Similarity.semanticDedup` in batch over
  * the accumulated vector table — StreamingFeaturizeSpec pins that this
  * converges to EXACTLY the batch q99 composition (same drop set, same
  * kept_by, same cosines) because the streamed vectors are bit-identical
  * and semanticDedup is deterministic on its input set.
  *
  * Reference basis: the reference pipeline is batch-only
  * (`/root/reference` generate→validate, no incremental lane); this is a
  * Spark-native extension via Structured Streaming.
  */
object StreamingFeaturize {

  /** Watermarked content-hash gate → hashed-trick featurizer.
    *
    * `docs` must be a streaming DataFrame with an event-time column
    * `tsCol`. Output (append mode): one row per FIRST arrival of each
    * distinct text within the watermark horizon —
    * (id, counts, embedding_micro, embedding, `tsCol`) with the
    * embedding columns exactly as [[graft.ops.Featurize.featurize]]
    * produces them. */
  def featurizeStream(docs: DataFrame, idCol: String, textCol: String,
                      tsCol: String, dim: Int = 64,
                      watermarkDelay: String = "10 minutes"): DataFrame = {
    val deduped = docs
      .withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("content_hash")
    // keep the event time: downstream sinks partition/bucket on it, and
    // the watermark tag must survive for chained stateful consumers
    graft.ops.Featurize.featurize(deduped, idCol, textCol, dim,
      keepCols = Seq(tsCol))
  }
}
