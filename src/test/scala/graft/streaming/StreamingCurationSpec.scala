package graft.streaming

import graft.SparkSpec
import graft.ops.{Curation, TextAnalysis}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The narrow curation kernels (normalize, chunk, redact) are pure map
  * stages, so the SAME operators run unchanged in a streaming query —
  * this pins that property: per-micro-batch output must equal the batch
  * run over the union of all batches. */
class StreamingCurationSpec extends SparkSpec {
  import spark.implicits._

  test("normalize + chunk run unchanged on a stream; match the batch run") {
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String)]
    val streamed = TextAnalysis.chunkTokens(
      stream.toDF().toDF("doc_id", "text")
        .withColumn("text", Curation.normalizeTextCol(col("text"))),
      "doc_id", "text", chunkSize = 4, stride = 3)
    val q = streamed.writeStream.format("memory").queryName("chunks")
      .outputMode("append").start()
    val data = Seq(
      (1L, "Café T0 t1 T2, t3; t4 t5 T6 t7—t8 t9"),
      (2L, "Ñoño b"),
      (3L, ""))
    try {
      stream.addData(data.take(2))
      q.processAllAvailable()
      stream.addData(data.drop(2))
      q.processAllAvailable()
      val got = spark.table("chunks").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
        .sortBy(t => (t._1, t._2))
      val batch = TextAnalysis.chunkTokens(
        data.toDF("doc_id", "text")
          .withColumn("text", Curation.normalizeTextCol(col("text"))),
        "doc_id", "text", chunkSize = 4, stride = 3)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getString(4)))
        .sortBy(t => (t._1, t._2))
      assert(got.toSeq == batch.toSeq)
      assert(got.nonEmpty && got.head._4.length == 32) // md5 fingerprints
      // stateless map stages: no state store rows at all
      assert(q.lastProgress == null ||
        q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }
}
