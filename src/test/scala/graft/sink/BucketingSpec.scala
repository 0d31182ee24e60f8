package graft.sink

import graft.SparkSpec
import graft.pipeline.{ContentGen, MetaGen, PipelineConfig}
import org.apache.spark.sql.functions._

/** §4.3 — bucketing for co-located joins: a corpus and its mapping bucketed
  * on the same key join with NO exchange on either side (the 100 TB plan:
  * pre-bucket the corpus once, every downstream per-doc join is narrow). */
class BucketingSpec extends SparkSpec {

  test("bucketed corpus ⋈ bucketed mapping has no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    try {
      val cfg = PipelineConfig.scaled(perSit = 1)
      val corpus = ContentGen.corpus(MetaGen.docs(spark, cfg)).cache()
      corpus.select("doc_id", "filename", "text")
        .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("corpus_bucketed")
      corpus.select("doc_id", "format", "word_count_target")
        .write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id")
        .saveAsTable("mapping_bucketed")
      val joined = spark.table("corpus_bucketed")
        .join(spark.table("mapping_bucketed"), "doc_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), "bucketed join must not shuffle:\n" +
        plan.take(2000))
      assert(joined.count() == corpus.count())
      // contrast: the same join over plain parquet shuffles both sides
      val dir = java.nio.file.Files.createTempDirectory("graft_plain").toString
      corpus.select("doc_id", "filename", "text").write.mode("overwrite")
        .parquet(dir + "/c")
      corpus.select("doc_id", "format").write.mode("overwrite")
        .parquet(dir + "/m")
      val plain = spark.read.parquet(dir + "/c")
        .join(spark.read.parquet(dir + "/m"), "doc_id")
      assert(plain.queryExecution.executedPlan.toString.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS corpus_bucketed")
      spark.sql("DROP TABLE IF EXISTS mapping_bucketed")
    }
  }
}
