package graft.pipeline

import graft.SparkSpec
import graft.sink.MetaJson
import java.nio.file.Files

/** S1 config.json load + S2/S3 nested meta.json round-trips. */
class ConfigIOSpec extends SparkSpec {

  test("config round-trips through reference-format JSON") {
    val cfg = PipelineConfig.default
    val path = Files.createTempFile("graft_cfg", ".json")
    Files.writeString(path, PipelineConfig.toJson(cfg))
    val back = PipelineConfig.fromJson(spark, path.toString)
    assert(back.randomSeed == cfg.randomSeed)
    assert(back.perSitCount == cfg.perSitCount)
    assert(back.tpRatio == cfg.tpRatio)
    assert(back.formats == cfg.formats)
    assert(back.sizeDistribution == cfg.sizeDistribution)
    assert(back.sitCountDistribution == cfg.sitCountDistribution)
    assert(back.instanceCountDistribution == cfg.instanceCountDistribution)
    assert(back.sits.size == 50)
    assert(back.sits == cfg.sits) // regexes byte-identical incl. escapes
  }

  test("meta envelope round-trips with nested sits intact") {
    val docs = MetaGen.docs(spark, PipelineConfig.scaled(1)).cache()
    val path = Files.createTempFile("graft_meta", ".json").toString
    MetaJson.writeEnvelope(docs, path)
    val back = MetaJson.readEnvelope(spark, path)
    assert(back.count() == docs.count())
    // nested array survives: same per-SIT doc counts after explode
    val covA = MetaGen.coverage(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val covB = MetaGen.coverage(back).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(covA == covB)
  }

  test("meta envelope refuses plans above the driver-collect ceiling") {
    val big = spark.range(MetaJson.EnvelopeMaxDocs + 1).toDF("doc_id")
    val e = intercept[IllegalArgumentException] {
      MetaJson.writeEnvelope(big,
        Files.createTempFile("graft_meta_big", ".json").toString)
    }
    assert(e.getMessage.contains("writeLines"))
  }

  test("meta JSONL (scalable form) round-trips") {
    val docs = MetaGen.docs(spark, PipelineConfig.scaled(1))
    val dir = Files.createTempDirectory("graft_jsonl").toString
    MetaJson.writeLines(docs, dir)
    val back = MetaJson.readLines(spark, dir)
    assert(back.count() == docs.count())
    assert(back.selectExpr("explode(sits.sit_id)").distinct().count() == 50)
  }
}
