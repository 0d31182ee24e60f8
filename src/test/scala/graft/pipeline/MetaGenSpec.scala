package graft.pipeline

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Stage-1 invariants (SURVEY.md §4.2 contract): coverage, distributions,
  * confidence rules, mapping shape. */
class MetaGenSpec extends SparkSpec {

  private lazy val cfg = PipelineConfig.scaled(perSit = 8)
  private lazy val docs = MetaGen.docs(spark, cfg).cache()

  test("every SIT reaches per_sit_count docs (the validator's contract)") {
    val cov = MetaGen.coverage(docs).collect()
    assert(cov.length == 50)
    cov.foreach(r => assert(r.getLong(1) >= cfg.perSitCount,
      s"${r.getString(0)} only ${r.getLong(1)}"))
  }

  test("sit count / word count follow the configured distributions") {
    val stats = docs.select(
      avg(size(col("sits"))).as("avg_sits"),
      min("word_count_target").as("min_wc"),
      max("word_count_target").as("max_wc"),
      avg(when(col("word_count_target").between(500, 1500), 1.0).otherwise(0.0))
        .as("main_share")).collect()(0)
    assert(stats.getDouble(0) > 3.0 && stats.getDouble(0) < 3.8,
      s"avg sits ${stats.getDouble(0)} (expect ~3.4)")
    assert(stats.getLong(1) >= 300 && stats.getLong(2) <= 4000)
    assert(stats.getDouble(3) > 0.55, s"main range share ${stats.getDouble(3)}")
  }

  test("sits within a doc are distinct; labels and confidence follow G5 rules") {
    val bad = docs.select(size(col("sits")).as("n"),
      size(array_distinct(col("sits.sit_id"))).as("nd"))
      .filter(col("n") =!= col("nd")).count()
    assert(bad == 0, "duplicate SIT inside a doc")
    val rows = docs.select(explode(col("sits")).as("s"))
      .select(col("s.label"), col("s.instances"), col("s.confidence")).collect()
    rows.foreach { r =>
      val (label, inst, conf) = (r.getString(0), r.getLong(1), r.getString(2))
      val expected =
        if (label == "TP") {
          if (inst >= 6) "High" else if (inst >= 3 && inst <= 5) "Medium" else "Low"
        } else if (inst >= 3) "Medium" else "Low"
      assert(conf == expected, s"$label/$inst -> $conf")
      assert(inst >= 1 && inst <= 20)
    }
  }

  test("filenames follow doc_%05d_{format}.txt; created_at injected") {
    val r = docs.orderBy("doc_id").limit(1).collect()(0)
    val fmt = r.getAs[String]("format")
    assert(r.getAs[String]("filename") == f"doc_${r.getAs[Long]("doc_id")}%05d_$fmt.txt")
    assert(r.getAs[String]("created_at") == "1970-01-01T00:00:00Z")
  }

  test("mapping table has the §1.3 shape with ;-joined parallel arrays") {
    val m = MetaGen.mappingFromDocs(docs)
    assert(m.columns.toSeq == Seq("doc_id", "filename", "format",
      "word_count_target", "sit_ids", "labels", "instances", "confidences", "tcs"))
    val r = m.filter(col("doc_id") === 1).collect()(0)
    val nSits = r.getAs[String]("sit_ids").split(";").length
    assert(r.getAs[String]("labels").split(";").length == nSits)
    assert(r.getAs[String]("instances").split(";").length == nSits)
    assert(r.getAs[String]("confidences").split(";").length == nSits)
    val tcs = r.getAs[String]("tcs").split(";")
    assert(tcs.sorted.sameElements(tcs), "tcs must be canonically sorted")
  }

  test("generation is deterministic across runs and partitionings") {
    val again = MetaGen.docs(spark, cfg)
    assert(again.repartition(13).exceptAll(docs).count() == 0)
    assert(docs.exceptAll(again).count() == 0)
  }
}
