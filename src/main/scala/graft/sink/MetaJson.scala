package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** S2/S3 — the nested `meta.json` exchange (SURVEY.md §1.2).
  *
  * Two forms:
  *   - scalable: the plan as JSONL (`docs.write.json`) — one nested document
  *     object per line, readable with a plain `spark.read.json`;
  *   - reference-shaped: the single-object envelope
  *     `{generated_at, docs:[…], sit_doc_counts, sit_instance_counts}`
  *     (`modules/meta_generator.py:153-154`) — driver-side for small plans,
  *     read back with `multiLine` + `explode(docs)`
  *     (`modules/content_generator.py:257-258`). The side-count maps are
  *     derived aggregates and are recomputed, not stored state.
  */
object MetaJson {

  /** Scalable JSONL write of the nested plan. */
  def writeLines(docs: DataFrame, dir: String): Unit =
    docs.write.mode("overwrite").json(dir)

  def readLines(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir)

  /** Hard ceiling for the envelope form's driver-side materialization.
    * The envelope is a reference-compat affordance for small plans; at
    * pipeline scale callers must use [[writeLines]]. The guard makes a
    * misuse fail loudly (one cheap count job) instead of OOMing the
    * driver mid-collect. */
  val EnvelopeMaxDocs: Long = 100000L

  /** Reference-shaped single-object envelope (small plans only — collects). */
  def writeEnvelope(docs: DataFrame, path: String,
                    generatedAt: String = "1970-01-01T00:00:00Z"): Unit = {
    val n = docs.count()
    require(n <= EnvelopeMaxDocs,
      s"meta.json envelope would collect $n docs on the driver " +
        s"(max $EnvelopeMaxDocs); use MetaJson.writeLines for large plans")
    val docsJson = docs.toJSON.collect().mkString("[", ",", "]")
    val counts = docs.select(explode(col("sits")).as("s"))
      .groupBy(col("s.sit_id")).agg(count(lit(1)).as("docs"),
        sum(col("s.instances")).as("instances"))
      .collect()
    def jmap(f: org.apache.spark.sql.Row => Long): String =
      counts.sortBy(_.getString(0))
        .map(r => s""""${r.getString(0)}": ${f(r)}""").mkString("{", ", ", "}")
    val json =
      s"""{"generated_at": "$generatedAt", "docs": $docsJson, """ +
        s""""sit_doc_counts": ${jmap(_.getLong(1))}, """ +
        s""""sit_instance_counts": ${jmap(_.getLong(2))}}"""
    Files.writeString(Paths.get(path), json)
  }

  /** Read the envelope back to one row per doc (nested sits intact). */
  def readEnvelope(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
      .select(explode(col("docs")).as("d"))
      .select("d.*")
}
