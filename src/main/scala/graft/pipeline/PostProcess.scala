package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row
import graft.sink.{DocSink, Eml, MiniFormats}

/** Stage 3 — derived-format export (SURVEY.md §3.3).
  *
  * The reference loops rows on the driver writing docx/pdf/eml per doc at
  * 8–16 docs/s single-threaded (`modules/postprocessor.py:217-223`,
  * BASELINE.md). Here the per-format encoders run as one distributed
  * projection producing binary columns (the same plumbing the multimodal
  * operators use), and files — when a file-per-doc export is actually wanted
  * — go through the `foreachPartition` sink. Header extraction (P9) and path
  * derivation stay declarative.
  */
object PostProcess {

  /** P9 — "last matching header line wins" extraction
    * (`modules/postprocessor.py:174-183`). `element_at(..., -1)` picks the
    * last match; guarded by `size() > 0` so ANSI mode never sees an
    * out-of-bounds index. */
  def lastHeaderCol(text: Column, header: String, default: Column): Column = {
    val matching = filter(split(text, "\n"),
      l => lower(l).startsWith(header.toLowerCase + ":"))
    val lastLine = element_at(matching, -1)
    when(size(matching) > 0,
      trim(lastLine.substr(instr(lastLine, ":") + 1, length(lastLine))))
      .otherwise(default)
  }

  private val docxUdf = udf((text: String) =>
    if (text == null) null else MiniFormats.docxBytes(text))
  private val pdfUdf = udf((text: String) =>
    if (text == null) null else MiniFormats.pdfBytes(text))

  private val emlUdf = udf {
    (subject: String, from: String, to: String, date: String, text: String,
     withAttachment: Boolean, sitRows: Seq[Row]) =>
      if (text == null) null
      else {
        val attachments =
          if (withAttachment) {
            val header = Seq("sit_id", "sit_name", "label", "instances",
              "confidence", "tcs")
            val rows = header +: sitRows.map { r =>
              Seq(r.getAs[String]("sit_id"), r.getAs[String]("sit_name"),
                r.getAs[String]("label"), r.getAs[Long]("instances").toString,
                r.getAs[String]("confidence"),
                r.getAs[Seq[String]]("tcs").mkString(","))
            }
            Seq(Eml.Attachment("report.xlsx",
              Eml.guessMime("report.xlsx"), MiniFormats.xlsxBytes(rows)))
          } else Seq.empty
        Eml.build(subject, from, to, date, text, attachments)
      }
  }

  /** Derive all post-processed artifacts as columns over the corpus
    * (`doc_id, filename, format, text, sits`):
    * docx_bytes / pdf_bytes always; eml_text for email formats (with xlsx
    * attachment for `email_with_attachment` — S6); path + audit columns
    * matching `modules/postprocessor.py:139-192`. `processedAt` is an
    * injected clock. */
  def derive(corpus: DataFrame,
             processedAt: String = "1970-01-01T00:00:00Z",
             rfc2822Date: String = "Thu, 01 Jan 1970 00:00:00 +0000"): DataFrame = {
    val stem = regexp_replace(col("filename"), "\\.txt$", "")
    val isEmail = col("format").isin("email", "email_with_attachment")
    corpus
      .withColumn("stem", stem)
      .withColumn("docx_name", concat(col("stem"), lit(".docx")))
      .withColumn("pdf_name", concat(col("stem"), lit(".pdf")))
      .withColumn("eml_name",
        when(isEmail, concat(col("stem"), lit(".eml"))).otherwise(lit("")))
      .withColumn("docx_bytes", docxUdf(col("text")))
      .withColumn("pdf_bytes", pdfUdf(col("text")))
      .withColumn("subject",
        lastHeaderCol(col("text"), "subject", concat(lit("Automated message "), col("stem"))))
      .withColumn("from_addr", lastHeaderCol(col("text"), "from", lit("no-reply@example.com")))
      .withColumn("to_addr", lastHeaderCol(col("text"), "to", lit("recipient@example.com")))
      .withColumn("eml_text",
        when(isEmail,
          emlUdf(col("subject"), col("from_addr"), col("to_addr"),
            lit(rfc2822Date), col("text"),
            col("format") === "email_with_attachment", col("sits")))
          .otherwise(lit(null).cast("string")))
      .withColumn("docx_path", concat(lit("output/files/"), col("docx_name")))
      .withColumn("pdf_path", concat(lit("output/files/"), col("pdf_name")))
      .withColumn("eml_path",
        when(isEmail, concat(lit("output/files/"), col("eml_name"))).otherwise(lit("")))
      .withColumn("attachments",
        when(col("format") === "email_with_attachment",
          concat(lit("output/files/"), col("stem"), lit("_attachment.xlsx")))
          .otherwise(lit("")))
      .withColumn("postprocessed_at", lit(processedAt))
  }

  /** Export the derived artifacts as real files under `dir` (S8/S10/S12/S14
    * sinks). */
  def export(derived: DataFrame, dir: String): Unit = {
    DocSink.writeBinaryFiles(derived, dir, "docx_name", "docx_bytes")
    DocSink.writeBinaryFiles(derived, dir, "pdf_name", "pdf_bytes")
    DocSink.writeTextFiles(
      derived.filter(col("eml_name") =!= "").select("eml_name", "eml_text"),
      dir, "eml_name", "eml_text")
  }

  /** J4 — fold the derived path/audit columns back into the mapping table
    * (set-based rewrite of the `df.at[idx, k] = v` loop,
    * `modules/postprocessor.py:217-223`). */
  def updateMapping(mapping: DataFrame, derived: DataFrame): DataFrame =
    ContentGen.upsertMapping(mapping,
      derived.select("doc_id", "docx_path", "pdf_path", "eml_path",
        "attachments", "postprocessed_at"))
}
