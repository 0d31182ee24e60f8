package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Curation, TextAnalysis}

/** Measurement harness for the round-5 scale finding: JDK regex match
  * throughput is SERIAL under multithreading on this environment (also
  * reproduced in a plain `java` JVM with a 30-line program — see
  * SCALE.md finding 6). Times each profile-stage column on a slice of
  * the scale corpus, then the raw kernels standalone and under 1/32
  * threads. Not part of the shipped surface; kept as the reproduction
  * recipe for the numbers SCALE.md cites. */
object RegexScalingProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val threads = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("target/scale/documents.parquet")
      .limit(n).select("doc_id", "text").repartition(32).cache()
    docs.count()
    def time(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    time("baseline count")(docs.select("doc_id"))
    time("tokenCount")(docs.select(TextAnalysis.tokenCountCol(col("text"))))
    time("langId")(docs.select(TextAnalysis.langIdCol(col("text"))))
    time("quality (1 field)")(docs.select(
      TextAnalysis.qualityColumns(col("text")).head._2))
    time("normalize")(docs.select(Curation.normalizeTextCol(col("text"))))
    time("fingerprint")(docs.select(
      TextAnalysis.fingerprintCol(Curation.normalizeTextCol(col("text")))))
    time("redactSits (count+replace)")(
      Curation.redactSits(docs, "text", graft.pipeline.DefaultSits.all)
        .select("n_redactions", "redacted_text"))
    val full = Curation.redactSits(docs, "text", graft.pipeline.DefaultSits.all)
      .withColumn("norm_text", Curation.normalizeTextCol(col("redacted_text")))
      .withColumn("lang_pred", TextAnalysis.langIdCol(col("text")))
      .withColumn("n_tokens", TextAnalysis.tokenCountCol(col("text")))
      .withColumn("fingerprint", TextAnalysis.fingerprintCol(col("norm_text")))
      .withColumn("split", Curation.splitCol(col("doc_id")))
      .select("doc_id", "split", "lang_pred", "n_tokens",
        "n_redactions", "fingerprint", "redacted_text")
    time("full finalDf projection")(full)
    // driver-side microbench: the raw kernels on the same docs
    val sample = docs.limit(200).select("text").collect().map(_.getString(0))
    println(s"[profile] sample avg len ${sample.map(_.length).sum / sample.length}")
    def mb(name: String)(f: String => Any): Unit = {
      f(sample.head) // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < sample.length) { f(sample(i)); i += 1 }
      println(f"[profile] kernel $name%-20s ${(System.nanoTime() - t0) / 1e6 / sample.length}%8.3f ms/doc")
    }
    // how many times does the UDF actually run for a 5000-row select?
    val calls = new java.util.concurrent.atomic.AtomicLong
    val countedUdf = udf { (t: String) =>
      calls.incrementAndGet(); TextAnalysis.tokenCount(t) }
    time("tokenCount (counted udf)")(docs.select(countedUdf(col("text"))))
    println(s"[profile] udf invocations for 5000 rows: ${calls.get()}")
    import spark.implicits._
    time("tokenCount mapPartitions")(
      docs.select("text").as[String]
        .mapPartitions(it => it.map(TextAnalysis.tokenCount)).toDF())
    // pure JVM thread-scaling test: no Spark machinery at all
    def mt(name: String, nThreads: Int)(f: String => Any): Unit = {
      val docsPer = 200
      val t0 = System.nanoTime()
      val ts = (1 to nThreads).map { _ =>
        new Thread(() => {
          var i = 0
          while (i < docsPer) { f(sample(i % sample.length)); i += 1 }
        })
      }
      ts.foreach(_.start()); ts.foreach(_.join())
      val ms = (System.nanoTime() - t0) / 1e6
      println(f"[profile] raw $name%-12s threads=$nThreads%-3d " +
        f"${ms / docsPer}%8.3f ms/doc-wave")
    }
    val splitPat = java.util.regex.Pattern.compile("[^a-z0-9']+")
    def handTok(t: String): Long = {
      var n = 0L; var inTok = false; var i = 0
      while (i < t.length) {
        val c = t.charAt(i)
        val isTok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '\''
        if (isTok && !inTok) n += 1
        inTok = isTok; i += 1
      }
      n
    }
    for (th <- Seq(1, 32)) {
      mt("full", th)(TextAnalysis.tokenCount)
      mt("lower-only", th)(_.toLowerCase(java.util.Locale.ROOT).length)
      mt("presplit", th)(t => splitPat.split(t).length)
      mt("handTok", th)(handTok)
    }
    mb("tokenCount")(TextAnalysis.tokenCount)
    mb("langId")(TextAnalysis.langId)
    mb("qualityMetrics")(TextAnalysis.qualityMetrics)
    mb("split-only")(t => t.toLowerCase(java.util.Locale.ROOT)
      .split("[^a-z0-9']+").length)
    spark.stop()
  }
}
