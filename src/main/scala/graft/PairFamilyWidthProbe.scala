package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dev aid: same-JVM interleaved A/B for the pair family's doc-frame
  * width at the bench shape. Hypothesis (from the bench-floor probe +
  * jstack): at sf0.1 the 0.58 MB corpus parquet is ONE scan split, so
  * the per-doc kernels (minhash bands, n-gram shingle sets) run
  * SERIALLY in a single task — executors sample ~87% parked while one
  * core works. The A leg injects one narrow repartition of the doc
  * frame (docs cross the wire once, kilobytes) before the kernel; the
  * B leg is the shipped shape. Contrast SubstringAbProbe (r10), which
  * measured the same exchange LOSING for the substring family — there
  * the per-doc kernel is one cheap hash pass; here it is minhash ×
  * bands×rows plus set construction, so the trade may flip.
  *
  * Usage: SPARK_GRAFT_CPUS=32 sbt "runMain graft.PairFamilyWidthProbe /root/testdata/sf0.1 5"
  */
object PairFamilyWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-pair-width")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1).count()

    def docs(s: SparkSession): DataFrame =
      s.read.parquet(s"$sfDir/documents.parquet")
    def wide(s: SparkSession): DataFrame =
      docs(s).repartition(s.sessionState.conf.numShufflePartitions)

    val legs: Seq[(String, SparkSession => Long)] = Seq(
      "q19_plain" -> (s => graft.ops.Dedup.ngramJaccardPairs(docs(s),
        "doc_id", "text", n = 3, threshold = 0.4, maxBucket = 100)
        .queryExecution.toRdd.count()),
      "q19_wide" -> (s => graft.ops.Dedup.ngramJaccardPairs(wide(s),
        "doc_id", "text", n = 3, threshold = 0.4, maxBucket = 100)
        .queryExecution.toRdd.count()),
      "q96_plain" -> (s => graft.ops.Dedup.lshQualityEval(docs(s),
        "doc_id", "text", n = 3, bands = 4, rows = 2,
        thresholdPermille = 400, maxBucket = 1000, truthMaxBucket = 100)
        .queryExecution.toRdd.count()),
      "q96_wide" -> (s => graft.ops.Dedup.lshQualityEval(wide(s),
        "doc_id", "text", n = 3, bands = 4, rows = 2,
        thresholdPermille = 400, maxBucket = 1000, truthMaxBucket = 100)
        .queryExecution.toRdd.count()))

    val times = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; (name, body) <- legs) {
      val s = spark.newSession()
      val t0 = System.nanoTime()
      val n = body(s)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[pw] $name rep $rep: $secs%.2f s ($n rows)")
      times(name) = times(name) :+ secs
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    times.foreach { case (k, ts) => println(f"[pw] $k MEDIAN ${med(ts)}%.2f s") }
    spark.stop()
  }
}
