package graft

import org.apache.spark.sql.SparkSession

/** Dev aid: interleaved same-JVM A/B of [[graft.ops.Dedup.repeatedSpans]]'s
  * pre-shingle repartition at the BENCH shape (local[4], 4 shuffle
  * partitions) — the harness behind the r9 verdict's q90/q91 item: the
  * finding-16 exchange that cut the 504k-doc substring phase 408→79 s
  * regressed the sf0.1 bench medians, and this probe isolates that one
  * knob with the repo's noise discipline (legs alternate
  * repart/passthrough within each rep, one warm JVM, medians reported).
  *
  * Legs: `repart` forces the exchange at 8× the session shuffle
  * parallelism (the unconditional r9 behavior at bench time);
  * `passthrough` forces it off (the r8 behavior). The adaptive
  * `docParts = 0` default dispatches between exactly these two shapes on
  * plan-stats bytes, so the A/B also measures both sides of the gate.
  *
  * Usage: sbt "runMain graft.SubstringAbProbe /root/testdata/sf0.1 4"
  */
object SubstringAbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-substring-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm exactly like Bench: executor spin-up, codegen, parquet footers
    spark.range(1000).selectExpr("sum(id)").count()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1).count()

    // q90/q91 exactly as SparkEntry defines them, with the one knob exposed
    def q90(s: SparkSession, dp: Int) =
      graft.ops.Dedup.repeatedSpans(
        s.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        n = 10, docParts = dp)
        .orderBy("id", "span_start")
    def q91(s: SparkSession, dp: Int) =
      graft.ops.Dedup.stripRepeatedSpans(
        s.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        n = 10, docParts = dp)
        .orderBy("id")

    val legs = Seq("repart" -> (cpus.toInt * 8), "passthrough" -> -1)
    val queries = Seq("q90" -> (q90 _), "q91" -> (q91 _))
    val times = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; (legName, dp) <- legs; (qName, fn) <- queries) {
      val qSession = spark.newSession()   // Bench's isolation discipline
      val t0 = System.nanoTime()
      val n = fn(qSession, dp).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      qSession.catalog.clearCache()
      System.gc()
      println(f"[ab] $qName/$legName rep $rep: $secs%.2f s ($n rows)")
      times(s"$qName/$legName") = times(s"$qName/$legName") :+ secs
    }
    times.foreach { case (k, ts) =>
      val med = ts.sorted.apply((ts.size - 1) / 2)
      println(f"[ab] MEDIAN $k: $med%.2f s over ${ts.size} reps " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
