package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev aid: interleaved same-JVM A/B of [[graft.ops.Dedup.dupClusters]]'
  * n-gated broadcast hint at the bench shape — validates (or rejects)
  * the r10 pageRank-recipe transfer on the sibling iterative op. Runs
  * the exact q39 composition (minhash pairs → clusters → filter).
  *
  * Usage: sbt "runMain graft.DupClustersProbe /root/testdata/sf0.1 5"
  */
object DupClustersProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = if (args.length > 1) args(1).toInt else 5
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .appName("graft-dupclusters-ab")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    spark.read.parquet(s"$sfDir/documents.parquet").limit(1).count()

    def q39(s: SparkSession, gate: Long): Long = {
      val pairs = graft.ops.Dedup.minhashNearDups(
        s.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text",
        threshold = 0.4).select("id_a", "id_b")
      graft.ops.Dedup.dupClusters(pairs, broadcastLabelsMaxNodes = gate)
        .filter(col("id") =!= col("cluster"))
        .queryExecution.toRdd.count()
    }
    val legs = Seq("hint" -> 2000000L, "nohint" -> 0L)
    val times = scala.collection.mutable.LinkedHashMap[String, List[Double]]()
      .withDefaultValue(Nil)
    for (rep <- 1 to reps; (name, gate) <- legs) {
      val qSession = spark.newSession()
      val t0 = System.nanoTime()
      val n = q39(qSession, gate)
      val secs = (System.nanoTime() - t0) / 1e9
      qSession.catalog.clearCache()
      System.gc()
      println(f"[dc] $name rep $rep: $secs%.2f s ($n rows)")
      times(name) = times(name) :+ secs
    }
    times.foreach { case (k, ts) =>
      val med = ts.sorted.apply((ts.size - 1) / 2)
      println(f"[dc] MEDIAN $k: $med%.2f s over ${ts.size} reps " +
        s"(${ts.map(t => f"$t%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
