package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid: isolated harness for the curation boilerplate-profile stage —
  * with findings 17/18 landed it is the phase's largest remaining stage
  * (~72 s and the phase's dominant 4.8 GB exchange at 504k docs). Runs
  * exactly the `CurationDemo` call (n=3, minDf=20) over an existing
  * corpus parquet with per-stage task metrics + the AQE-final plan, so a
  * jstack of this JVM attributes the stage's CPU and an old-vs-new stash
  * A/B measures a fix in isolation.
  *
  * Usage: SPARK_DRIVER_MEM=48g sbt "runMain graft.BoilerProbe target/scale"
  */
object BoilerProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // same scratch/GC discipline as ScaleRun (see its scaladoc)
      .config("spark.io.compression.codec", "zstd")
      .config("spark.buffer.pageSize", "8m")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .appName("graft-boiler-probe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          val spill = (m.memoryBytesSpilled + m.diskBytesSpilled) >> 20
          val sw = m.shuffleWriteMetrics.bytesWritten >> 20
          val sr = m.shuffleReadMetrics.totalBytesRead >> 20
          println(f"[stage ${e.stageInfo.stageId}%4d] spill $spill%6d MB  " +
            f"shuffle r/w $sr%6d/$sw%6d MB  ${e.stageInfo.name.take(140)}")
        }
      }
    })

    val corpus = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text")
    val t0 = System.nanoTime()
    // the exact CurationDemo call: stats aggregate + fully-templated ids
    val boiler = graft.ops.Curation.boilerplateProfile(
      corpus, "doc_id", "text", n = 3, minDf = 20).cache()
    val stats = boiler.agg(
      avg(col("boiler_pm")).as("mean_pm"),
      sum(when(col("boiler_pm") === 1000, 1L).otherwise(0L)).as("n_full"))
      .collect()(0)
    val nFull = boiler.filter(col("boiler_pm") === 1000).count()
    println(f"[probe] mean ${stats.getDouble(0)}%.1f pm, $nFull fully-templated " +
      f"in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println("[probe] AQE-final executed plan:")
    println(boiler.queryExecution.executedPlan.toString.take(12000))
    boiler.unpersist()
    spark.stop()
  }
}
