package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev aid: per-STAGE spill attribution for the decontamination DAG over
  * an existing corpus parquet. The instrumented 2× headroom probe located
  * 100% of the curation phase's 47.9 GB spill in the decontamination
  * stage mark; this narrows it to the operator (per-stage task metrics +
  * the AQE-final executed plan), so the fix targets the real sort/agg
  * instead of a guess.
  *
  * Usage: SPARK_DRIVER_MEM=48g sbt "runMain graft.DecontamProbe target/scale2"
  */
object DecontamProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale2")
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
      .appName("graft-decontam-probe")
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
    // the exact slice + thresholds the scale run uses (ScaleRun phase 2)
    val benchDocs = corpus.filter(col("doc_id") % 200 === 0)
    val t0 = System.nanoTime()
    val flags = graft.ops.Curation.decontaminationFlags(
      corpus.filter(col("doc_id") % 200 =!= 0), benchDocs,
      "doc_id", "text", n = 8, minHits = 20)
    val n = flags.count()
    println(f"[probe] flagged $n docs in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    println("[probe] AQE-final executed plan:")
    println(flags.queryExecution.executedPlan.toString.take(12000))
    spark.stop()
    sys.exit(0)
  }
}
