package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r16): does the plan-stats estimate of the substring
  * pipeline's post-explode shingle frame SCALE with the doc frame, so
  * that `occExchangeParts`' 64 MB gate (now also routing
  * `coveredPositionsHash`) keeps the WIDE side at corpus scale? Prints
  * the optimizer sizeInBytes for the sf0.1 corpus and a 64× union. */
object OccGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val posShingleHashesUdf = udf(graft.ops.Dedup.posShingleHashes _)
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def shStats(df: DataFrame): BigInt = df
      .select(col("doc_id").cast("long").as("id"),
        posexplode(posShingleHashesUdf(col("text"), lit(10)))
          .as(Seq("pos", "shingle")))
      .queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[occgate] sf0.1 sh stats bytes: ${shStats(docs)} " +
      s"(gate ${graft.ops.Dedup.OccWideMinBytes})")
    val big = (1 to 64).map(_ => docs).reduce(_ unionByName _)
    println(s"[occgate] 64x-union sh stats bytes: ${shStats(big)}")
    spark.stop()
  }
}
