package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Scale-aware parquet writing: at 100 TB the dominant sink failure modes
  * are the SMALL-FILES problem (one file per task × thousands of tasks ×
  * hundreds of partitions murders the namenode and every later scan) and
  * its inverse (one giant task writing one giant file serializes the job).
  *
  * `writeSized` bounds both: rows are hash-distributed into
  * ceil(rowEstimate / targetRowsPerFile) shuffle partitions before the
  * write, and `maxRecordsPerFile` caps any residual straggler file. With
  * `partitionBy` columns the repartition keys on them too, so each
  * Hive-style output partition is written by the tasks that own it rather
  * than every task appending a sliver to every partition. */
object ParquetSink {

  /** COST NOTE: with `rowEstimate = None` the row count is resolved, in
    * order, from (a) the caller, (b) Catalyst plan statistics when the
    * optimizer can bound them exactly (CBO / cached relations), and only
    * then (c) a `df.count()` — which executes the ENTIRE upstream plan a
    * second time. At the 100 TB scale this sink targets, pass
    * `rowEstimate` (any within-2× figure is fine — it only sizes files)
    * or cache the frame before calling; the count() fallback doubles the
    * job for an uncached pipeline. */
  def writeSized(df: DataFrame, path: String,
                 partitionCols: Seq[String] = Seq.empty,
                 targetRowsPerFile: Long = 1000000L,
                 rowEstimate: Option[Long] = None,
                 mode: SaveMode = SaveMode.Overwrite): Unit = {
    // plan-stats shortcut only without CBO: the size-only estimator sets
    // rowCount just where it is exact (cached/local/range relations, hive
    // stats); CBO's Filter/Join estimation fills it with selectivity
    // GUESSES that can be orders of magnitude off — never size files on those
    val cboOn = df.sparkSession.conf
      .get("spark.sql.cbo.enabled", "false").toBoolean
    val rows = rowEstimate
      .orElse(if (cboOn) None
              else df.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong))
      .getOrElse(df.count())
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val shaped =
      if (partitionCols.nonEmpty)
        // co-locate each output partition's rows; spread within a
        // partition by a stable row hash so one hot partition still
        // parallelizes instead of landing in a single task
        df.repartition(nFiles,
          partitionCols.map(col) :+
            pmod(xxhash64(df.columns.map(col): _*), lit(nFiles.toLong)): _*)
      else df.repartition(nFiles)
    val writer = shaped.write
      .mode(mode)
      .option("maxRecordsPerFile", targetRowsPerFile)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*)
     else writer).parquet(path)
  }
}
