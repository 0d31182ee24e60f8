package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Physical-layout operators — the part of a 100 TB pipeline that decides
  * what the NEXT job's scan costs: small-file compaction planning,
  * multi-dimensional z-order clustering for data skipping, and the
  * scalable global prefix-sum they both lean on.
  *
  * Scale stance: a "global running total" is the textbook single-task
  * window trap (`Window.orderBy` with no partition moves every row to one
  * task). [[runningTotal]] replaces it with the classic distributed scan:
  * range-repartition on the sort key (parallel sort), per-partition
  * window sums, then a broadcast join of per-partition offsets — the same
  * discipline as `Sketches.exactGlobalNtile`. Compaction planning itself
  * runs on file METADATA (one row per file: ~10⁶ rows for 100 TB of
  * 100 MB files), so even its total order is metadata-scale — but the
  * primitive stays distributed so the same code serves row-scale callers.
  */
object Layout {

  /** Exact global running total of `value` under the total order given by
    * `sortCols` (include a unique tie-break column — determinism of the
    * result REQUIRES a total order, though partition boundaries don't:
    * range boundaries are sampled, and the prefix sum is invariant to
    * where they land). Adds `alias`; input columns pass through. */
  def runningTotal(df: DataFrame, sortCols: Seq[Column], value: Column,
                   alias: String, numParts: Int = 0): DataFrame = {
    val parts = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, sortCols: _*)
      .withColumn("_pid", spark_partition_id())
    val within = Window.partitionBy("_pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val run = ranged.withColumn("_run", sum(value).over(within))
    // BOUNDED GLOBAL WINDOW: one row per partition → the unpartitioned
    // window is over ≤ `parts` rows, then rides a broadcast back — never
    // a wide single-task sort. WindowExec still logs its "No Partition
    // Defined" warning (it fires on an empty partition spec regardless of
    // input size); deliberate and bounded here — see SCALE.md "Bounded
    // global windows".
    val offsets = run.groupBy("_pid").agg(sum(value).as("_psum"))
      .withColumn("_off", coalesce(
        sum("_psum").over(Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("_pid", "_off")
    run.join(broadcast(offsets), "_pid")
      .withColumn(alias, col("_run") + col("_off"))
      .drop("_pid", "_run")
  }

  /** Compaction bin assignment: pack files into target-sized output bins
    * by the deterministic shelf rule `bin = (runningTotal − size) DIV
    * target` over files ordered size-DESC (biggest first keeps bins near
    * target; the id tie-break makes the order total). Returns per-bin
    * (bin, n_files, bytes). Exact integer arithmetic end-to-end. */
  def compactionBins(files: DataFrame, idCol: String, sizeCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, "targetBytes must be positive")
    val sized = files.select(col(idCol).as("id"),
      col(sizeCol).cast("long").as("size"))
    runningTotal(sized, Seq(col("size").desc, col("id")), col("size"), "cum")
      .withColumn("bin", expr(s"(cum - size) div ${targetBytes}L"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_files"), sum("size").as("bytes"))
      .orderBy("bin")
  }

  /** Z-order (Morton) key: interleaves the low `bits` bits of each
    * dimension — dimension j contributes bit i to key bit
    * `i * dims.size + j`, so a range of keys bounds EVERY dimension at
    * once (the data-skipping property: parquet min/max stats on a
    * z-sorted file prune multi-column predicates, not just the leading
    * sort column). Pure integer bit arithmetic, codegen-friendly,
    * oracle-portable via [[zorderKeySql]]. Dimensions must be
    * non-negative and < 2^bits — a value outside that domain silently
    * loses its high bits here (the key stays well-defined and
    * [[zorderKeySql]] truncates identically, but the locality/skipping
    * property quietly degrades: all values sharing low bits collide).
    * [[zorderCluster]] forecloses that with a cheap min/max precheck;
    * callers using the raw key column own the domain. */
  def zorderKey(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits >= 1 && bits * dims.size <= 62,
      s"need 1..62 total key bits, got ${bits * dims.size}")
    val terms = for {
      i <- 0 until bits; (d, j) <- dims.zipWithIndex
    } yield shiftleft(shiftright(d.cast("long"), i).bitwiseAND(lit(1L)),
      i * dims.size + j)
    terms.reduce(_ + _)
  }

  /** The identical computation as ANSI SQL (for the DuckDB oracle). */
  def zorderKeySql(dims: Seq[String], bits: Int): String =
    (for {
      i <- 0 until bits; (d, j) <- dims.zipWithIndex
    } yield s"(((CAST($d AS BIGINT) >> $i) & 1) << ${i * dims.size + j})")
      .mkString(" + ")

  /** Cluster a frame for multi-dimensional data skipping: range-partition
    * on the z-key, sort within partitions by it. Each output file then
    * covers a contiguous z-range ⇒ tight min/max stats on ALL `dims`.
    * Write the result with plain `.write.parquet`; the layout is in the
    * row order, not the writer. */
  def zorderCluster(df: DataFrame, dims: Seq[Column], bits: Int,
                    numParts: Int = 0): DataFrame = {
    val parts = if (numParts > 0) numParts
      else df.sparkSession.sessionState.conf.numShufflePartitions
    // domain precheck: one narrow min/max scan per call — negligible next
    // to the range shuffle this operator exists to perform, and it turns
    // the silent high-bit truncation documented on [[zorderKey]] (which
    // would quietly destroy the data-skipping property the caller is
    // paying the shuffle FOR) into a loud failure naming the dimension
    val lim = 1L << bits
    val bounds = df.select(dims.zipWithIndex.flatMap { case (d, j) =>
      Seq(min(d.cast("long")).as(s"mn$j"), max(d.cast("long")).as(s"mx$j"))
    }: _*).collect()(0)
    dims.indices.foreach { j =>
      if (!bounds.isNullAt(2 * j)) {
        val (mn, mx) = (bounds.getLong(2 * j), bounds.getLong(2 * j + 1))
        require(mn >= 0 && mx < lim,
          s"zorderCluster dimension $j has range [$mn, $mx] outside " +
            s"[0, $lim) for bits=$bits — raise bits (or offset/scale the " +
            "dimension); truncated keys would silently lose z-locality")
      }
    }
    val keyed = df.withColumn("_zkey", zorderKey(dims, bits))
    keyed.repartitionByRange(parts, col("_zkey"))
      .sortWithinPartitions("_zkey").drop("_zkey")
  }

  /** Hive-partitioned parquet write: one directory per `partCol` value,
    * rows repartitioned by the partition column first so each hive
    * partition is written by one task (otherwise every task appends a
    * file to every partition — tasks × partitions small files, the
    * classic layout failure at 1000 executors).
    *
    * The payoff is scan-time partition PRUNING: a reader filtering on
    * `partCol` never opens the other directories — the physical plan
    * carries the predicate as `PartitionFilters`, leaving data filters
    * for parquet row groups only. LayoutSpec pins exactly that on a
    * read-back. */
  def writePartitioned(df: DataFrame, path: String, partCol: String): Unit =
    df.repartition(col(partCol))
      .write.mode("overwrite").partitionBy(partCol).parquet(path)

  /** Bucketed table write + the shuffle-free join it buys: both sides
    * pre-hashed into the same bucket count on the join key means the
    * sort-merge join needs NO Exchange at query time — at 100 TB the
    * entire fact-to-fact shuffle (the single most expensive stage of a
    * repeated join) is paid ONCE at write time and amortized over every
    * subsequent query. LayoutSpec pins the no-Exchange plan. Requires a
    * table (bucket metadata lives in the catalog, not the files). */
  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keyCol).sortBy(keyCol)
      .format("parquet").saveAsTable(table)
}
