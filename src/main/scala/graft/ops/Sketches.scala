package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate aggregates for corpus-wide statistics at 100 TB — the
  * rollups a curation pipeline runs before/after every transform (how many
  * distinct documents/urls/fingerprints, where the length/quality quantiles
  * sit) where exactness is not worth a full shuffle of the key space.
  *
  * All of these are single-pass, bounded-state, map-side-combining
  * aggregates (HyperLogLog++ and a Greenwald-Khanna-style quantile sketch
  * inside Spark); none shuffles more than one sketch per partition per
  * group. The exact twins are kept alongside because (a) the DuckDB oracle
  * can only reproduce exact math, and (b) the specs bound the approximation
  * error against them at test scale.
  */
object Sketches {

  /** Approximate distinct count per group (HyperLogLog++, `rsd` relative
    * standard deviation — state is O(1/rsd²) per group regardless of
    * cardinality; the exact twin shuffles every distinct key). */
  def approxDistinct(df: DataFrame, groupCol: String, keyCol: String,
                     rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_count_distinct(col(keyCol), rsd).as("approx_distinct"))

  /** Exact twin of [[approxDistinct]] (one shuffle of the distinct keys). */
  def exactDistinct(df: DataFrame, groupCol: String, keyCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(countDistinct(col(keyCol)).as("n_distinct"))

  /** Exact quantiles per group via `percentile` (linear interpolation —
    * the same definition as DuckDB's `quantile_cont`, so this one is
    * oracle-able). Values rounded to 6 decimals before comparison. */
  def exactQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     probs: Seq[Double]): DataFrame =
    df.groupBy(groupCol)
      .agg(transform(
        percentile(col(valueCol), lit(probs.toArray)),
        q => round(q, 6)).as("quantiles"))

  /** Approximate quantiles per group (`approx_percentile`, bounded-state
    * sketch; `accuracy` trades memory for error ≤ 1/accuracy). */
  def approxQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                      probs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCol)
      .agg(approx_percentile(col(valueCol), lit(probs.toArray),
        lit(accuracy)).as("approx_quantiles"))

  /** Exact heavy hitters: top-`k` keys by frequency (ties → key order) —
    * the oracle-able twin of [[cmsTopK]]; one shuffle of the distinct-key
    * counts (map-side combined), then a k-row driver sort via `limit`. */
  def exactTopK(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key").asc)
      .limit(k)

  /** Count-min sketch row hash: deterministic per (row d, key). */
  private[ops] def cmsBucket(d: Int, key: String, width: Int): Int = {
    val h = scala.util.hashing.MurmurHash3.stringHash(
      if (key == null) "" else key, 0x9747b28c + d)
    ((h % width) + width) % width
  }

  /** Count-min sketch typed Aggregator: `depth × width` counters, point
    * increments per row, element-wise merge — O(depth·width) state per
    * PARTITION regardless of key cardinality (the exact twin shuffles
    * every distinct key). Estimates never under-count; over-count is
    * bounded by ≈ e·N/width with probability 1 − e^−depth. */
  final class CmsAgg(depth: Int, width: Int)
    extends org.apache.spark.sql.expressions.Aggregator[String, Array[Long], Array[Long]] {
    def zero: Array[Long] = new Array[Long](depth * width)
    def reduce(b: Array[Long], key: String): Array[Long] = {
      var d = 0
      while (d < depth) { b(d * width + cmsBucket(d, key, width)) += 1; d += 1 }
      b
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    def finish(b: Array[Long]): Array[Long] = b
    def bufferEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    def outputEncoder: org.apache.spark.sql.Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  }

  /** One-pass CMS over a string key column → the flat sketch counters. */
  def cmsSketch(df: DataFrame, keyCol: String,
                depth: Int = 4, width: Int = 1024): Array[Long] = {
    val agg = udaf(new CmsAgg(depth, width))
    df.select(agg(col(keyCol).cast("string")).as("sk"))
      .collect()(0).getSeq[Long](0).toArray
  }

  /** Point estimate from a [[cmsSketch]]: min over the depth rows. */
  def cmsEstimate(sketch: Array[Long], key: String,
                  depth: Int = 4, width: Int = 1024): Long = {
    var best = Long.MaxValue
    var d = 0
    while (d < depth) {
      val v = sketch(d * width + cmsBucket(d, key, width))
      if (v < best) best = v
      d += 1
    }
    best
  }

  /** Approximate top-`k` without EVER shuffling the key space: candidate
    * keys come from a Misra–Gries summary per partition (at most
    * `poolSize` counters each — any key with partition frequency >
    * partition_rows/poolSize is guaranteed to survive its partition),
    * then the candidates (≤ poolSize × partitions strings, collected)
    * are re-scored against the one-pass CMS. This is the standard
    * sketch + candidate-set heavy-hitter shape for key spaces too wide
    * for [[exactTopK]]'s full distinct-key shuffle. */
  def cmsTopK(df: DataFrame, keyCol: String, k: Int,
              depth: Int = 4, width: Int = 1024,
              poolSize: Int = 1024): Seq[(String, Long)] = {
    val sketch = cmsSketch(df, keyCol, depth, width)
    import df.sparkSession.implicits._
    val candidates = df.select(col(keyCol).cast("string")).as[String]
      .mapPartitions { it =>
        // Misra–Gries: bounded counters; decrement-all on overflow is
        // amortized O(1) (each sweep retires >= size count mass)
        val counts = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { key =>
          counts.get(key) match {
            case Some(c) => counts.update(key, c + 1)
            case None if counts.size < poolSize => counts.update(key, 1L)
            case None =>
              counts.toArray.foreach { case (k2, c2) => // snapshot: safe sweep
                if (c2 <= 1L) counts.remove(k2) else counts.update(k2, c2 - 1)
              }
          }
        }
        counts.keysIterator
      }
      // driver collect bound: ≤ poolSize keys per PARTITION survive
      // Misra–Gries, so the candidate pool is at most poolSize × partitions
      // rows after distinct — fine at default 1024×32, but the bound GROWS
      // WITH THE PARTITION COUNT: at 10⁵ partitions it is a 10⁸-key
      // collect. At that scale coalesce the candidate frame (or lower
      // poolSize) first; the sketch estimates are partition-count-free.
      .distinct().collect()
    candidates.map(key => key -> cmsEstimate(sketch, key, depth, width))
      .sortBy { case (key, n) => (-n, key) }
      .take(k).toSeq
  }

  /** EXACT global `ntile(k)` without a single-task global sort.
    *
    * A bare `ntile(k) OVER (ORDER BY …)` is a correctness tool only: the
    * unpartitioned window collapses the whole table into ONE task, which
    * at 100 TB never finishes. This operator gets the identical answer in
    * three parallel stages:
    *
    *   1. one approx-quantile pass picks `nBuckets` range boundaries
    *      (Greenwald–Khanna sketch, bounded state, driver gets ≤ nBuckets
    *      doubles — the only driver traffic);
    *   2. every row is range-bucketed by a codegen'd boundary chain, and
    *      a tiny per-bucket count frame (≤ nBuckets rows) turns into
    *      exact bucket rank offsets via a prefix-sum window;
    *   3. rows rank *within* their bucket (parallel: |buckets| window
    *      tasks), and `offset + within-bucket rank` IS the exact global
    *      rank because bucketing is monotone in the order key. The tile
    *      follows from rank and total count by ntile's fill rule (the
    *      first `n % k` tiles get one extra row).
    *
    * Boundary-approximation error only skews bucket *sizes* (AQE-style
    * balance, not correctness); ties across a boundary land in the same
    * bucket by construction (`value > bound` is strict). Ties in the
    * order column are broken by `tieCol` so the rank — and therefore the
    * tile of every row — is deterministic and engine-portable.
    *
    * Output: input columns + `tile` (1-based long). */
  def exactGlobalNtile(df: DataFrame, orderCol: String, tieCol: String,
                       k: Int, nBuckets: Int = 32): DataFrame = {
    require(k >= 1 && nBuckets >= 1)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.stat.approxQuantile(orderCol, probs, 0.01).distinct.sorted
    // monotone range bucketing: bucket = #bounds strictly below the value
    val bucketCol = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(orderCol) > lit(b), 1).otherwise(0)
    }
    // TWO branches, each with its own scan — deliberate (r17, reverting
    // the r16 "shared bucket exchange"): the r16 explicit repartition
    // both branches referenced was SUPPOSED to let ReuseExchange
    // materialize scan + bucketing once, but column pruning narrows the
    // offsets branch to _gq_bucket only, so the two exchange subtrees
    // are NOT canonically identical and reuse never fired (the r16
    // after-plan still shows two Scan parquet leaves) — while the
    // repartition DID destroy the offsets branch's map-side partial
    // aggregation: every corpus row crossed that new exchange, where
    // this shape shuffles only ~nBuckets count rows per map task
    // (guide §2.3 "aggregate before you shuffle"). Two narrow scans +
    // a tiny aggregate exchange beat one scan + a corpus-wide row
    // shuffle at any scale; the ranking window below keeps its own
    // bucket exchange either way.
    val bucketed = df.withColumn("_gq_bucket", bucketCol)
    val countsW = org.apache.spark.sql.expressions.Window
      .orderBy("_gq_bucket")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = bucketed.groupBy("_gq_bucket")
      .agg(count(lit(1)).as("_gq_n"))
      .withColumn("_gq_offset", coalesce(sum(col("_gq_n")).over(countsW), lit(0L)))
      // BOUNDED GLOBAL WINDOW (≤ nBuckets rows — one per bucket): this and
      // the offsets window above are the source of Verify's
      // "No Partition Defined for Window" warnings; WindowExec warns on an
      // empty partition spec regardless of input size, and these frames
      // are bucket-count-sized by construction. See SCALE.md
      // "Bounded global windows".
      .withColumn("_gq_total", sum(col("_gq_n")).over())
      .select("_gq_bucket", "_gq_offset", "_gq_total")
    val rankW = org.apache.spark.sql.expressions.Window
      .partitionBy("_gq_bucket").orderBy(col(orderCol), col(tieCol))
    val ranked = bucketed
      .join(broadcast(offsets), "_gq_bucket")
      .withColumn("_gq_rank",
        col("_gq_offset") + row_number().over(rankW).cast("long"))
    // ntile fill rule: base = n div k rows per tile, first n%k tiles get
    // +1. Integer `div` (not `/`, which is double division in Spark) so
    // the math is exact at any n; greatest(base,1) keeps the dead ELSE
    // branch ANSI-safe when n < k (then every rank is <= cut = n).
    ranked
      .withColumn("_gq_base", expr(s"_gq_total div $k"))
      .withColumn("_gq_rem", expr(s"_gq_total % $k"))
      .withColumn("_gq_cut", expr("(_gq_base + 1) * _gq_rem"))
      .withColumn("tile", expr(
        "CASE WHEN _gq_rank <= _gq_cut " +
          "THEN (_gq_rank - 1) div (_gq_base + 1) + 1 " +
          "ELSE _gq_rem + (_gq_rank - 1 - _gq_cut) div greatest(_gq_base, 1) + 1 " +
          "END"))
      .drop("_gq_bucket", "_gq_offset", "_gq_total", "_gq_rank",
        "_gq_base", "_gq_rem", "_gq_cut")
  }
}
