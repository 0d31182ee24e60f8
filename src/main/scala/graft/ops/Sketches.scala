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
}
