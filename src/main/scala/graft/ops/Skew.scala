package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys: salted two-phase aggregation.
  *
  * A plain `groupBy(key)` on a low-cardinality / power-law key funnels every
  * row of a hot key through one reducer. Salting splits each key into
  * `salts` sub-keys for the first (partial) aggregation, then re-aggregates
  * the per-salt partials — both phases are hash aggregations with map-side
  * combine, and the widest shuffle carries `|keys| × salts` rows instead of
  * one partition per hot key. Results are identical to the unsalted groupBy
  * (the oracle checks exactly that).
  *
  * The salt is derived from a second column (not `rand()`), keeping runs
  * deterministic and retry-safe. AQE's skew-join handling covers joins;
  * this covers aggregations.
  */
object Skew {

  /** count + sum(valueCol) by `keyCol`, salted into `salts` sub-groups. */
  def saltedAgg(df: DataFrame, keyCol: String, saltSource: Column,
                valueCol: Column, salts: Int = 16): DataFrame = {
    val partial = df
      .withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(count(lit(1)).as("_cnt"), sum(valueCol).as("_sum"))
    partial
      .groupBy(col(keyCol))
      .agg(sum(col("_cnt")).as("n"), sum(col("_sum")).as("total"))
  }
}
