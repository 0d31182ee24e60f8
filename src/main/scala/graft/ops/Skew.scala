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

  /** Salted equi-join for a skewed LEFT side against a small-but-not-
    * broadcastable right side: every left row gets a deterministic salt in
    * [0, salts), the right side is replicated once per salt value, and the
    * join key becomes (key, salt) — a hot key's rows spread over `salts`
    * reducers instead of one. Row-identical to `left.join(right, key)`.
    *
    * Use when AQE skew-join can't help: AQE splits oversized partitions of
    * a sort-merge join, but a single key whose rows exceed one partition
    * (or a broadcast-ineligible right side under shuffled-hash join) still
    * funnels through one task without pre-salting. The salt source is a
    * column expression (never rand()) — deterministic and retry-safe. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltSource: Column, salts: Int = 16): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(saltSource), lit(salts)))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}
