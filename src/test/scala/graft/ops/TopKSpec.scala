package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Typed top-K aggregator ≡ window form, with partial aggregation. */
class TopKSpec extends SparkSpec {

  test("aggregator top-k equals the window top-k on real orders") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val viaAgg = TopK.grouped(orders, "o_custkey", "o_orderkey",
      "o_totalprice", k = 3)
      .select("o_custkey", "rank", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val w = org.apache.spark.sql.expressions.Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val viaWindow = orders.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("aggregator plan partially aggregates (no full sort of groups)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val plan = TopK.grouped(orders, "o_custkey", "o_orderkey",
      "o_totalprice", 3).queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate")
      || plan.contains("HashAggregate"), plan.take(1500))
    assert(!plan.contains("Window"), "must not fall back to a window")
  }
}
