package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Approximate-aggregate sketches: error bounded against the exact twins
  * on real testdata. */
class SketchesSpec extends SparkSpec {

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

  test("approx distinct within rsd of exact on real keys") {
    val exact = Sketches.exactDistinct(orders, "o_orderpriority", "o_custkey")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = Sketches.approxDistinct(orders, "o_orderpriority", "o_custkey",
      rsd = 0.05)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k).toDouble
      // 3-sigma bound on HLL++ at rsd=0.05
      assert(math.abs(a - n) <= math.max(3.0, 0.15 * n),
        s"$k: approx $a vs exact $n")
    }
  }

  test("approx quantiles within rank tolerance of exact") {
    val probs = Seq(0.25, 0.5, 0.75)
    val exact = Sketches.exactQuantiles(orders, "o_orderpriority",
      "o_totalprice", probs)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val approx = Sketches.approxQuantiles(orders, "o_orderpriority",
      "o_totalprice", probs, accuracy = 10000)
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val (lo, hi) = orders.agg(min("o_totalprice"), max("o_totalprice"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).head
    val range = hi - lo
    exact.foreach { case (k, qs) =>
      qs.zip(approx(k)).foreach { case (e, a) =>
        // approx_percentile guarantees rank error; translate loosely into
        // a value tolerance of 5% of the value range at test cardinality
        assert(math.abs(e - a) <= 0.05 * range, s"$k: $a vs $e")
      }
    }
  }

  test("count-min sketch: never under-counts, error within e*N/width") {
    import spark.implicits._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val tokens = docs.select(
      explode(TextAnalysis.tokensCol(col("text"))).as("token")).cache()
    val n = tokens.count()
    val exact = Sketches.exactTopK(tokens, "token", 50)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (depth, width) = (4, 2048)
    val sketch = Sketches.cmsSketch(tokens, "token", depth, width)
    val bound = math.ceil(math.E * n / width).toLong
    exact.foreach { case (key, c) =>
      val est = Sketches.cmsEstimate(sketch, key, depth, width)
      assert(est >= c, s"$key: CMS $est under-counts exact $c")
      assert(est - c <= bound, s"$key: CMS error ${est - c} > bound $bound")
    }
    // the candidate-set top-k reproduces the exact heavy hitters' keys
    val cms = Sketches.cmsTopK(tokens, "token", 10, depth, width).map(_._1).toSet
    val top = Sketches.exactTopK(tokens, "token", 10)
      .collect().map(_.getString(0)).toSet
    assert((cms intersect top).size >= 8, s"CMS top-10 $cms vs exact $top")
    tokens.unpersist()
  }

  test("exact quantiles interpolate (non-member values possible)") {
    val qs = Sketches.exactQuantiles(
      spark.range(5).selectExpr("'g' AS g", "CAST(id AS DOUBLE) AS v"),
      "g", "v", Seq(0.5, 0.875)).collect()(0).getSeq[Double](1)
    assert(qs == Seq(2.0, 3.5)) // linear interpolation at p*(n-1)
  }

  test("exactGlobalNtile matches the single-task global ntile exactly") {
    import org.apache.spark.sql.expressions.Window
    // heavy ties (v = id % 7) force the tieCol to decide every tile edge;
    // n=1000, k=10 exercises even fill; n=13, k=10 the n%k uneven rule;
    // n=3, k=10 the n<k degenerate branch
    for ((n, k) <- Seq((1000, 10), (13, 10), (3, 10), (97, 8))) {
      val df = spark.range(n).selectExpr("id", "id % 7 AS v")
        .repartition(8) // scattered input: rank must not depend on layout
      val got = Sketches.exactGlobalNtile(df, "v", "id", k, nBuckets = 4)
        .select(col("id").cast("long"), col("tile").cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.range(n).selectExpr("id", "id % 7 AS v")
        .withColumn("tile",
          ntile(k).over(Window.orderBy(col("v"), col("id"))).cast("long"))
        .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
      assert(got == want, s"n=$n k=$k")
    }
  }
}
