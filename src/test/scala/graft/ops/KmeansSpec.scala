package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Lloyd k-means on hand-built vectors: centroids move to the integer
  * member mean, assignments converge to the obvious clusters, ties and
  * empty cells follow the documented rules, and distortion is the
  * scaled-integer L2 to the TRAINED centroid. */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight clusters around [0,0] and [10,10]; init centroids are ids
  // 0 and 2 (stride 2), which start INSIDE different clusters
  private def twoClusters = Seq(
    0L -> Seq(0.0f, 0.1f), 1L -> Seq(0.1f, 0.0f),
    2L -> Seq(10.0f, 10.1f), 3L -> Seq(10.1f, 10.0f),
    4L -> Seq(0.1f, 0.1f), 5L -> Seq(9.9f, 9.9f))
    .toDF("vec_id", "embedding")

  test("kmeansAssign separates two obvious clusters; rollup counts match") {
    val cells = Kmeans.kmeansCells(twoClusters, k = 2, iters = 2,
        centroidStride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(cells === Seq((0L, 3L), (1L, 3L)))
    val assign = Kmeans.kmeansAssign(twoClusters, k = 2, iters = 2,
        centroidStride = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assign === Map(0L -> 0L, 1L -> 0L, 4L -> 0L,
      2L -> 1L, 3L -> 1L, 5L -> 1L))
  }

  test("distortion is the exact scaled-integer L2 to the trained centroid") {
    // one cluster, one centroid: after any rounds the centroid is the
    // integer mean; hand-compute the distortion sum
    val df = Seq(0L -> Seq(0.0f), 1L -> Seq(0.3f), 2L -> Seq(0.6f))
      .toDF("vec_id", "embedding")
    val out = Kmeans.kmeansAssign(df, k = 1, iters = 1, centroidStride = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // scaled: floor(0*1e6)=0, floor(.3f*1e6)=299999 (0.3f≈0.30000001=
    // 300000.01… → floor 300000? compute below), floor(.6f*1e6)
    def s(f: Float): Long = math.floor(f.toDouble * 1e6).toLong
    val xs = Seq(s(0.0f), s(0.3f), s(0.6f))
    val mean = xs.sum / 3 // all positive after offset; offset cancels
    val expected = xs.map(x => (x - mean) * (x - mean))
    assert(out === Map(0L -> expected(0), 1L -> expected(1), 2L -> expected(2)))
  }

  test("an emptied cell keeps its previous centroid (never NaN/collapse)") {
    // both init centroids sit in the left cluster; after round 1 the
    // right cluster captures one centroid or an empty cell keeps its old
    // position — either way k cells remain defined and every vector is
    // assigned
    val df = Seq(
      0L -> Seq(0.0f, 0.0f), 1L -> Seq(0.1f, 0.1f),
      2L -> Seq(0.2f, 0.0f), 3L -> Seq(50.0f, 50.0f))
      .toDF("vec_id", "embedding")
    val out = Kmeans.kmeansAssign(df, k = 2, iters = 3, centroidStride = 1)
      .collect()
    assert(out.length == 4)
    assert(out.map(_.getLong(1)).toSet.subsetOf(Set(0L, 1L)))
  }

  test("oracle SQL generator emits one CTE chain per round plus the final " +
    "assignment") {
    val sql = Kmeans.kmeansOracleSql(k = 4, iters = 3, stride = 10, dim = 8)
    assert(sql.contains("c0 AS") && sql.contains("c3 AS") &&
      sql.contains("a4 AS") && !sql.contains("c4 AS"))
    assert(sql.contains("ORDER BY cell"))
  }
}
