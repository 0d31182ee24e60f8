package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The compiled hyperplane-LSH bucket kernel vs its interpreted
  * aggregate/zip_with Column twin (finding 21's allocator class): buckets
  * must be BIT-identical — the dot's FP fold order is part of the
  * contract (the q25 oracle re-derives the same arithmetic in SQL) — and
  * the twin's null/length edge semantics must hold exactly. */
class LshBucketSpec extends SparkSpec {
  import spark.implicits._

  test("kernel == twin on random vectors (float and double sources), " +
    "all tables, bit-identical") {
    val rng = new scala.util.Random(23)
    val vecs = Seq.tabulate(300)(id =>
      (id.toLong, Seq.fill(64)(rng.nextFloat() * 2 - 1)))
    val df = vecs.toDF("id", "vec")
    for (t <- 0 until 3; nBits <- Seq(6, 8, 16)) {
      val rows = df.select(
        Similarity.lshBucketCol(col("vec"), nBits, 64, t).as("k"),
        Similarity.lshBucketColExpr(col("vec"), nBits, 64, t).as("h"))
        .collect()
      rows.foreach(r => assert(r.getLong(0) === r.getLong(1),
        s"t=$t nBits=$nBits"))
    }
  }

  test("edge semantics match the twin: null vector, wrong length, null " +
    "element all bucket to 0") {
    val df = Seq(
      (1L, null.asInstanceOf[Seq[java.lang.Double]]),
      (2L, Seq[java.lang.Double](1.0, 2.0)), // length 2 != dim 64
      (3L, (Seq.fill[java.lang.Double](63)(1.0) :+
        null.asInstanceOf[java.lang.Double]))
    ).toDF("id", "vec")
    val rows = df.select(col("id"),
      Similarity.lshBucketCol(col("vec")).as("k"),
      Similarity.lshBucketColExpr(col("vec")).as("h")).collect()
    rows.foreach { r =>
      assert(r.getLong(1) === 0L, s"id=${r.getLong(0)}")
      assert(r.getLong(2) === 0L, s"id=${r.getLong(0)} twin")
    }
  }
}
