package graft.ops

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The ANN driver-collect guards: every codebook/probe/LUT collect must
  * fail LOUDLY (one cheap count, then require) when a fixed stride or an
  * oversized query set would turn it corpus-proportional — never OOM the
  * driver. Companion of the BruteForceMaxQueries test in OpsSpec. */
class SimilarityGuardSpec extends SparkSpec {

  // a corpus one row past the centroid ceiling, with stride 1 so EVERY id
  // becomes a centroid — the fixed-stride-on-a-grown-corpus failure mode
  private def bigCorpus = {
    val v = array((0 until 4).map(i => lit(0.1f * i)): _*)
    spark.range(Similarity.MaxCentroids + 1)
      .select(col("id").as("vec_id"), v.as("embedding"))
  }

  private def smallQ = {
    val v = array((0 until 4).map(i => lit(0.1f * i)): _*)
    spark.range(2).select(col("id").as("vec_id"), v.as("embedding"))
  }

  test("ivfTopK refuses a corpus-proportional codebook collect") {
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(bigCorpus, smallQ, k = 3, centroidStride = 1)
    }
    assert(e.getMessage.contains("stride"),
      s"guard message should name the stride fix: ${e.getMessage}")
  }

  test("ivfPqTopK refuses a corpus-proportional coarse codebook collect") {
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(bigCorpus, smallQ, k = 3, coarseStride = 1)
    }
    assert(e.getMessage.contains("stride"))
  }

  test("pqTopK / ivfPqTopK refuse an oversized query-side collect") {
    val v = array((0 until 4).map(i => lit(0.1f * i)): _*)
    val corpus = spark.range(400).select(col("id").as("vec_id"), v.as("embedding"))
    val hugeQ = spark.range(Similarity.BruteForceMaxQueries + 1)
      .select(col("id").as("vec_id"), v.as("embedding"))
    val e1 = intercept[IllegalArgumentException] {
      Similarity.pqTopK(corpus, hugeQ, k = 3)
    }
    assert(e1.getMessage.contains("query"))
    val e2 = intercept[IllegalArgumentException] {
      Similarity.ivfPqTopK(corpus, hugeQ, k = 3)
    }
    assert(e2.getMessage.contains("query"))
  }

  test("pqEncode refuses an unbounded codebook size k") {
    val v = array((0 until 4).map(i => lit(0.1f * i)): _*)
    val corpus = spark.range(10).select(col("id").as("vec_id"), v.as("embedding"))
    val e = intercept[IllegalArgumentException] {
      Similarity.pqEncode(corpus, m = 2, k = Similarity.MaxCentroids.toInt + 1,
        centroidStride = 1)
    }
    assert(e.getMessage.contains("codebook"))
  }

  test("strideFor keeps any corpus size under the centroid ceiling") {
    for (n <- Seq(1L, 999L, 1024L, 1025L, 500000L, 10000000000L)) {
      val s = Similarity.strideFor(n, targetCentroids = 1024L)
      val centroids = (n + s - 1) / s // ids 0, s, 2s, … < n
      assert(centroids <= 1024L, s"n=$n stride=$s -> $centroids centroids")
      assert(s == 1L || (n + (s - 1) - 1) / (s - 1) > 1024L,
        s"stride $s for n=$n is not minimal")
    }
    intercept[IllegalArgumentException] {
      Similarity.strideFor(100L, targetCentroids = Similarity.MaxCentroids + 1)
    }
  }

  test("round6Fast is bit-identical to the BigDecimal HALF_UP reference " +
    "on boundaries, negatives, zeros, and bulk random values") {
    def ref(d: Double): Double =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rng = new scala.util.Random(11)
    val adversarial = Seq(0.0, -0.0, 1.0, -1.0, 0.1234565, -0.1234565,
      2.5e-6, -2.5e-6, 0.9999995, -0.9999995, 0.5e-6, -0.5e-6,
      1.5e-6, 123456.1234575, 64.0, -64.0, 1e8 + 0.5e-6, 1e10, -1e10,
      4.5e15, 9.9e18, Double.MaxValue, Double.MinPositiveValue)
    val bulk =
      Seq.fill(100000)(rng.nextDouble() * 2 - 1) ++ // cosine range
      Seq.fill(50000)((rng.nextInt(2000001) - 1000000) / 2.0 / 1e6) ++
      Seq.fill(50000)(rng.nextGaussian() * 1e7) // large-dot range
    (adversarial ++ bulk).foreach { d =>
      assert(Similarity.round6Fast(d) == ref(d),
        s"round6Fast diverged from BigDecimal at $d")
    }
  }

  test("semanticDedup: lowest cell-mate wins, cross-cell near-dups are " +
    "the documented blind spot") {
    import spark.implicits._
    // stride 4 → centroids at ids 0 and 4: c0=[1,0,0,0], c4=[0,1,1,0].
    // cells: {0,1,2} (1,2 tie c0/c4 → lowest cid) and {3,4,5,6}.
    val vecs = Seq(
      0L -> Seq(1f, 0f, 0f, 0f),
      1L -> Seq(1f, 1f, 0f, 0f),
      2L -> Seq(1f, 1f, 0f, 0f),     // = v1 → drop, kept_by 1
      3L -> Seq(0f, 1f, 0f, 0f),
      4L -> Seq(0f, 1f, 1f, 0f),
      5L -> Seq(0f, 1f, 1f, 0f),     // = v4 → drop, kept_by 4
      6L -> Seq(1f, 1.01f, 0f, 0f))  // ≈ v2 (cos ~0.99997) but lands in
                                     // the OTHER cell → survives: within-
                                     // cell-only pruning is the SemDeDup
                                     // trade, asserted here on purpose
      .toDF("vec_id", "embedding")
    val got = Similarity.semanticDedup(vecs, threshold = 0.95,
        centroidStride = 4)
      .orderBy("drop_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === Seq((2L, 1L, 1.0), (5L, 4L, 1.0)))
  }

  test("guards stay out of the way at honest parameters") {
    // the in-bounds path still works (q46/q63/q73 cover it at sf scale;
    // this pins it at unit scale right next to the refusal tests)
    val vecs = spark.range(100).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), i =>
        sin(i * (col("id") % 5 + 1) * 0.7).cast("float")).as("embedding"))
    val q = vecs.filter(col("vec_id") % 50 === 0)
    assert(Similarity.ivfTopK(vecs, q, k = 2, centroidStride = 10).count() > 0)
    assert(Similarity.pqTopK(vecs, q, k = 2, m = 2, nCent = 4,
      centroidStride = 10).count() > 0)
  }
}
