package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeaturizeSpec extends SparkSpec {
  import spark.implicits._

  test("hashedCounts: bucket and sign match the documented md5 slicing") {
    val tok = "spark"
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8"))
    val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
    val expectedIdx = (h1 % 64).toInt
    val expectedSign = if ((d(7) & 1) == 0) 1L else -1L
    val counts = Featurize.hashedCounts("Spark SPARK spark", 64)
    assert(counts(expectedIdx) == 3 * expectedSign,
      "three occurrences of one token must land 3·sign in its bucket")
    assert(counts.zipWithIndex.filter(_._2 != expectedIdx).forall(_._1 == 0))
  }

  test("null/empty text featurizes to the zero vector, not nulls") {
    assert(Featurize.hashedCounts(null, 16).forall(_ == 0))
    assert(Featurize.hashedCounts("", 16).forall(_ == 0))
    assert(Featurize.microNormalize(Seq(0L, 0L, 0L), 1000000L)
      .forall(_ == 0))
  }

  test("microNormalize: floor toward -inf on negative components; " +
    "unit-ish norm") {
    val m = Featurize.microNormalize(Seq(3L, -4L), 1000000L)
    // norm 5: 3/5 = .6, -4/5 = -.8 exactly
    assert(m.toSeq == Seq(600000L, -800000L))
    val m2 = Featurize.microNormalize(Seq(1L, 1L), 1000000L)
    // 1/sqrt(2) = 0.7071067811…, floor at micro
    assert(m2.toSeq == Seq(707106L, 707106L))
  }

  test("cosine over micro vectors equals cosine over raw counts " +
    "(scale invariance of the normalization)") {
    def cos(a: Seq[Long], b: Seq[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val ca = Featurize.hashedCounts("spark makes big data small", 32).toSeq
    val cb = Featurize.hashedCounts("spark makes small data big fast", 32).toSeq
    val ma = Featurize.microNormalize(ca, 1000000L).toSeq
    val mb = Featurize.microNormalize(cb, 1000000L).toSeq
    assert(math.abs(cos(ca, cb) - cos(ma, mb)) < 1e-4)
  }

  test("featurized text feeds the vector stack end-to-end: semanticDedup " +
    "finds the planted near-duplicate") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy dog"), // exact clone
      (2L, "completely different subject matter entirely unrelated words"),
      (3L, "spark shuffles partitions across the cluster executors")
    ).toDF("doc_id", "text")
    val vecs = Featurize.featurize(docs, "doc_id", "text", dim = 32)
      .select(col("id").as("vec_id"), col("embedding"))
    val dropped = Similarity.semanticDedup(vecs, threshold = 0.95,
        centroidStride = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dropped.contains((1L, 0L)),
      s"clone 1 must be dropped in favor of 0, got $dropped")
    assert(!dropped.exists(_._1 == 2L), "unrelated doc must survive")
  }
}
