package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-6 training-mix trio: hard-negative mining (exact + IVF scale
  * path), cluster-balanced sampling over trained k-means cells, and
  * LSH-vs-exact-Jaccard candidate-retrieval quality. */
class TrainingMixSpec extends SparkSpec {
  import spark.implicits._

  // 2-D labeled vectors: id 1 shares the query's label (excluded however
  // similar), ids 2/3/4 carry other labels at descending cosine to (1,0)
  private lazy val labeled = Seq(
    (0L, Seq(1.0f, 0.0f), 0),
    (1L, Seq(1.0f, 0.01f), 0), // most similar but same label
    (2L, Seq(0.9f, 0.1f), 1),
    (3L, Seq(0.0f, 1.0f), 1),  // orthogonal
    (4L, Seq(0.5f, 0.5f), 2)
  ).toDF("vec_id", "embedding", "label")

  test("hardNegatives: same-label neighbors are excluded, rank order is " +
      "cosine desc / id asc") {
    val q = labeled.filter(col("vec_id") === 0)
    val out = Similarity.hardNegatives(labeled, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    // id 1 (label 0) must never appear; expected order 2 (cos .994),
    // 4 (cos .707), 3 (cos 0)
    assert(out === Seq((0L, 2L, 1), (0L, 4L, 2), (0L, 3L, 3)))
  }

  test("hardNegatives: self never scores even against a different label") {
    // query id 3 (label 1): candidates are 0, 1, 4 (labels 0, 0, 2) — never 3
    val q = labeled.filter(col("vec_id") === 3)
    val ids = Similarity.hardNegatives(labeled, q, k = 10)
      .collect().map(_.getLong(1)).toSet
    assert(ids === Set(0L, 1L, 4L)) // label-1 rows (2, 3) excluded
  }

  test("hardNegatives: a NULL label fails loudly on either side instead " +
      "of silently shrinking the negative pool") {
    val nullLabeled = labeled.unionByName(
      Seq((9L, Seq(0.3f, 0.3f))).toDF("vec_id", "embedding")
        .withColumn("label", lit(null).cast("int")))
    val q = labeled.filter(col("vec_id") === 0)
    // corpus-side null: raises from the scoring task with the named message
    val eCorpus = intercept[Exception] {
      Similarity.hardNegatives(nullLabeled, q, k = 3).collect()
    }
    assert(exceptionChain(eCorpus).exists(_.contains("NULL label")), eCorpus)
    // query-side null: trips the collect-time require
    val eQuery = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(labeled,
        nullLabeled.filter(col("vec_id") === 9), k = 3)
    }
    assert(eQuery.getMessage.contains("NULL label"))
    // IVF leg: corpus-side null raises from the label join
    val eIvf = intercept[Exception] {
      Similarity.hardNegativesIvf(nullLabeled, q, k = 3,
        centroidStride = 1, nProbe = 5).collect()
    }
    assert(exceptionChain(eIvf).exists(_.contains("NULL label")), eIvf)
  }

  private def exceptionChain(e: Throwable): Seq[String] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq

  test("hardNegativesIvf at full probe width equals the exact leg") {
    val q = labeled.filter(col("vec_id") === 0)
    val exact = Similarity.hardNegatives(labeled, q, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq
    // stride 1 → every row its own cell; nProbe = 5 probes them all, so
    // recall is 1 and the re-ranked output must match exactly
    val ivf = Similarity.hardNegativesIvf(labeled, q, k = 3, oversample = 2,
        centroidStride = 1, nProbe = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).toSeq
    assert(ivf === exact)
  }

  test("hardNegatives refuses an oversized query-side collect") {
    val v = array(lit(0.1f), lit(0.2f))
    val huge = spark.range(Similarity.BruteForceMaxQueries + 1)
      .select(col("id").as("vec_id"), v.as("embedding"), lit(0).as("label"))
    val e = intercept[IllegalArgumentException] {
      Similarity.hardNegatives(labeled, huge, k = 3)
    }
    assert(e.getMessage.contains("hardNegativesIvf"))
  }

  // two tight clusters (same fixture family as KmeansSpec)
  private lazy val twoClusters = Seq(
    0L -> Seq(0.0f, 0.1f), 1L -> Seq(0.1f, 0.0f),
    2L -> Seq(10.0f, 10.1f), 3L -> Seq(10.1f, 10.0f),
    4L -> Seq(0.1f, 0.1f), 5L -> Seq(9.9f, 9.9f))
    .toDF("vec_id", "embedding")

  test("cellBalancedSample caps each cell at m in Knuth-hash order") {
    val out = Kmeans.cellBalancedSample(twoClusters, m = 2, k = 2,
        iters = 2, centroidStride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // cells are {0,1,4} and {2,3,5} (KmeansSpec pins the assignment);
    // replicate the documented order formula per cell
    def h(id: Long) = ((id % 1000000007L) * 2654435761L) % 1000000007L
    val expected = Seq(Seq(0L, 1L, 4L), Seq(2L, 3L, 5L)).zipWithIndex
      .flatMap { case (members, cell) =>
        members.sortBy(id => (h(id), id)).take(2).zipWithIndex
          .map { case (id, i) => (cell.toLong, id, i + 1) }
      }
    assert(out.sortBy(r => (r._1, r._3)) === expected)
    assert(out.groupBy(_._1).values.forall(_.size <= 2))
  }

  test("cellBalancedSample with m >= cell size returns every member") {
    val out = Kmeans.cellBalancedSample(twoClusters, m = 10, k = 2,
      iters = 2, centroidStride = 2)
    assert(out.count() === 6)
  }

  private lazy val evalDocs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
    (2L, "the quick brown fox leaps over the lazy dog"), // near dup
    (3L, "completely different text about spark engines"),
    (4L, "unrelated prose concerning distributed query planning")
  ).toDF("doc_id", "text")

  test("lshQualityEval metrics reconcile with the component pipelines") {
    val row = Dedup.lshQualityEval(evalDocs, "doc_id", "text",
      n = 3, bands = 4, rows = 2, thresholdPermille = 400,
      maxBucket = 1000, truthMaxBucket = 100).collect()(0)
    val (nc, nt, tp) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // recompute each leg independently
    val cand = Dedup.minhashCandidates(evalDocs, "doc_id", "text",
        n = 3, bands = 4, rows = 2, maxBucket = 1000)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = Dedup.ngramJaccardPairs(evalDocs, "doc_id", "text",
        n = 3, threshold = 0.4, maxBucket = 100)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nc === cand.size.toLong)
    assert(nt === truth.size.toLong)
    assert(tp === cand.intersect(truth).size.toLong)
    assert(truth.contains((0L, 1L)), "exact dup must be ground truth")
    assert(cand.contains((0L, 1L)), "exact dup must be an LSH candidate")
    assert(row.getLong(3) === 1000L * tp / math.max(1L, nc))
    assert(row.getLong(4) === 1000L * tp / math.max(1L, nt))
  }

  test("lshQualityEval: empty legs yield zero per-milles, not nulls") {
    val distinct = Seq((0L, "alpha beta gamma"), (1L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val row = Dedup.lshQualityEval(distinct, "doc_id", "text").collect()(0)
    assert(row.getLong(2) === 0L) // no true positives
    if (row.getLong(0) == 0L) assert(row.getLong(3) === 0L)
    if (row.getLong(1) == 0L) assert(row.getLong(4) === 0L)
  }
}
