package graft.ops

import graft.SparkSpec

class RecallSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK: hand-counted hits, zero-hit queries kept, floor per-mille") {
    val exact = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L), // q1: 2 of 3 found
      (2L, 20L), (2L, 21L), (2L, 22L), // q2: none found
      (3L, 30L), (3L, 31L), (3L, 32L)) // q3: all found
      .toDF("query_id", "neighbor_id")
    val approx = Seq(
      (1L, 10L), (1L, 12L), (1L, 99L),
      (2L, 98L), (2L, 97L), (2L, 96L),
      (3L, 30L), (3L, 31L), (3L, 32L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 666L), (2L, 0L, 0L), (3L, 3L, 1000L)))
  }

  test("bruteForceTopKAgg is row-identical to the window-ranked " +
    "bruteForceTopK, ties included") {
    import org.apache.spark.sql.functions.col
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = emb.filter(col("vec_id") % 25 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine_sim", "rank")
        .as[(Long, Long, Double, Int)].collect().toSet
    val window = rows(Similarity.bruteForceTopK(emb, queries, k = 5))
    val agg = rows(Similarity.bruteForceTopKAgg(emb, queries, k = 5))
    assert(window == agg,
      s"rank shapes diverge: ${window.diff(agg).take(3)} vs ${agg.diff(window).take(3)}")
  }

  test("recallAtK: duplicate pairs on either side cannot inflate recall") {
    // the operator is public API — a caller whose approx list repeats a
    // (query, neighbor) row must not multiply hits through the join, and a
    // repeated exact row must not double-count; recall stays ≤ 1000‰
    val exact = Seq((1L, 10L), (1L, 10L), (1L, 11L), (1L, 12L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 10L), (1L, 10L), (1L, 11L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(exact, approx, k = 3)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 666L)))
  }
}
