package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The sort-free keyed-sum kernel in isolation (the aggregate sibling of
  * [[OccurrenceFilter]] — serving path of the incremental dedup lane's
  * occurrence tables): exact sums against a naive fold, growth across
  * multiple table doublings, hot-key O(1) state, and the
  * weights-as-counts composition the lane uses (count then merge). */
class KeyedSumSpec extends AnyFunSuite {

  private def run(rows: Seq[(Long, Long)]): Map[Long, Long] =
    new KeyedSum()(rows.iterator).toMap

  private def naive(rows: Seq[(Long, Long)]): Map[Long, Long] =
    rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap

  test("matches a naive grouped sum on interleaved keys, negative and " +
    "zero keys/weights included") {
    val rng = new scala.util.Random(11)
    val rows = Seq.tabulate(5000) { _ =>
      // keys include 0 and negatives (xxhash64 output spans all longs);
      // weights include 0 and negatives (merge semantics must not assume
      // positivity even though the lane only feeds counts)
      (rng.nextLong() % 400, rng.nextInt(7).toLong - 2)
    }
    assert(run(rows) === naive(rows))
  }

  test("growth: 300k distinct keys force the table through multiple " +
    "doublings from its 4096 seed, sums exact") {
    val rows = Seq.tabulate(300000)(i => (i * 2654435761L, 1L)) ++
      Seq.tabulate(300000)(i => (i * 2654435761L, 2L))
    val got = run(rows)
    assert(got.size === 300000)
    assert(got.values.forall(_ === 3L))
  }

  test("hot key: 5M rows of ONE key sum in O(1) state (no growth past " +
    "the seed capacity)") {
    val hot = Iterator.fill(5000000)((42L, 1L))
    val got = new KeyedSum()(hot).toMap
    assert(got === Map(42L -> 5000000L))
  }

  test("the lane's composition: count-as-weight-1 then merge-as-weights " +
    "equals a direct count over the union") {
    val a = Seq(1L, 2L, 2L, 3L, 3L, 3L).map((_, 1L))
    val b = Seq(2L, 3L, 4L).map((_, 1L))
    val tableA = run(a).toSeq
    val tableB = run(b).toSeq
    val merged = run(tableA ++ tableB)
    assert(merged === naive((a ++ b)))
  }
}
