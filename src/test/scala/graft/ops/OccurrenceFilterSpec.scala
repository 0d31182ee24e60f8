package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The sort-free occurrence kernel in isolation: exact filtering against a
  * naive count, interleaved-key replay order, and — the r7 weak-mark fix —
  * the hot-key memory bound: a single key with 10M occurrences must stream
  * through with NO growth of the parked store or count table. The payload
  * is one opaque long (the serving path packs id<<20|pos into it); the
  * tests thread (id, pos) through the same packing to keep the scenarios
  * readable. */
class OccurrenceFilterSpec extends AnyFunSuite {

  private def pack(id: Long, pos: Long): Long = (id << 20) | pos
  private def unpack(v: Long): (Long, Long) = (v >>> 20, v & 0xfffffL)

  private def naive(rows: Seq[(Long, Long, Long)],
                    minOcc: Int): Set[(Long, Long)] = {
    val occ = rows.groupBy(_._1).view.mapValues(_.size).toMap
    rows.filter(r => occ(r._1) >= minOcc).map(r => (r._2, r._3)).toSet
  }

  private def run(rows: Seq[(Long, Long, Long)],
                  minOcc: Int): Seq[(Long, Long)] =
    new OccurrenceFilter(minOcc)(
      rows.iterator.map { case (k, id, pos) => (k, pack(id, pos)) })
      .map(unpack).toSeq

  test("matches a naive count filter on interleaved keys, minOcc 2 and 3") {
    val rng = new scala.util.Random(7)
    // 2000 rows over 300 keys → plenty of 1-, 2-, and many-occurrence keys
    val rows = Seq.tabulate(2000) { i =>
      (rng.nextInt(300).toLong, (i % 37).toLong, i.toLong)
    }
    for (minOcc <- Seq(2, 3, 5)) {
      val got = run(rows, minOcc)
      assert(got.toSet === naive(rows, minOcc), s"minOcc=$minOcc")
      // early emit must not duplicate rows: one output per qualifying
      // input row (pos is unique per row, so sizes compare exactly)
      assert(got.size === rows.count(r =>
        rows.count(_._1 == r._1) >= minOcc), s"minOcc=$minOcc multiplicity")
    }
  }

  test("parked rows flush exactly when the threshold crosses (minOcc=3)") {
    val rows = Seq[(Long, Long, Long)](
      (1L, 10L, 0L), (2L, 20L, 1L), (1L, 11L, 2L),
      (1L, 12L, 3L), // key 1 reaches 3 here → its 3 rows flush now
      (2L, 21L, 4L), (1L, 13L, 5L))
    val f = new OccurrenceFilter(3)
    val it = f(rows.iterator.map { case (k, id, pos) => (k, pack(id, pos)) })
    // nothing emits before the threshold row; the flush replays the
    // parked chain newest-first (LIFO — the frame is unordered, this
    // just pins the kernel's deterministic behavior)
    val got = it.map(unpack).toList
    assert(got === List((11L, 2L), (10L, 0L), (12L, 3L), (13L, 5L)))
    // the store counts ever-parked entries (flushed entries stay as
    // garbage): 2 from key 1 (flushed) + 2 from key 2 (never emitted) —
    // still ≤ minOcc−1 per distinct key, the memory bound
    assert(f.parkedCount === 4)
  }

  test("hot key: 10M occurrences of ONE key stream through with zero " +
    "growth of parked store and count table") {
    val f = new OccurrenceFilter(2)
    val initParked = f.parkedCapacity
    val initTable = f.tableCapacity
    val n = 10000000
    val hot = Iterator.tabulate(n)(i => (42L, i.toLong))
    var count = 0L
    var sumV = 0L
    f(hot).foreach { v => count += 1; sumV += v }
    assert(count === n.toLong) // every row qualifies (occ >= 2)
    assert(sumV === n.toLong * (n - 1) / 2) // all payloads, exactly once
    // the r7 buffered-replay shape parked all 10M rows (≈240 MB of
    // primitive arrays); the early-emit kernel parks exactly ONE row
    assert(f.parkedCount === 1)
    assert(f.parkedCapacity === initParked, "parked store grew on a hot key")
    assert(f.tableCapacity === initTable, "count table grew on a hot key")
  }

  test("hot key embedded in a realistic mix still bounds parked state by " +
    "distinct keys") {
    val f = new OccurrenceFilter(2)
    // 100k distinct singleton keys + one key with 1M occurrences
    val singles = Iterator.tabulate(100000)(i => (1000L + i, i.toLong))
    val hot = Iterator.tabulate(1000000)(i => (7L, i.toLong))
    val out = f(singles ++ hot).size
    assert(out === 1000000)
    // ≤ 1 parked row per distinct key (singletons park forever; hot key 1)
    assert(f.parkedCount === 100001)
    assert(f.parkedCapacity <= (1 << 18)) // next pow2 ≥ 100001, not 1M+
  }
}
