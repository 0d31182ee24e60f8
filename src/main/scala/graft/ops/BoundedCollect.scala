package graft.ops

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions.udaf

/** Size-limited `collect_list` for the bucket-cap collapses (MinHash bands,
  * SimHash chunks, cosine LSH/IVF cells, cross-corpus bands).
  *
  * The fused-cap shape those pair generators use —
  * `groupBy(key).agg(collect_list(...)).filter(size(...) <= maxBucket)` —
  * keeps the *pair expansion* bounded, but the aggregation buffer itself is
  * not: a degenerate hot key (millions of empty/boilerplate docs sharing one
  * band signature) materializes every member id in ONE collect_list buffer
  * (and in ObjectHashAggregate's sort-based fallback, spills it) before the
  * size filter throws it away — the skew-OOM class the cap exists to guard,
  * re-entering through the guard's own buffer. These aggregators enforce the
  * cap INSIDE the update: once a group passes `max` members its buffer is
  * dropped and replaced by the overflow sentinel, so per-group state is
  * O(min(members, max)) at every moment, map-side partials included, and the
  * shuffle never carries an oversized bucket. Overflowed groups finish as
  * NULL — filter `isNotNull` where the old shape filtered `size <= max`.
  *
  * Buffer representation (r8, after the r7 `case class Buf(Seq[Long], …)`
  * shape measured +20–40% across the pair-generator family — q18/q32/q52/
  * q96): a primitive `Array[Long]` with the member count in slot 0 (−1 =
  * overflowed, no member state retained) and members in slots 1… (`Longs`:
  * one slot each; `Pairs`: two slots, interleaved). reduce/merge mutate and
  * return the input buffer (the Aggregator contract explicitly allows it),
  * append is O(1) amortized via doubling capped at `max`, and
  * `ExpressionEncoder[Array[Long]]` hits Spark's primitive-array fast path
  * when a partial does spill or shuffle — no per-element boxing, no
  * case-class field walk. Unused tail capacity serializes as garbage longs
  * (≤ `max` per buffer) — only spilled/shuffled partials pay it.
  * Measured by the committed artifacts (median-of-3, sf0.1,
  * BENCH_LOCAL_r08.json vs the r7 artifact): the swap returned the
  * family to its pre-cap times — q18 2.45→2.11 s (r6 uncapped: 2.39),
  * q32 2.26→1.48 (r6: 2.16), q96 5.13→3.39 (r6: 3.56). q19 landed at
  * 4.30 in that artifact (r6: 4.52) — the one member whose residual was
  * NOT this buffer (its capBuckets+window inverted-index shape, replaced
  * in r9 by the BoundedCollect-fused collapse in
  * [[graft.ops.Dedup]]`.jaccardPairCounts`; r9 median-of-5 same-host:
  * 3.28 s, with q89 3.01 and q96 3.30 riding the same rewrite).
  * Guidance for future Aggregators: an object buffer through
  * `ExpressionEncoder` of a case class with immutable collections costs
  * tens of percent on collapse-heavy groupBys; prefer a mutable primitive
  * array with an inline size/flag slot whenever the member type allows.
  *
  * Collection order is whatever partial-merge order produced — callers must
  * not depend on it (the pair generators don't: they `least/greatest` or
  * `array_sort` the result). Same Aggregator-over-udaf idiom as [[TopK]].
  */
object BoundedCollect {

  private final val Over = -1L

  private def overflowed(): Array[Long] = Array(Over)

  /** member count of a buffer (−1 = overflowed) — spec observability. */
  private[graft] def bufN(b: Array[Long]): Long = b(0)

  class Longs(max: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](1 + math.min(max, 8))
    override def reduce(b: Array[Long], x: Long): Array[Long] = {
      val n = b(0).toInt
      if (n == Over) b
      else if (n >= max) overflowed()
      else {
        val bb = if (2 + n > b.length)
          java.util.Arrays.copyOf(b, math.min(1 + max, b.length * 2))
        else b
        bb(1 + n) = x
        bb(0) = n + 1
        bb
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val na = a(0).toInt; val nb = b(0).toInt
      if (na == Over || nb == Over || na.toLong + nb > max) overflowed()
      else {
        val out = if (1 + na + nb > a.length)
          java.util.Arrays.copyOf(a, 1 + na + nb)
        else a
        System.arraycopy(b, 1, out, 1 + na, nb)
        out(0) = na + nb
        out
      }
    }
    override def finish(b: Array[Long]): Seq[Long] = {
      val n = b(0).toInt
      if (n == Over) null
      else scala.collection.immutable.ArraySeq.unsafeWrapArray(
        java.util.Arrays.copyOfRange(b, 1, 1 + n))
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  class Pairs(max: Int)
      extends Aggregator[(Long, Long), Array[Long], Seq[(Long, Long)]] {
    override def zero: Array[Long] = new Array[Long](1 + 2 * math.min(max, 8))
    override def reduce(b: Array[Long], a: (Long, Long)): Array[Long] = {
      val n = b(0).toInt
      if (n == Over) b
      else if (n >= max) overflowed()
      else {
        val bb = if (3 + 2 * n > b.length)
          java.util.Arrays.copyOf(b, math.min(1 + 2 * max, b.length * 2 + 1))
        else b
        bb(1 + 2 * n) = a._1
        bb(2 + 2 * n) = a._2
        bb(0) = n + 1
        bb
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      val na = a(0).toInt; val nb = b(0).toInt
      if (na == Over || nb == Over || na.toLong + nb > max) overflowed()
      else {
        val out = if (1 + 2 * (na + nb) > a.length)
          java.util.Arrays.copyOf(a, 1 + 2 * (na + nb))
        else a
        System.arraycopy(b, 1, out, 1 + 2 * na, 2 * nb)
        out(0) = na + nb
        out
      }
    }
    override def finish(b: Array[Long]): Seq[(Long, Long)] = {
      val n = b(0).toInt
      if (n == Over) null
      else (0 until n).map(i => (b(1 + 2 * i), b(2 + 2 * i)))
    }
    override def bufferEncoder: Encoder[Array[Long]] =
      ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** collect ≤ `max` longs per group, NULL past the cap. */
  def longs(max: Int): UserDefinedFunction = udaf(new Longs(max))

  /** collect ≤ `max` (long, long) structs (fields `_1`/`_2`) per group,
    * NULL past the cap. Call with two columns: `pairs(m)(idCol, valCol)`. */
  def pairs(max: Int): UserDefinedFunction = udaf(new Pairs(max))
}
