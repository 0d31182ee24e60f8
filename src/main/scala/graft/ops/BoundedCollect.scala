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
  * dropped and replaced by a one-bit overflow flag, so per-group state is
  * O(min(members, max)) at every moment, map-side partials included, and the
  * shuffle never carries an oversized bucket. Overflowed groups finish as
  * NULL — filter `isNotNull` where the old shape filtered `size <= max`.
  *
  * Collection order is whatever partial-merge order produced — callers must
  * not depend on it (the pair generators don't: they `least/greatest` or
  * `array_sort` the result). Same Aggregator-over-udaf idiom as [[TopK]].
  */
object BoundedCollect {

  /** Collected members + overflow flag. `over` drops the items eagerly so
    * an overflowed group holds no member state at all. */
  case class Buf(items: Seq[Long], over: Boolean)
  case class Buf2(items: Seq[(Long, Long)], over: Boolean)

  class Longs(max: Int) extends Aggregator[Long, Buf, Seq[Long]] {
    override def zero: Buf = Buf(Vector.empty, over = false)
    override def reduce(b: Buf, a: Long): Buf =
      if (b.over) b
      else if (b.items.size >= max) Buf(Vector.empty, over = true)
      else Buf(b.items :+ a, over = false)
    override def merge(a: Buf, b: Buf): Buf =
      if (a.over || b.over || a.items.size + b.items.size > max)
        Buf(Vector.empty, over = true)
      else Buf(a.items ++ b.items, over = false)
    override def finish(b: Buf): Seq[Long] = if (b.over) null else b.items
    override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
    override def outputEncoder: Encoder[Seq[Long]] =
      ExpressionEncoder[Seq[Long]]()
  }

  class Pairs(max: Int)
      extends Aggregator[(Long, Long), Buf2, Seq[(Long, Long)]] {
    override def zero: Buf2 = Buf2(Vector.empty, over = false)
    override def reduce(b: Buf2, a: (Long, Long)): Buf2 =
      if (b.over) b
      else if (b.items.size >= max) Buf2(Vector.empty, over = true)
      else Buf2(b.items :+ a, over = false)
    override def merge(a: Buf2, b: Buf2): Buf2 =
      if (a.over || b.over || a.items.size + b.items.size > max)
        Buf2(Vector.empty, over = true)
      else Buf2(a.items ++ b.items, over = false)
    override def finish(b: Buf2): Seq[(Long, Long)] =
      if (b.over) null else b.items
    override def bufferEncoder: Encoder[Buf2] = ExpressionEncoder[Buf2]()
    override def outputEncoder: Encoder[Seq[(Long, Long)]] =
      ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** collect ≤ `max` longs per group, NULL past the cap. */
  def longs(max: Int): UserDefinedFunction = udaf(new Longs(max))

  /** collect ≤ `max` (long, long) structs (fields `_1`/`_2`) per group,
    * NULL past the cap. Call with two columns: `pairs(m)(idCol, valCol)`. */
  def pairs(max: Int): UserDefinedFunction = udaf(new Pairs(max))
}
