package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.functions._

/** Deterministic pseudo-randomness for distributed generation.
  *
  * The reference pipeline seeds a single global Mersenne-Twister stream
  * (`modules/meta_generator.py:64`, `modules/content_generator.py:259-262`)
  * which makes every draw depend on all previous draws — unreproducible in a
  * parallel engine. We key every draw on `(key, slot)` instead, via xxHash64:
  * the Column side is Spark's built-in `xxhash64` (codegen'd, ANSI-safe), the
  * Scala side calls the same catalyst `XXH64` kernel, so both produce
  * identical bits. Stable across partitions, tasks and retries; no task-local
  * RNG state.
  */
object DetHash {

  private val Seed = 42L

  /** Same chaining as the SQL function `xxhash64(key, slot)` on two longs. */
  def hash2(key: Long, slot: Long): Long =
    XXH64.hashLong(slot, XXH64.hashLong(key, Seed))

  /** Draw slot `slot` of stream `key`, uniform in [0, bound). */
  def nextInt(key: Long, slot: Long, bound: Int): Int =
    ((hash2(key, slot) >>> 1) % bound).toInt

  /** Uniform in [lo, hi] inclusive. */
  def uniformInt(key: Long, slot: Long, lo: Int, hi: Int): Int =
    lo + nextInt(key, slot, hi - lo + 1)

  /** Percentile draw in [0,100) — used against pmf thresholds. */
  def pct(key: Long, slot: Long): Int = nextInt(key, slot, 100)

  // ---- Column mirrors (bit-identical to the Scala fns) ----

  /** Column version of [[nextInt]] — whole-stage-codegen friendly. */
  def nextIntCol(key: Column, slot: Column, bound: Int): Column =
    (shiftrightunsigned(xxhash64(key.cast("long"), slot.cast("long")), 1)
      % bound).cast("int")

  def uniformIntCol(key: Column, slot: Column, lo: Int, hi: Int): Column =
    lit(lo) + nextIntCol(key, slot, hi - lo + 1)

  def pctCol(key: Column, slot: Column): Column = nextIntCol(key, slot, 100)
}
