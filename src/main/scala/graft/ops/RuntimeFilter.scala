package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Runtime-filter join: build a Bloom filter over the (already filtered)
  * dimension side's join keys and prune the fact side BEFORE its shuffle —
  * the pattern behind warehouse runtime filters / dynamic semi-join
  * reduction, expressed with Spark's own sketch library.
  *
  * Correctness: a Bloom filter has no false negatives, so every matching
  * fact row survives the prefilter; false positives pass through and are
  * removed by the real join — the result is EXACTLY the plain join's
  * (which is what the DuckDB oracle runs). At 100 TB the win is shuffling
  * only the ~selectivity fraction of the fact table that can match,
  * instead of all of it: the filter is a fixed-size bitset shipped once
  * per executor, applied in the scan stage (narrow), where Parquet has
  * already pruned columns.
  */
object RuntimeFilter {

  /** Inner-join `fact` to `dim`, Bloom-pruning `fact(factKey)` against
    * `dim(dimKey)` first. Keys must be integral (long-castable) — the
    * common surrogate/hash key case. `expectedItems` should bound the
    * dim-side distinct count; `fpp` trades bitset size against how many
    * non-matching fact rows slip into the shuffle. */
  def bloomPruneJoin(fact: DataFrame, dim: DataFrame, factKey: String,
                     dimKey: String, expectedItems: Long,
                     fpp: Double = 0.03): DataFrame = {
    val bf = dim.select(col(dimKey).cast("long").as(dimKey))
      .stat.bloomFilter(dimKey, expectedItems, fpp)
    val mightContain = udf { (k: java.lang.Long) =>
      k != null && bf.mightContainLong(k)
    }
    fact.filter(mightContain(col(factKey).cast("long")))
      .join(dim, col(factKey) === col(dimKey))
  }
}
