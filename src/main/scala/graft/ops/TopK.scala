package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-K as a typed `Aggregator` (A9/W6 at scale).
  *
  * The window form (`row_number().over(partitionBy(g).orderBy(...))`) must
  * shuffle and fully sort every group; this aggregator keeps a bounded
  * K-element buffer per group and participates in *partial* aggregation —
  * map-side state is O(K) per group, the shuffle carries at most K rows per
  * (partition, group), and no full sort ever happens. Identical results to
  * the window (score desc, id asc tie-break), checked in TopKSpec.
  *
  * Measured crossover (sf0.1, local[32]): MANY groups × few rows each
  * (15k customers × ~10 orders, q02) → aggregator wins, 1.1s vs 1.4s —
  * shuffle reduction dominates. FEW groups × many rows (100 queries × 5k
  * scored neighbors, brute-force cosine) → the rank window wins, 1.3s vs
  * 1.6s warm — the udaf's per-row encoder conversion costs more than
  * sorting a hundred cheap partitions. Similarity keeps the window form
  * for that reason; pick per group-cardinality shape.
  */
object TopK {

  type Entry = (Double, Long) // (score, id)

  /** Keep the K best (score desc, id asc) entries. */
  class TopKAggregator(k: Int) extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private def better(a: Entry, b: Entry): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)
    private def prune(s: Seq[Entry]): Seq[Entry] =
      s.sortWith(better).take(k)
    override def zero: Seq[Entry] = Seq.empty
    override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
      if (buf.size < k) prune(buf :+ e)
      else if (better(e, buf.last)) prune(buf :+ e)
      else buf
    override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = prune(a ++ b)
    override def finish(buf: Seq[Entry]): Seq[Entry] = prune(buf)
    override def bufferEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  /** Grouped top-K: (group, rank, id, score) rows, rank 1-based. */
  def grouped(df: DataFrame, groupCol: String, idCol: String,
              scoreCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    df.select(col(groupCol).as("grp"),
      struct(col(scoreCol).cast("double").as("_1"),
        col(idCol).cast("long").as("_2")).as("entry"))
      .groupBy("grp")
      .agg(agg(col("entry._1"), col("entry._2")).as("topk"))
      .select(col("grp"), posexplode(col("topk")).as(Seq("pos", "e")))
      .select(col("grp").as(groupCol), (col("pos") + 1).as("rank"),
        col("e._2").as(idCol), col("e._1").as(scoreCol))
  }
}
