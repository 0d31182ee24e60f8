package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — attach to each left row the latest right row with
  * `right.ts <= left.ts` per key (the temporal enrichment operator Spark
  * lacks natively).
  *
  * Implemented by composition (SURVEY.md §7.4 preference (a), before any
  * custom plan): tag and union both sides, then a single
  * `last(_, ignoreNulls)` running window ordered by (ts, side) per key —
  * right rows sort before left rows at equal timestamps, so the match is
  * inclusive. One shuffle on the key; both inputs stream through one sort.
  * This is the standard log-enrichment shape (trades joins for a union +
  * window; beats a range join whose inequality condition would force a
  * broadcast-nested-loop).
  */
object AsOf {

  /** `left` keeps all its columns; gains `asofCol` = the `valueCol` of the
    * latest right row at-or-before its `tsCol` (null if none). `idCol` on
    * the right breaks exact-timestamp ties deterministically (max id wins). */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, valueCol: String, idCol: String,
               asofCol: String = "asof_value"): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("_rv", lit(null).cast(right.schema(valueCol).dataType))
      .withColumn("_rid", lit(Long.MaxValue))
      .withColumn("_side", lit(1))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol)) ++
        leftCols.filterNot(Seq(keyCol, tsCol).contains)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col(valueCol).as("_rv"), col(idCol).cast("long").as("_rid"),
          lit(0).as("_side"))): _*)
      .select(l.columns.toIndexedSeq.map(col): _*) // align column order
    val w = Window.partitionBy(keyCol)
      .orderBy(col(tsCol), col("_side"), col("_rid"))
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn(asofCol, last(col("_rv"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(col) :+ col(asofCol): _*)
  }
}
