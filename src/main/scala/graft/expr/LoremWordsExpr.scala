package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel for [[LoremWordsExpr]]'s generated code: renders all `n`
  * filler words in ONE compiled loop (xxhash64 draw + table lookup +
  * append), instead of the `transform(sequence(...))` higher-order form
  * that [[TextGen.loremWordsCol]] keeps as its proof twin. The HOF path
  * pays an interpreted lambda per word — per-element expression-tree eval
  * plus a materialized long-sequence array — which profiling showed
  * dominates corpus render time at scale-run word targets (500–4000 words
  * per doc). Bit-identical output: same (key, slotBase + i) DetHash draws
  * over the same wordlist, i in 1..n. */
object LoremWordsKernel {
  private val words: Array[String] = TextGen.Lorem.toArray
  private val size: Int = words.length
  // separator draws live in a disjoint slot band from the word draws
  private val SepSlotBand = 1L << 40

  def render(key: Long, n: Long, slotBase: Long): UTF8String =
    render(key, n, slotBase, prose = false)

  /** `prose = true` breaks the word stream into lines of ~12 words
    * (deterministic per-position draw, same DetHash discipline): real
    * corpora have line structure, and a single multi-kilobyte line is the
    * pathological input for any per-word-boundary regex scan — the scale
    * run showed the reference's `(?=.*\d)`-style SIT lookaheads going
    * quadratic on one-line filler (every boundary rescans to end-of-line).
    * Replacing '\n' with ' ' recovers the plain form bit-for-bit
    * (KernelPropertySpec pins it). */
  def render(key: Long, n: Long, slotBase: Long, prose: Boolean): UTF8String = {
    if (n <= 0L) return UTF8String.EMPTY_UTF8
    // avg lorem word ~7 chars + separator; cap the hint so a hostile n
    // can't pre-allocate unboundedly (the builder grows past it if needed)
    val sb = new java.lang.StringBuilder(math.min(n, 1L << 20).toInt * 8)
    var i = 1L
    while (i <= n) {
      if (i > 1L)
        sb.append(
          if (prose && DetHash.nextInt(key, slotBase + SepSlotBand + i, 12) == 0)
            '\n'
          else ' ')
      sb.append(words(DetHash.nextInt(key, slotBase + i, size)))
      i += 1L
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `lorem_words(key, n, slot_base)` as a native codegen Catalyst
  * expression — §7.4 tier (b). Same contract as [[TextGen.loremWordsCol]]
  * (n ≤ 0 → empty string); [[graft.pipeline.ContentGen]] uses it for the
  * diverse-filler render path (`prose = true` there — line-structured). */
case class LoremWordsExpr(first: Expression, second: Expression,
    third: Expression, prose: Boolean = false)
    extends TernaryExpression with Serializable {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (long, long, long) arguments, got " +
        children.map(_.dataType).mkString(", "))

  override def dataType: DataType = StringType
  override def prettyName: String = "lorem_words"

  override protected def nullSafeEval(key: Any, n: Any, slotBase: Any): Any =
    LoremWordsKernel.render(key.asInstanceOf[Long], n.asInstanceOf[Long],
      slotBase.asInstanceOf[Long], prose)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (k, n, s) =>
      s"graft.expr.LoremWordsKernel.render($k, $n, $s, $prose)")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
