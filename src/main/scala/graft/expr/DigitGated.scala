package graft.expr

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear-time evaluation of the SIT dimension's `(?=.*\d)` lookahead
  * family — `\b(?=.*\d)TOKEN\b` and `\b(?=(?:.*\d){1,})TOKEN\b`.
  *
  * In a backtracking engine the unbounded lookahead costs O(distance to
  * end-of-line) at EVERY word boundary, which goes quadratic on long
  * single-line documents: the 500k-doc scale run measured ~0.6 s/doc on
  * 24 KB one-line filler, ~3 orders of magnitude over normal text. But
  * the lookahead's truth value — "a digit occurs at or after this
  * position, before the next newline" — is a precomputable property:
  * one right-to-left pass builds it for the whole document, and within a
  * line it is monotone (once false, false for the rest of the line), so
  * a rejected candidate lets the scan jump straight to the next line.
  * Total cost O(n + matches): hostile single-line documents stop being
  * special.
  *
  * Match-set equivalence with `java.util.regex` on the original pattern
  * (DigitGatedSpec pins it property-style, values + positions +
  * replacement output, both flag profiles):
  *  - the lookahead is zero-width, so the token match and its greediness
  *    are those of the residual `\bTOKEN\b` alone;
  *  - both engines take leftmost matches and resume at match end;
  *  - `.` excludes line terminators, so "digit ahead" is line-local —
  *    exactly what [[DigitGatedKernel.digitAhead]] computes.
  */
object DigitGated {

  // the two shapes that appear in the reference dimension (config.json:
  // SIT_NPI_GENERIC 135, SIT_GENERIC_ID 147, SIT_PASSPORT_GENERIC 172)
  private val Prefixes = Seq(
    "\\b(?=.*\\d)",
    "\\b(?=(?:.*\\d){1,})")

  /** The residual `\bTOKEN\b` pattern when `regex` is digit-gated. */
  def split(regex: String): Option[String] =
    Prefixes.collectFirst {
      case p if regex.startsWith(p) => "\\b" + regex.substring(p.length)
    }
}

object DigitGatedKernel {
  private val cache = new ConcurrentHashMap[(String, Int), Pattern]()
  private def compiled(regex: String, flags: Int): Pattern =
    cache.computeIfAbsent((regex, flags),
      { case (r, f) => Pattern.compile(r, f) })

  /** Line terminators `.` refuses under default (non-DOTALL,
    * non-UNIX_LINES) java.util.regex semantics. */
  private def isTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** `ahead(i)` ⇔ a digit occurs in [i, next line terminator). */
  private[expr] def digitAhead(s: String): Array[Boolean] = {
    val n = s.length
    val ahead = new Array[Boolean](n + 1)
    var i = n - 1
    while (i >= 0) {
      val c = s.charAt(i)
      ahead(i) =
        if (isTerm(c)) false
        else (c >= '0' && c <= '9') || ahead(i + 1)
      i -= 1
    }
    ahead
  }

  /** Shared scan: leftmost residual matches gated by digit-ahead, resume
    * at match end; on rejection skip to the next line (monotonicity). */
  private def scan(s: String, residual: String, flags: Int)
      (onMatch: (Int, Int) => Unit): Unit = {
    if (s.isEmpty) return
    val ahead = digitAhead(s)
    val m = compiled(residual, flags).matcher(s)
    var from = 0
    while (from <= s.length && m.find(from)) {
      val p = m.start()
      if (ahead(p)) {
        onMatch(p, m.end())
        from = math.max(m.end(), p + 1)
      } else {
        // no digit left on this line — jump past its terminator
        var q = p
        while (q < s.length && !isTerm(s.charAt(q))) q += 1
        from = q + 1
      }
    }
  }

  /** All gated matches as (start, end) — validator findall parity. */
  def findAll(s: String, residual: String, flags: Int): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    scan(s, residual, flags)((a, b) => out += ((a, b)))
    out.result()
  }

  def replaceAll(text: UTF8String, residual: String, replacement: String)
      : UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var last = 0
    scan(s, residual, 0) { (a, b) =>
      sb.append(s, last, a).append(replacement)
      last = b
    }
    if (last == 0) text
    else UTF8String.fromString(sb.append(s, last, s.length).toString)
  }

  def countAll(text: UTF8String, residual: String): Int = {
    var n = 0
    scan(text.toString, residual, 0)((_, _) => n += 1)
    n
  }
}

/** `digit_gated_replace(text)` — the linear form of
  * `regexp_replace(text, "\b(?=.*\d)TOKEN\b", repl)`. The replacement is
  * appended LITERALLY (no `$n` backreference expansion — the redaction
  * tokens `[SIT_*]` never contain `$` or `\`). */
case class DigitGatedReplace(child: Expression, residual: String,
    replacement: String) extends UnaryExpression with Serializable {
  override def dataType: DataType = StringType
  override def prettyName: String = "digit_gated_replace"
  override protected def nullSafeEval(input: Any): Any =
    DigitGatedKernel.replaceAll(input.asInstanceOf[UTF8String], residual,
      replacement)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.addReferenceObj("residual", residual, "java.lang.String")
    val rep = ctx.addReferenceObj("replacement", replacement, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.DigitGatedKernel.replaceAll($c, $res, $rep)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `digit_gated_count(text)` — match count of the same gated pattern. */
case class DigitGatedCount(child: Expression, residual: String)
    extends UnaryExpression with Serializable {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "digit_gated_count"
  override protected def nullSafeEval(input: Any): Any =
    DigitGatedKernel.countAll(input.asInstanceOf[UTF8String], residual)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val res = ctx.addReferenceObj("residual", residual, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      s"graft.expr.DigitGatedKernel.countAll($c, $res)")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DigitGatedExprs {
  def replaceCol(text: Column, residual: String, replacement: String): Column =
    GraftColumnBridge.column(DigitGatedReplace(
      GraftColumnBridge.expression(text), residual, replacement))
  def countCol(text: Column, residual: String): Column =
    GraftColumnBridge.column(DigitGatedCount(
      GraftColumnBridge.expression(text), residual))
}
