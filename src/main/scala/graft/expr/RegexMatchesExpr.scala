package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen kernel for [[RegexMatchesExpr]]: operates on UTF8String and
  * returns catalyst ArrayData directly — no Row↔Scala conversion, and the
  * generated code keeps the whole-stage-codegen region intact (a Scala UDF
  * in the same spot forces an object-serialization boundary). Patterns reuse
  * the per-executor compiled cache. */
object RegexMatchKernel {
  def findAll(text: UTF8String, regex: UTF8String): ArrayData = {
    val ms = RegexMatches.findMatches(text.toString, regex.toString)
    new GenericArrayData(ms.map(m => InternalRow(
      UTF8String.fromString(m.value), m.start,
      UTF8String.fromString(m.excerpt))).toArray[Any])
  }
}

/** P2 as a native Catalyst expression: `regex_matches(text, pattern)` →
  * `array<struct<value:string,start:int,excerpt:string>>` (the codegen tier
  * of SURVEY.md §7.4, upgrading the round-1 UDF). Null text/pattern → null;
  * empty pattern → empty array (reference: regex-less SITs never match,
  * `modules/validator.py:53`). */
case class RegexMatchesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = RegexMatchesExpr.OutputType
  override def prettyName: String = "regex_matches"

  override protected def nullSafeEval(text: Any, regex: Any): Any =
    RegexMatchKernel.findAll(text.asInstanceOf[UTF8String],
      regex.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, r) =>
      s"graft.expr.RegexMatchKernel.findAll($t, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object RegexMatchesExpr {
  val OutputType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType),
    StructField("start", IntegerType),
    StructField("excerpt", StringType))))

  /** Column form — usable without any function registration. */
  def regexMatchesNative(text: Column, regex: Column): Column =
    GraftColumnBridge.column(RegexMatchesExpr(
      GraftColumnBridge.expression(text), GraftColumnBridge.expression(regex)))
}
