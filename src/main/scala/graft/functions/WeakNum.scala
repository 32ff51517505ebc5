package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Weak-mode full-string numeric parses — the SINGLE source of truth shared
  * by the native walker and both Catalyst paths. `try_cast` would trim
  * whitespace and accept Infinity/NaN, silently diverging from the
  * reference's parsers (`internal/double_parser.hpp` from_chars;
  * istringstream int64), so every path routes through these instead.
  * Returns null boxes when unparseable (= constraint not applicable). */
object WeakNum {

  def parseDouble(s: String): java.lang.Double =
    if (s.isEmpty || !s.forall(c => (c >= '0' && c <= '9') || "+-.eE".indexOf(c) >= 0)) null
    else try java.lang.Double.valueOf(s) catch { case _: NumberFormatException => null }

  def parseLong(s: String): java.lang.Long =
    try java.lang.Long.valueOf(s) catch { case _: NumberFormatException => null }
}

/** Nullable strict-parse expressions (weak-mode only, CodegenFallback is
  * fine — weak typing is an opt-in compatibility mode, not the hot path). */
case class WeakParseDoubleExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"weak_parse_double needs a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    WeakNum.parseDouble(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): WeakParseDoubleExpr =
    copy(child = newChild)
}

case class WeakParseLongExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"weak_parse_long needs a string, got ${child.dataType}")
  override def nullSafeEval(input: Any): Any =
    WeakNum.parseLong(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): WeakParseLongExpr =
    copy(child = newChild)
}

object WeakNum2Col {
  def double(s: Column): Column = org.apache.spark.sql.GraftSqlBridge.column(
    WeakParseDoubleExpr(org.apache.spark.sql.GraftSqlBridge.expression(s)))
  def long(s: Column): Column = org.apache.spark.sql.GraftSqlBridge.column(
    WeakParseLongExpr(org.apache.spark.sql.GraftSqlBridge.expression(s)))
}
