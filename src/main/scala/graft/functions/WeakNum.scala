package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Weak-mode full-string numeric parses — the SINGLE source of truth shared
  * by the native walker and both Catalyst paths. `try_cast` would trim
  * whitespace and silently diverge from the reference's parsers, so every
  * path routes through these instead.
  *
  * Token grammar: C++17 `std::from_chars` semantics, the reference's
  * PREFERRED implementation (`internal/double_parser.hpp:50-60`; integer
  * parse analog) applied uniformly to both numeric types:
  *   - no leading/trailing whitespace, no leading '+';
  *   - double: `-?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?`, plus the
  *     from_chars specials `inf`/`infinity`/`nan` (case-insensitive,
  *     optionally '-'-prefixed);
  *   - int64: `-?[0-9]+`, overflow ⇒ unparseable (result_out_of_range).
  *
  * Documented divergence from the reference's FALLBACK paths only: the
  * istringstream int64 path (`basic_adapter.hpp:413,819`) and istringstream
  * double fallback accept leading whitespace and a leading '+' — we follow
  * from_chars on every platform instead of replicating that
  * platform-conditional laxness.
  *
  * Returns null boxes when unparseable (= constraint not applicable). */
object WeakNum {

  private val DoubleToken =
    java.util.regex.Pattern.compile("-?(?:[0-9]+(?:\\.[0-9]*)?|\\.[0-9]+)(?:[eE][+-]?[0-9]+)?")
  private val InfNanToken =
    java.util.regex.Pattern.compile("(-?)(?i:(inf(?:inity)?)|nan)")

  def parseDouble(s: String): java.lang.Double = {
    if (s.isEmpty) return null
    if (DoubleToken.matcher(s).matches()) {
      val v = try java.lang.Double.valueOf(s) catch { case _: NumberFormatException => return null }
      // from_chars reports result_out_of_range — a FAILED parse per the
      // reference (double_parser.hpp: `conversion.ec != std::errc()`) —
      // where Java silently saturates: overflow to ±Infinity, underflow
      // to zero. A weak `maximum` would otherwise fail a row carrying
      // "1e999" that the reference treats as non-numeric and skips.
      // Subnormal results are representable and stay valid; only a
      // nonzero mantissa collapsing to ±0.0 is underflow.
      if (v.isInfinite) return null
      if (v.doubleValue() == 0.0d && {
        val eIdx = { val e = s.indexOf('e'); if (e >= 0) e else s.indexOf('E') }
        val mant = if (eIdx >= 0) s.substring(0, eIdx) else s
        mant.exists(ch => ch >= '1' && ch <= '9')
      }) return null
      return v
    }
    val m = InfNanToken.matcher(s)
    if (m.matches()) {
      if (m.group(2) == null) java.lang.Double.valueOf(Double.NaN) // ±nan is still NaN
      else java.lang.Double.valueOf(
        if (m.group(1) == "-") Double.NegativeInfinity else Double.PositiveInfinity)
    } else null
  }

  def parseLong(s: String): java.lang.Long = {
    val start = if (s.nonEmpty && s.charAt(0) == '-') 1 else 0
    if (s.length == start) return null
    var i = start
    while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
    if (i != s.length) return null
    try java.lang.Long.valueOf(s) catch { case _: NumberFormatException => null }
  }
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
