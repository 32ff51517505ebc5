package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 64-bit SimHash of a (pre-normalized, single-space-tokenized)
  * string: one pass over the UTF-8 bytes, per-token xxhash64 (Spark seed
  * 42) voting each bit ±1 — bit set iff the vote is positive.
  *
  * Bit-identical to the HOF reference `Dedup.simhashOfTokens(split(norm,
  * " "))` (asserted in OpsSpec) but with no token array, no per-bit
  * zip_with allocation, and full whole-stage codegen.
  */
@ExpressionDescription(usage = "simhash(normText) - 64-bit token SimHash")
case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"simhash requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    SimHashExpr.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashExpr.signature($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

object SimHashExpr {

  /** Token boundaries on the literal space byte (0x20) — exactly what
    * `split(norm, " ")` produces on normalized text (whitespace runs were
    * collapsed to single spaces upstream). Empty tokens hash too, matching
    * the HOF reference's behavior on split results. */
  def signature(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes()
    val votes = new Array[Int](64)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.getByte(i) == 0x20) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  def simhash(normText: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHashExpr(org.apache.spark.sql.GraftSqlBridge.expression(normText)))
}
