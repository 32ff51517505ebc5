package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Native random-hyperplane LSH signature: ALL plane dot products in one
  * pass over the vector, full whole-stage codegen.
  *
  * Bit-identical to the HOF formulation
  * (`Similarity.hyperplaneSignature`): per plane i, dot = Σ over elements
  * of (float)(v_j * p_j) accumulated in double (zip_with multiplies in
  * FLOAT, the aggregate accumulator widens to double); bit i of the bucket
  * id is set iff dot ≥ 0. The HOF chain evaluates one interpreted
  * `aggregate` pass per plane — planes× the work plus per-element boxing;
  * this is the same custom-Expression escape hatch as [[MinHashExpr]]
  * (SURVEY.md §4), used only because the built-in formulation leaves ~10×
  * on the table for embedding-scale dedup. */
@ExpressionDescription(
  usage = "hyperplane_sig(vec) - sign-bit LSH bucket id against fixed planes")
case class HyperplaneSigExpr(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  require(planes.nonEmpty && planes.length <= 63)

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sig requires array<float>, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    HyperplaneSigExpr.signature(input.asInstanceOf[ArrayData], planes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("graftPlanes", planes, "float[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSigExpr.signature($c, $planesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigExpr =
    copy(child = newChild)
}

object HyperplaneSigExpr {

  /** One pass per plane over the raw ArrayData — no boxing, no
    * intermediate arrays. Called from interpreted eval and codegen. */
  def signature(arr: ArrayData, planes: Array[Array[Float]]): Long = {
    var sig = 0L
    val nElems = arr.numElements()
    var i = 0
    while (i < planes.length) {
      val p = planes(i)
      // ragged input (length != plane dim): the HOF formulation's zip_with
      // null-pads the shorter side, the null element nulls the aggregate, and
      // `null >= 0` leaves the bit unset — mirror that instead of a partial dot
      if (nElems == p.length) {
        val n = p.length
        var acc = 0.0d
        var j = 0
        while (j < n) {
          // float multiply, double accumulate — matches zip_with + aggregate
          acc += (arr.getFloat(j) * p(j)).toDouble
          j += 1
        }
        if (acc >= 0) sig |= 1L << i
      }
      i += 1
    }
    sig
  }

  def hyperplaneSig(vec: Column, planes: Seq[Seq[Float]]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      HyperplaneSigExpr(org.apache.spark.sql.GraftSqlBridge.expression(vec),
        planes.map(_.toArray).toArray))
}
