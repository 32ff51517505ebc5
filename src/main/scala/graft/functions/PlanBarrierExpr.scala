package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression that is opaque to the OPTIMIZER (guide §4.4's
  * non-determinism trick as a reusable, value-preserving wrapper): the
  * value is exactly the child's, but `deterministic = false` forbids the
  * planner from duplicating the subtree or pushing filters that reference
  * it below its projection.
  *
  * Use on a DERIVED column that is the dominant per-row cost of a query
  * whose input was just re-split for parallelism: without the barrier,
  * predicate pushdown sinks any filter over the column (e.g. the fail-fast
  * `!pass` conjunct) below the repartition exchange to the unsplittable
  * scan, re-serializing exactly the compute the exchange was added to
  * parallelize. Codegen passthrough — zero runtime cost. */
case class PlanBarrierExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable

  // value-preserving; only the planner's freedom to clone/reorder is revoked
  override lazy val deterministic: Boolean = false

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code = childGen.code, isNull = childGen.isNull, value = childGen.value)
  }

  override protected def withNewChildInternal(newChild: Expression): PlanBarrierExpr =
    copy(child = newChild)
}

object PlanBarrierExpr {
  def barrier(c: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PlanBarrierExpr(org.apache.spark.sql.GraftSqlBridge.expression(c)))
}
