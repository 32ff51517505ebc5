package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** YAML document ingest — the multi-format-adapter analog (the reference
  * validates YAML documents via `adapters/yaml_cpp_adapter.hpp`; here the
  * adapter boundary is a column conversion): render a YAML text column as
  * canonical JSON text so YAML payloads flow through the SAME validation
  * walker as JSON ones — one engine, adapters at the edge.
  *
  * Contract: NULL in → NULL out (absent document). Unreadable YAML passes
  * the ORIGINAL text through unchanged — a string that YAML cannot parse is
  * never valid JSON either (JSON is a YAML subset), so downstream
  * validation reports the uniform parse violation instead of this
  * expression inventing its own error channel. Whole-stage codegen'd. */
case class YamlToJsonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"yaml_to_json requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    YamlToJsonExpr.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.YamlToJsonExpr.convert($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): YamlToJsonExpr =
    copy(child = newChild)
}

object YamlToJsonExpr {

  // one mapper pair per JVM: ObjectMapper is thread-safe after config
  @transient private lazy val yamlMapper =
    new com.fasterxml.jackson.dataformat.yaml.YAMLMapper()
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Called from both interpreted eval and generated code. */
  def convert(s: UTF8String): UTF8String = {
    if (s == null) return null
    val text = s.toString
    try {
      val node = yamlMapper.readTree(text)
      if (node == null || node.isMissingNode) s // empty document: pass through
      else UTF8String.fromString(jsonMapper.writeValueAsString(node))
    } catch {
      case scala.util.control.NonFatal(_) => s // unreadable: see contract above
    }
  }

  def yamlToJson(yamlText: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      YamlToJsonExpr(org.apache.spark.sql.GraftSqlBridge.expression(yamlText)))
}
