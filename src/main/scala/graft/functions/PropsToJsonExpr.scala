package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Property-tree document ingest — the analog of the reference's
  * `adapters/property_tree_adapter.hpp` (boost::property_tree): render a
  * Java-properties / INI-style text column as canonical JSON text so
  * key=value payloads flow through the SAME validation walker — one engine,
  * adapters at the edge.
  *
  * Semantics mirror what makes property trees property trees:
  *  - line syntax is EXACTLY `java.util.Properties` (`=`/`:`/whitespace
  *    separators, `#`/`!` comments, backslash continuations, unicode
  *    escapes) — the JDK parser is the source of truth;
  *  - dotted keys nest: `a.b.c=5` → `{"a":{"b":{"c":"5"}}}`;
  *  - every leaf is a STRING — property trees are untyped (the reference
  *    adapter exposes all values as strings and relies on weak typing for
  *    numeric bounds; validate the result with
  *    `CompileOptions(strictTypes = false)` for the same behavior);
  *  - a path that is both a scalar and a prefix of deeper keys becomes an
  *    object (structure wins over scalar; keys are folded in sorted order,
  *    so the rule is deterministic regardless of line order).
  *
  * Contract (same as [[YamlToJsonExpr]]): NULL in → NULL out; unreadable
  * text passes through unchanged so downstream validation reports the
  * uniform parse violation. Whole-stage codegen'd. */
case class PropsToJsonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"props_to_json requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    PropsToJsonExpr.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.PropsToJsonExpr.convert($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): PropsToJsonExpr =
    copy(child = newChild)
}

object PropsToJsonExpr {

  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  /** Called from both interpreted eval and generated code. */
  def convert(s: UTF8String): UTF8String = {
    if (s == null) return null
    val text = s.toString
    try {
      val props = new java.util.Properties()
      props.load(new java.io.StringReader(text))
      val root = jsonMapper.createObjectNode()
      // sorted fold: "a" < "a.b", so a scalar is always visited before the
      // deeper keys that convert it to an object — structure wins, and the
      // result is independent of line order (beyond last-wins per full key,
      // which Properties.load already applied)
      val keys = new java.util.TreeSet[String]()
      val it = props.stringPropertyNames().iterator()
      while (it.hasNext) keys.add(it.next())
      val kit = keys.iterator()
      while (kit.hasNext) {
        val key = kit.next()
        val segs = key.split("\\.", -1)
        // explicit depth bound (matches the walker/SpecParser 512 caps): a
        // 100k-segment dotted key would otherwise build a 100k-deep node
        // tree and only fail at the JSON writer's nesting constraint — a
        // Jackson-version-dependent backstop, not a contract
        if (segs.length > 512)
          throw new IllegalStateException("props depth bound")
        var node = root
        var i = 0
        while (i < segs.length - 1) {
          val child = node.get(segs(i))
          node = child match {
            case o: com.fasterxml.jackson.databind.node.ObjectNode => o
            case _ => node.putObject(segs(i)) // scalar (or absent) → object
          }
          i += 1
        }
        if (!node.has(segs.last) || !node.get(segs.last).isObject)
          node.put(segs.last, props.getProperty(key))
      }
      UTF8String.fromString(jsonMapper.writeValueAsString(root))
    } catch {
      case scala.util.control.NonFatal(_) => s // unreadable: see contract above
    }
  }

  def propsToJson(propsText: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      PropsToJsonExpr(org.apache.spark.sql.GraftSqlBridge.expression(propsText)))
}
