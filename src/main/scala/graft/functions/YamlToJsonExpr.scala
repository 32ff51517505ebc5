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
  * Parsing is SnakeYAML `SafeConstructor` (on the Spark classpath), not
  * Jackson's YAMLMapper: Jackson's readTree does NOT resolve YAML
  * anchors/aliases (`b: *x` silently becomes the literal string "x") nor
  * `<<:` merge keys — both of which yaml-cpp resolves, so documents using
  * them would validate against silently corrupted values. SafeConstructor
  * resolves both, constructs no arbitrary classes, and carries the
  * expansion-bomb limits (max 50 aliases, nesting cap, 3 MB code-point
  * cap); the JSON renderer below adds a depth bound and identity-based
  * cycle detection, since YAML legally expresses self-referencing anchors
  * (`a: &x [*x]`) that would otherwise recurse forever.
  *
  * Contract: NULL in → NULL out (absent document). Unreadable YAML — and
  * any document tripping a bomb guard — passes the ORIGINAL text through
  * unchanged: a string that YAML cannot parse is never valid JSON either
  * (JSON is a YAML subset), so downstream validation reports the uniform
  * parse violation instead of this expression inventing its own error
  * channel. Whole-stage codegen'd. */
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

  // ObjectMapper is thread-safe after config; SnakeYAML Yaml instances are
  // NOT, so they live in a ThreadLocal (executor task threads are pooled)
  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()
  @transient private lazy val yamlLoader =
    new ThreadLocal[org.yaml.snakeyaml.Yaml] {
      override def initialValue(): org.yaml.snakeyaml.Yaml = {
        // LoaderOptions defaults are the bomb guards we want: 50-alias cap
        // (billion-laughs), nesting cap, 3 MB code-point cap, recursive
        // keys disallowed
        val lo = new org.yaml.snakeyaml.LoaderOptions()
        new org.yaml.snakeyaml.Yaml(
          new org.yaml.snakeyaml.constructor.SafeConstructor(lo))
      }
    }

  private val MaxDepth = 512 // matches SpecParser's document walk bound
  // Total rendered-node budget. SnakeYAML's loaded graph SHARES aliased
  // containers (references, not copies), so `load` is cheap even for an
  // exponential alias pyramid — the blowup would happen HERE, re-visiting
  // shared subtrees once per reference: 24 anchors × 2 refs sits under the
  // 50-alias cap yet renders 2^24 leaves (a ~400 MB string from a 1 KB
  // row). The budget turns that into a passthrough parse violation.
  private val MaxNodes = 1 << 21

  /** SnakeYAML object graph → Jackson node, depth-bounded, node-budgeted
    * and cycle-safe: containers on the CURRENT path sit in an identity
    * set, so a self-referencing anchor throws (→ passthrough) instead of
    * recursing forever. Timestamps render as ISO-8601 instants; !!binary
    * as base64 text — both are the canonical JSON spellings of scalars
    * JSON itself lacks. */
  private def toNode(v: Any, depth: Int,
                     path: java.util.IdentityHashMap[AnyRef, AnyRef],
                     budget: Array[Int])
      : com.fasterxml.jackson.databind.JsonNode = {
    import com.fasterxml.jackson.databind.node._
    if (depth > MaxDepth) throw new IllegalStateException("yaml depth bound")
    budget(0) -= 1
    if (budget(0) < 0) throw new IllegalStateException("yaml node budget")
    v match {
      case null                     => NullNode.getInstance()
      case b: java.lang.Boolean     => BooleanNode.valueOf(b)
      case i: java.lang.Integer     => IntNode.valueOf(i)
      case l: java.lang.Long        => LongNode.valueOf(l)
      case bi: java.math.BigInteger => BigIntegerNode.valueOf(bi)
      case d: java.lang.Double      => DoubleNode.valueOf(d)
      case f: java.lang.Float       => DoubleNode.valueOf(f.toDouble)
      case s: String                => TextNode.valueOf(s)
      case bytes: Array[Byte]       => TextNode.valueOf(
        java.util.Base64.getEncoder.encodeToString(bytes))
      case dt: java.util.Date       => TextNode.valueOf(
        java.time.Instant.ofEpochMilli(dt.getTime).toString)
      case m: java.util.Map[_, _] =>
        val ref = m.asInstanceOf[AnyRef]
        if (path.containsKey(ref))
          throw new IllegalStateException("yaml cycle")
        path.put(ref, ref)
        val o = jsonMapper.createObjectNode()
        val it = m.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          o.set(String.valueOf(e.getKey),
            toNode(e.getValue, depth + 1, path, budget))
        }
        path.remove(ref)
        o
      case c: java.util.Collection[_] =>
        val ref = c.asInstanceOf[AnyRef]
        if (path.containsKey(ref))
          throw new IllegalStateException("yaml cycle")
        path.put(ref, ref)
        val a = jsonMapper.createArrayNode()
        val it = c.iterator()
        while (it.hasNext) a.add(toNode(it.next(), depth + 1, path, budget))
        path.remove(ref)
        a
      case other => TextNode.valueOf(String.valueOf(other))
    }
  }

  /** Called from both interpreted eval and generated code. */
  def convert(s: UTF8String): UTF8String = {
    if (s == null) return null
    val text = s.toString
    try {
      val loaded = yamlLoader.get().load[Any](text)
      if (loaded == null && text.trim.isEmpty) s // empty document: pass through
      else UTF8String.fromString(jsonMapper.writeValueAsString(
        toNode(loaded, 0, new java.util.IdentityHashMap[AnyRef, AnyRef](),
          Array(MaxNodes))))
    } catch {
      case scala.util.control.NonFatal(_) => s // unreadable: see contract above
    }
  }

  def yamlToJson(yamlText: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      YamlToJsonExpr(org.apache.spark.sql.GraftSqlBridge.expression(yamlText)))
}
