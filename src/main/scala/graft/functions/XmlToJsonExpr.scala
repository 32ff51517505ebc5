package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** XML document ingest — the THIRD property-tree wire format (the reference
  * validates boost::property_tree documents via
  * `adapters/property_tree_adapter.hpp`, and `boost::read_xml` is that
  * library's primary format alongside the INI/properties one covered by
  * [[PropsToJsonExpr]]): render an XML text column as canonical JSON text so
  * XML payloads flow through the SAME validation walker — one engine,
  * adapters at the edge.
  *
  * The mapping mirrors how boost's XML parser populates a ptree and how the
  * reference adapter then classifies nodes
  * (`property_tree_adapter.hpp:279-303`):
  *  - an element whose content is ONLY text becomes a STRING leaf (ptree
  *    node data; property trees are untyped — validate the result with
  *    `CompileOptions(strictTypes = false)` just like the properties form);
  *  - an element with neither text nor attributes nor children becomes `[]`
  *    (the adapter's empty-ptree-is-an-ARRAY rule, same file :271-275);
  *  - an element with attributes or child elements becomes an OBJECT:
  *    attributes under an `"<xmlattr>"` member ({name: value}, boost's
  *    exact convention), child elements as members in document order;
  *  - REPEATED same-name children — a ptree multimap shape JSON objects
  *    cannot express — become a JSON ARRAY under that name, in document
  *    order (the standard XML→JSON projection; the reference's object
  *    adapter would resolve lookups to the FIRST occurrence, which is
  *    element 0 here);
  *  - mixed content (text alongside children/attributes) keeps the
  *    concatenated trimmed text under a `"#text"` member.
  *
  * Hostile-input guards, same philosophy as [[YamlToJsonExpr]]: DOCTYPE is
  * disallowed outright (kills both billion-laughs entity expansion and XXE
  * file/URL reads), secure processing is on, and the SAX walk carries an
  * explicit depth bound (512, matching SpecParser/walker caps), a rendered
  * node budget and a text budget — each trips the uniform passthrough
  * contract below instead of OOMing an executor.
  *
  * Contract: NULL in → NULL out. Text that is not well-formed XML — or that
  * trips a guard — passes through UNCHANGED, so downstream validation
  * reports the uniform parse violation (or, if the column actually held
  * JSON, validates it as itself). Whole-stage codegen'd. */
case class XmlToJsonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"xml_to_json requires a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    XmlToJsonExpr.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.XmlToJsonExpr.convert($c);
      ${ev.isNull} = ${ev.value} == null;""")

  override protected def withNewChildInternal(newChild: Expression): XmlToJsonExpr =
    copy(child = newChild)
}

object XmlToJsonExpr {

  @transient private lazy val jsonMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private val MaxDepth = 512       // matches SpecParser's document walk bound
  private val MaxNodes = 65536     // rendered elements+attributes budget
  private val MaxTextChars = 4 << 20 // total character-data budget

  private final class Guard(msg: String) extends RuntimeException(msg) {
    override def fillInStackTrace(): Throwable = this // hot path: no stacks
  }

  // ONE SAXParser per executor thread, reused across rows via reset():
  // constructing a parser (newSAXParser + secure-processing init) costs
  // ~ms — per-ROW construction made the scan ~10x slower than the parse
  // itself. SAXParser is not thread-safe but IS reusable; reset() restores
  // the factory-configured state even after a mid-parse abort (our Guard
  // throws), and the security features live on the FACTORY config, which
  // reset() re-applies — a hostile document cannot un-harden the parser.
  @transient private lazy val saxParser =
    new ThreadLocal[javax.xml.parsers.SAXParser] {
      override def initialValue(): javax.xml.parsers.SAXParser = {
        val f = javax.xml.parsers.SAXParserFactory.newInstance()
        f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
        // no DOCTYPE at all: entity bombs and XXE are unrepresentable
        f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
        f.setFeature("http://xml.org/sax/features/external-general-entities", false)
        f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
        f.setNamespaceAware(false)
        f.setXIncludeAware(false)
        f.newSAXParser()
      }
    }

  /** One element being assembled: member names in document order, repeated
    * names accumulating into arrays, plus its own text buffer. */
  private final class Frame(val name: String) {
    val members = new java.util.LinkedHashMap[String, java.util.ArrayList[
      com.fasterxml.jackson.databind.JsonNode]]()
    val text = new java.lang.StringBuilder()
    var attrs: com.fasterxml.jackson.databind.node.ObjectNode = _
    def add(childName: String, v: com.fasterxml.jackson.databind.JsonNode): Unit = {
      var slot = members.get(childName)
      if (slot == null) {
        slot = new java.util.ArrayList[com.fasterxml.jackson.databind.JsonNode](1)
        members.put(childName, slot)
      }
      slot.add(v)
    }
    /** Collapse per the reference's ptree-node classification. */
    def render(): com.fasterxml.jackson.databind.JsonNode = {
      val t = text.toString.trim
      if (attrs == null && members.isEmpty) {
        if (t.isEmpty) jsonMapper.createArrayNode() // empty ptree → array
        else com.fasterxml.jackson.databind.node.TextNode.valueOf(t)
      } else {
        val o = jsonMapper.createObjectNode()
        if (attrs != null) o.set[com.fasterxml.jackson.databind.JsonNode]("<xmlattr>", attrs)
        val it = members.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue.size() == 1) o.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue.get(0))
          else {
            val arr = jsonMapper.createArrayNode()
            val vit = e.getValue.iterator()
            while (vit.hasNext) arr.add(vit.next())
            o.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, arr)
          }
        }
        if (t.nonEmpty) o.put("#text", t)
        o
      }
    }
  }

  /** Called from both interpreted eval and generated code. */
  def convert(s: UTF8String): UTF8String = {
    if (s == null) return null
    val text = s.toString
    try {
      val root = new Frame("") // virtual parent of the document element
      val stack = new java.util.ArrayDeque[Frame]()
      stack.push(root)
      var nodes = 0
      var chars = 0L
      val handler = new org.xml.sax.helpers.DefaultHandler {
        override def startElement(uri: String, local: String, qName: String,
                                  a: org.xml.sax.Attributes): Unit = {
          if (stack.size() > MaxDepth) throw new Guard("xml depth bound")
          nodes += 1 + a.getLength
          if (nodes > MaxNodes) throw new Guard("xml node budget")
          val f = new Frame(qName)
          if (a.getLength > 0) {
            f.attrs = jsonMapper.createObjectNode()
            var i = 0
            while (i < a.getLength) {
              chars += a.getValue(i).length
              f.attrs.put(a.getQName(i), a.getValue(i)); i += 1
            }
            if (chars > MaxTextChars) throw new Guard("xml text budget")
          }
          stack.push(f)
        }
        override def characters(ch: Array[Char], start: Int, len: Int): Unit = {
          chars += len
          if (chars > MaxTextChars) throw new Guard("xml text budget")
          stack.peek().text.append(ch, start, len)
        }
        override def endElement(uri: String, local: String, qName: String): Unit = {
          val f = stack.pop()
          stack.peek().add(f.name, f.render())
        }
      }
      val parser = saxParser.get()
      try parser.parse(
        new org.xml.sax.InputSource(new java.io.StringReader(text)), handler)
      finally {
        // reset() is optional in JAXP (pre-1.3 impls throw); if it fails,
        // discard the thread's parser so the next call re-creates one —
        // a throw here must never mask a SUCCESSFUL parse (the outer
        // NonFatal catch would silently return the raw text)
        try parser.reset()
        catch { case scala.util.control.NonFatal(_) => saxParser.remove() }
      }
      // well-formed XML has exactly one document element; render it as a
      // one-member object keyed by its tag, matching boost read_xml's ptree
      val doc = jsonMapper.createObjectNode()
      val e = root.members.entrySet().iterator().next()
      doc.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue.get(0))
      UTF8String.fromString(jsonMapper.writeValueAsString(doc))
    } catch {
      case scala.util.control.NonFatal(_) => s // unreadable: see contract above
    }
  }

  def xmlToJson(xmlText: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      XmlToJsonExpr(org.apache.spark.sql.GraftSqlBridge.expression(xmlText)))
}
