package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** JSON Schema (draft 4/7 subset) → [[SchemaSpec]] parser.
  *
  * Mirrors the reference's `SchemaParser::populateSchema`
  * (valijson `schema_parser.hpp:766-1168`): boolean-schema check first
  * (SP:785-804), then keyword dispatch with `type` deliberately first
  * (SP:825-831) and the remaining keywords in the reference's insertion
  * order (SP:833-1149) — that order fixes violation-row ordering.
  * In-document `$ref` (JSON Pointer `#/...`) is resolved with memoization by
  * node path, the analog of `makeOrReuseSchema`'s registry reuse
  * (SP:486-531). Cycles are detected and rejected: a cyclic spec cannot be
  * unrolled into a finite Catalyst expression tree (SURVEY.md §7 hard part
  * 3); transcript specs are acyclic.
  */
object SpecParser {

  private val mapper = new ObjectMapper()

  def parse(json: String): SchemaSpec = parseNode(mapper.readTree(json))

  def parseNode(root: JsonNode): SchemaSpec = {
    val memo = mutable.Map[String, SchemaSpec]()
    val inProgress = mutable.Set[String]()

    def resolvePointer(ptr: String): JsonNode = {
      var node = root
      val segs = ptr.split("/").drop(1) // leading ""
      segs.foreach { raw =>
        val seg = raw.replace("~1", "/").replace("~0", "~")
        node =
          if (node.isArray) node.get(seg.toInt)
          else node.get(seg)
        if (node == null)
          throw new IllegalArgumentException(s"unresolvable JSON Pointer in $$ref: #$ptr")
      }
      node
    }

    def schemaAt(node: JsonNode, path: String): SchemaSpec = {
      // $ref: resolve in-document pointer, memoize by target path
      if (node.isObject && node.has("$ref")) {
        val ref = node.get("$ref").asText()
        if (!ref.startsWith("#"))
          throw new IllegalArgumentException(s"external $$ref not supported offline: $ref")
        val targetPath = ref.stripPrefix("#")
        memo.get(targetPath) match {
          case Some(s) => s
          case None =>
            if (inProgress.contains(targetPath))
              throw new IllegalArgumentException(
                s"cyclic $$ref at $targetPath: cycles cannot compile to finite Catalyst plans")
            inProgress += targetPath
            val s = build(resolvePointer(targetPath), targetPath)
            inProgress -= targetPath
            memo(targetPath) = s
            s
        }
      } else build(node, path)
    }

    def build(node: JsonNode, path: String): SchemaSpec = {
      if (node.isBoolean) return if (node.asBoolean()) TrueSchema else FalseSchema
      if (!node.isObject)
        throw new IllegalArgumentException(s"schema at $path must be an object or boolean")
      val cs = mutable.ArrayBuffer[Constraint]()
      def sub(name: String): Option[JsonNode] = Option(node.get(name))
      def childSchema(n: JsonNode, p: String): SchemaSpec = schemaAt(n, p)

      // type — first (SP:825-831)
      sub("type").foreach { t =>
        def named(s: String): Option[JsonType.Value] = s match {
          case "any" => Some(JsonType.JAny);     case "array" => Some(JsonType.JArray)
          case "boolean" => Some(JsonType.JBoolean); case "integer" => Some(JsonType.JInteger)
          case "null" => Some(JsonType.JNull);   case "number" => Some(JsonType.JNumber)
          case "object" => Some(JsonType.JObject); case "string" => Some(JsonType.JString)
          case _ => None
        }
        if (t.isTextual) cs += TypeC(named(t.asText()).toSet.ensuring(_.nonEmpty, s"unknown type ${t.asText()}"))
        else if (t.isArray) {
          val (names, schemas) = t.elements().asScala.toVector.partition(_.isTextual)
          cs += TypeC(names.flatMap(n => named(n.asText())).toSet,
                      schemas.zipWithIndex.map { case (s, i) => childSchema(s, s"$path/type/$i") })
        }
      }
      // allOf, anyOf, const, contains, dependencies (SP:833-868)
      sub("allOf").foreach { a =>
        cs += AllOfC(a.elements().asScala.zipWithIndex.map { case (s, i) =>
          childSchema(s, s"$path/allOf/$i") }.toVector)
      }
      sub("anyOf").foreach { a =>
        cs += AnyOfC(a.elements().asScala.zipWithIndex.map { case (s, i) =>
          childSchema(s, s"$path/anyOf/$i") }.toVector)
      }
      sub("const").foreach { c => cs += ConstC(jsonValue(c)) }
      sub("contains").foreach { c => cs += ContainsC(childSchema(c, s"$path/contains")) }
      sub("dependencies").foreach { d =>
        val propDeps = mutable.ArrayBuffer[(String, Vector[String])]()
        val schemaDeps = mutable.ArrayBuffer[(String, SchemaSpec)]()
        d.properties().asScala.foreach { e =>
          val (k, v) = (e.getKey, e.getValue)
          if (v.isArray) propDeps += k -> v.elements().asScala.map(_.asText()).toVector
          else schemaDeps += k -> childSchema(v, s"$path/dependencies/$k")
        }
        cs += DependenciesC(propDeps.toVector, schemaDeps.toVector)
      }
      // divisibleBy — draft3 alias of multipleOf (SP:879-897)
      sub("divisibleBy").foreach { m =>
        if (m.isIntegralNumber) cs += MultipleOfIntC(m.asLong())
        else cs += MultipleOfDoubleC(m.asDouble())
      }
      // enum (SP:899)
      sub("enum").foreach { e => cs += EnumC(e.elements().asScala.map(jsonValue).toVector) }
      // extends — draft3: value (or array) of schemas that must also hold
      // (SP:905-911); equivalent to allOf
      sub("extends").foreach { ext =>
        val schemas =
          if (ext.isArray) ext.elements().asScala.zipWithIndex.map { case (s, i) =>
            childSchema(s, s"$path/extends/$i") }.toVector
          else Vector(childSchema(ext, s"$path/extends"))
        cs += AllOfC(schemas)
      }
      // disallow — draft3: must NOT match any listed type/schema
      sub("disallow").foreach { d =>
        val items = if (d.isArray) d.elements().asScala.toVector else Vector(d)
        val subSchemas = items.zipWithIndex.map { case (it, i) =>
          if (it.isTextual) ConstraintSchema(Vector(TypeC(Set(it.asText() match {
            case "any" => JsonType.JAny;     case "array" => JsonType.JArray
            case "boolean" => JsonType.JBoolean; case "integer" => JsonType.JInteger
            case "null" => JsonType.JNull;   case "number" => JsonType.JNumber
            case "object" => JsonType.JObject; case _ => JsonType.JString
          }))))
          else childSchema(it, s"$path/disallow/$i")
        }
        cs += NotC(ConstraintSchema(Vector(AnyOfC(subSchemas))))
      }
      // format (SP:913)
      sub("format").foreach { f => cs += FormatC(f.asText()) }
      // items / additionalItems (SP:919-941)
      sub("items").foreach { it =>
        if (it.isArray) {
          val items = it.elements().asScala.zipWithIndex.map { case (s, i) =>
            childSchema(s, s"$path/items/$i") }.toVector
          val add = sub("additionalItems").map {
            case bnode if bnode.isBoolean =>
              if (bnode.asBoolean()) Some(TrueSchema) else None
            case onode => Some(childSchema(onode, s"$path/additionalItems"))
          }.getOrElse(Some(TrueSchema)) // absent ⇒ empty schema (allow)
          cs += TupleItemsC(items, add)
        } else cs += ItemsC(childSchema(it, s"$path/items"))
      }
      // if/then/else (SP:946-963, draft7)
      sub("if").foreach { ifn =>
        cs += CondC(childSchema(ifn, s"$path/if"),
          sub("then").map(childSchema(_, s"$path/then")),
          sub("else").map(childSchema(_, s"$path/else")))
      }
      // maximum/exclusiveMaximum (SP:966-992; draft7 numeric exclusive*)
      (sub("maximum"), sub("exclusiveMaximum")) match {
        case (_, Some(em)) if em.isNumber => cs += MaximumC(em.asDouble(), exclusive = true)
          sub("maximum").foreach(m => cs += MaximumC(m.asDouble(), exclusive = false))
        case (Some(m), Some(em)) if em.isBoolean =>
          cs += MaximumC(m.asDouble(), exclusive = em.asBoolean())
        case (Some(m), None) => cs += MaximumC(m.asDouble(), exclusive = false)
        case _ =>
      }
      sub("maxItems").foreach { n => cs += MaxItemsC(n.asLong()) }
      sub("maxLength").foreach { n => cs += MaxLengthC(n.asLong()) }
      sub("maxProperties").foreach { n => cs += MaxPropertiesC(n.asLong()) }
      (sub("minimum"), sub("exclusiveMinimum")) match {
        case (_, Some(em)) if em.isNumber => cs += MinimumC(em.asDouble(), exclusive = true)
          sub("minimum").foreach(m => cs += MinimumC(m.asDouble(), exclusive = false))
        case (Some(m), Some(em)) if em.isBoolean =>
          cs += MinimumC(m.asDouble(), exclusive = em.asBoolean())
        case (Some(m), None) => cs += MinimumC(m.asDouble(), exclusive = false)
        case _ =>
      }
      sub("minItems").foreach { n => cs += MinItemsC(n.asLong()) }
      sub("minLength").foreach { n => cs += MinLengthC(n.asLong()) }
      sub("minProperties").foreach { n => cs += MinPropertiesC(n.asLong()) }
      // multipleOf (SP:1051-1065): integer node → int constraint, else double
      sub("multipleOf").foreach { m =>
        if (m.isIntegralNumber) cs += MultipleOfIntC(m.asLong())
        else cs += MultipleOfDoubleC(m.asDouble())
      }
      sub("not").foreach { n => cs += NotC(childSchema(n, s"$path/not")) }
      sub("oneOf").foreach { a =>
        cs += OneOfC(a.elements().asScala.zipWithIndex.map { case (s, i) =>
          childSchema(s, s"$path/oneOf/$i") }.toVector)
      }
      sub("pattern").foreach { p => cs += PatternC(p.asText()) }
      // properties / patternProperties / additionalProperties (SP:1086-1107)
      if (node.has("properties") || node.has("patternProperties") || node.has("additionalProperties")) {
        val props = sub("properties").map(_.properties().asScala.map { e =>
          e.getKey -> childSchema(e.getValue, s"$path/properties/${e.getKey}")
        }.toVector).getOrElse(Vector.empty)
        val patProps = sub("patternProperties").map(_.properties().asScala.map { e =>
          e.getKey -> childSchema(e.getValue, s"$path/patternProperties/${e.getKey}")
        }.toVector).getOrElse(Vector.empty)
        val add: Option[SchemaSpec] = sub("additionalProperties") match {
          case Some(bn) if bn.isBoolean => if (bn.asBoolean()) Some(TrueSchema) else None
          case Some(on)                 => Some(childSchema(on, s"$path/additionalProperties"))
          case None                     => Some(TrueSchema) // absent ⇒ empty schema (SP:2425-2429)
        }
        cs += PropertiesC(props, patProps, add)
      }
      sub("propertyNames").foreach { p => cs += PropertyNamesC(childSchema(p, s"$path/propertyNames")) }
      sub("required").foreach { r => cs += RequiredC(r.elements().asScala.map(_.asText()).toVector) }
      sub("uniqueItems").foreach { u => if (u.asBoolean()) cs += UniqueItemsC }

      ConstraintSchema(cs.toVector,
        id = sub("$id").orElse(sub("id")).map(_.asText()),
        title = sub("title").map(_.asText()))
    }

    val res = schemaAt(root, "")
    res
  }

  /** Freeze a JSON constant (FrozenValue analog,
    * `internal/frozen_value.hpp:22-49`). */
  def jsonValue(n: JsonNode): JsonValue =
    if (n.isNull) JNullV
    else if (n.isBoolean) JBoolV(n.asBoolean())
    else if (n.isIntegralNumber) JLongV(n.asLong())
    else if (n.isNumber) JDoubleV(n.asDouble())
    else if (n.isTextual) JStringV(n.asText())
    else if (n.isArray) JArrayV(n.elements().asScala.map(jsonValue).toVector)
    else JObjectV(n.properties().asScala.map(e => e.getKey -> jsonValue(e.getValue)).toMap)
}
