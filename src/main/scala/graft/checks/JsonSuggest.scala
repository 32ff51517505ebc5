package graft.checks

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.spec._

/** Constraint suggestion for SEMI-STRUCTURED payload columns — schema
  * induction over a JSON string column (the per-tool `arguments` shape of
  * agent transcripts), the JSON-document counterpart of [[Suggest]]'s
  * typed-column profiler. The reference has no analog (valijson consumes a
  * hand-written schema); the public-art precedent is Deequ-style
  * suggestion plus Spark's own variant schema induction.
  *
  * Three scans, each skew-safe at 100 TB:
  *
  *  1. `schema_of_variant_agg(try_parse_json(col))` — Spark's built-in
  *     merged-schema aggregate (partial aggregation map-side, one string
  *     out). Mixed-type fields widen exactly as variant does: numeric
  *     kinds widen to DECIMAL/DOUBLE ("number"), irreconcilable kinds
  *     merge to VARIANT (profiled for presence only).
  *  2. ONE `df.agg` of associative partials over every induced path:
  *     presence counts (via `to_json(variant_get(...))`, which cleanly
  *     separates absent → SQL NULL from JSON null → "null"), numeric
  *     bounds, string code-point length bounds, array size bounds.
  *  3. String-leaf enum candidacy: the same melt→(path,value) hash-agg
  *     shape as [[Suggest]] — never a per-path collect_set buffer.
  *
  * Invalid-JSON rows parse to NULL (`try_parse_json`) and are excluded
  * from every rule — a profiler must not crash on dirty corpora; validate
  * with a `type` constraint to surface them.
  *
  * Suggested keywords per JSON-pointer path: `type`, `required` (field
  * present in every document where its PARENT object is present),
  * `minimum`/`maximum`, `minLength`/`maxLength`, `minItems`/`maxItems`,
  * `enum`. [[toSchema]] rebuilds the nested spec, which compiles on all
  * three execution paths; JsonSuggestSpec asserts the round-trip (the
  * suggested schema validates its own source with zero violations).
  */
object JsonSuggest {

  // ---- variant schema-string mini-parser -----------------------------------
  // schema_of_variant_agg renders OBJECT<`name`: TYPE, ...>, ARRAY<TYPE>,
  // and SQL scalar names (BIGINT, DECIMAL(p,s), DOUBLE, STRING, BOOLEAN,
  // VOID, VARIANT, DATE, TIMESTAMP...). Names quote with backticks when
  // non-identifier (`` escapes a literal backtick).

  sealed trait VType
  final case class VObject(fields: Vector[(String, VType)]) extends VType
  final case class VArray(elem: VType) extends VType
  final case class VScalar(sql: String) extends VType

  private[graft] def parseVariantSchema(s: String): VType = {
    val p = new SchemaParser(s)
    val t = p.parseType()
    p.skipWs()
    require(p.atEnd, s"trailing garbage in variant schema: $s")
    t
  }

  private final class SchemaParser(s: String) {
    private var i = 0
    def atEnd: Boolean = i >= s.length
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1

    def parseType(): VType = {
      skipWs()
      if (s.startsWith("OBJECT<", i)) {
        i += 7
        val fields = Vector.newBuilder[(String, VType)]
        skipWs()
        if (s.charAt(i) == '>') { i += 1; return VObject(Vector.empty) }
        var more = true
        while (more) {
          val name = parseName()
          skipWs()
          require(s.charAt(i) == ':', s"expected ':' at $i in: $s"); i += 1
          fields += name -> parseType()
          skipWs()
          if (s.charAt(i) == ',') { i += 1 } else more = false
        }
        require(s.charAt(i) == '>', s"expected '>' at $i in: $s"); i += 1
        VObject(fields.result())
      } else if (s.startsWith("ARRAY<", i)) {
        i += 6
        val e = parseType()
        skipWs()
        require(s.charAt(i) == '>', s"expected '>' at $i in: $s"); i += 1
        VArray(e)
      } else {
        // scalar: runs to the next ',' or '>' at this nesting level;
        // DECIMAL(p,s) carries parens but no angle brackets
        val start = i
        var depth = 0
        while (i < s.length && (depth > 0 || (s.charAt(i) != ',' && s.charAt(i) != '>'))) {
          if (s.charAt(i) == '(') depth += 1
          if (s.charAt(i) == ')') depth -= 1
          i += 1
        }
        VScalar(s.substring(start, i).trim)
      }
    }

    private def parseName(): String = {
      skipWs()
      if (s.charAt(i) == '`') {
        i += 1
        val sb = new StringBuilder
        var done = false
        while (!done) {
          val c = s.charAt(i)
          if (c == '`') {
            if (i + 1 < s.length && s.charAt(i + 1) == '`') { sb += '`'; i += 2 }
            else { i += 1; done = true }
          } else { sb += c; i += 1 }
        }
        sb.toString
      } else {
        val start = i
        while (i < s.length && s.charAt(i) != ':' && !s.charAt(i).isWhitespace) i += 1
        s.substring(start, i)
      }
    }
  }

  /** JSON type name for a leaf, per the scalar profiler's vocabulary;
    * None = mixed/unprofilable (VARIANT, exotic SQL kinds). VOID (a field
    * observed ONLY as JSON null) is the JSON `null` type. */
  private def jsonTypeOf(t: VType): Option[String] = t match {
    case VObject(_) => Some("object")
    case VArray(_)  => Some("array")
    case VScalar(sql) =>
      val u = sql.toUpperCase
      if (u == "BIGINT") Some("integer")
      else if (u == "DOUBLE" || u == "FLOAT" || u.startsWith("DECIMAL")) Some("number")
      else if (u == "STRING") Some("string")
      else if (u == "BOOLEAN") Some("boolean")
      else if (u == "VOID") Some("null")
      else None
  }

  // ---- path machinery ------------------------------------------------------

  /** One profiled node of the induced tree. Pointer is a JSON pointer
    * (`""` = root, `/a/b` nested); `parent` is the parent node's pointer
    * (None for root). */
  final case class PathProfile(pointer: String,
                               parent: Option[String],
                               jsonType: Option[String],
                               present: Long,
                               parentPresent: Long,
                               jsonNulls: Long,
                               numMin: Option[JsonValue],
                               numMax: Option[JsonValue],
                               lenMin: Option[Long],
                               lenMax: Option[Long],
                               itemsMin: Option[Long],
                               itemsMax: Option[Long],
                               enumValues: Option[Vector[(String, String)]],
                               format: Option[String] = None)

  private final case class Node(pointer: String, parent: Option[String],
                                vpath: Option[String], t: VType)

  /** Variant-get path for a field chain; identifier-safe keys use dot
    * form, others one of the bracket forms. Spark's variant path grammar
    * has NO quote escapes (bracket-key content is `[^']*` resp. `[^"]*`),
    * but it offers BOTH quote kinds: `['...']` for quote-free keys and
    * `["..."]` for keys carrying a single quote (apostrophes are common
    * in real tool-argument payloads). None — unaddressable — only for
    * keys with control characters or with BOTH quote kinds. */
  private def vpathSegment(key: String): Option[String] =
    if (key.nonEmpty && key.head.isLetter && key.forall(c => c.isLetterOrDigit || c == '_'))
      Some("." + key)
    else if (key.exists(c => c < ' ')) None
    else if (!key.contains('\'')) Some("['" + key + "']")
    else if (!key.contains('"')) Some("[\"" + key + "\"]")
    else None

  private def pointerSegment(key: String): String =
    "/" + key.replace("~", "~0").replace("/", "~1")

  /** Flatten the induced tree into nodes (root first, parents before
    * children). Arrays are leaves here — element profiling would need an
    * explode scan per nesting level; sizes are profiled, elements are not
    * (documented). */
  private def flatten(root: VType): Vector[Node] = {
    val out = Vector.newBuilder[Node]
    def walk(pointer: String, parent: Option[String], vpath: Option[String],
             t: VType): Unit = {
      out += Node(pointer, parent, vpath, t)
      t match {
        case VObject(fields) => fields.foreach { case (k, ft) =>
          walk(pointer + pointerSegment(k), Some(pointer),
            for (vp <- vpath; seg <- vpathSegment(k)) yield vp + seg, ft)
        }
        case _ => ()
      }
    }
    walk("", None, Some("$"), root)
    out.result()
  }

  // ---- profiling -----------------------------------------------------------

  /** Shared profiling core: one scan-2 agg and one scan-3 enum melt for
    * ANY set of row groups (the whole frame, or one group per dispatch
    * key). Each group carries its induced node tree and an optional gate
    * predicate; gated stat columns are NULL outside the group, so count/
    * min/max see only the group's rows and the whole thing stays a single
    * associative-partial aggregation regardless of group count. */
  private def profileCore(df: DataFrame, v: Column,
                          groups: Seq[(String, Option[Column], Vector[Node])],
                          opts: Suggest.Options): Map[String, Seq[PathProfile]] = {
    if (groups.isEmpty) return Map.empty
    def tagOf(gi: Int, ni: Int) = s"g${gi}_n$ni"

    // scan 2: presence + typed bounds for every addressable node, ONE agg
    val aggs = Seq.newBuilder[Column]
    for (((_, gateOpt, nodes), gi) <- groups.zipWithIndex;
         (n, ni) <- nodes.zipWithIndex if n.vpath.isDefined) {
      val tag = tagOf(gi, ni)
      def gate(c: Column): Column = gateOpt.map(g => when(g, c)).getOrElse(c)
      // absent → NULL; JSON null → the string "null" (still "present")
      val pres = gate(to_json(variant_get(v, n.vpath.get, "variant")))
      aggs += count(pres).as(s"p__$tag")
      // JSON null is PRESENT (required passes) but fails a bare type/enum
      // constraint — tracked so the rules stay round-trip-safe
      aggs += count(when(pres === "null", 1)).as(s"nul__$tag")
      n.t match {
        case VScalar(sql) =>
          val u = sql.toUpperCase
          if (u == "BIGINT") {
            val c = gate(try_variant_get(v, n.vpath.get, "bigint"))
            aggs += min(c).as(s"min__$tag") += max(c).as(s"max__$tag")
          } else if (u == "DOUBLE" || u == "FLOAT" || u.startsWith("DECIMAL")) {
            val c = gate(try_variant_get(v, n.vpath.get, "double"))
            aggs += min(c).as(s"min__$tag") += max(c).as(s"max__$tag")
          } else if (u == "STRING") {
            val sc = try_variant_get(v, n.vpath.get, "string")
            val c = gate(length(sc))
            aggs += min(c).as(s"lmin__$tag") += max(c).as(s"lmax__$tag")
            if (opts.detectFormats)
              Suggest.FormatPriority.zipWithIndex.foreach { case (f, fi) =>
                aggs += count(gate(when(graft.functions.FormatCheckExpr.check(
                  sc, f, strictDateTime = false), 1))).as(s"fmt${fi}__$tag")
              }
          }
        case VArray(_) =>
          val c = gate(size(try_variant_get(v, n.vpath.get, "array<variant>")))
          aggs += min(c).as(s"imin__$tag") += max(c).as(s"imax__$tag")
        case VObject(_) => () // presence only; children carry the stats
      }
    }
    val built = aggs.result()
    val row: Row = df.agg(built.head, built.tail: _*).head()
    def opt[T](field: String): Option[T] = {
      val i = row.fieldIndex(field)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    def optNum(field: String): Option[Long] = opt[Any](field).map {
      case i: Int => i.toLong; case l: Long => l
      case other => other.toString.toLong
    }
    val present: Map[String, Long] = (for {
      ((_, _, nodes), gi) <- groups.zipWithIndex
      (n, ni) <- nodes.zipWithIndex if n.vpath.isDefined
    } yield tagOf(gi, ni) -> opt[Long](s"p__${tagOf(gi, ni)}").getOrElse(0L)).toMap

    // scan 3: enum candidacy for string leaves across ALL groups (same
    // melt shape as Suggest; labels are the per-group node tags)
    val stringPairs = for {
      ((_, gateOpt, nodes), gi) <- groups.zipWithIndex
      (n, ni) <- nodes.zipWithIndex
      if n.vpath.isDefined && jsonTypeOf(n.t).contains("string")
      if present.getOrElse(tagOf(gi, ni), 0L) > 0
    } yield {
      val c = try_variant_get(v, n.vpath.get, "string")
      tagOf(gi, ni) -> gateOpt.map(g => when(g, c)).getOrElse(c)
    }
    val enumVals: Map[String, Vector[(String, String)]] =
      if (stringPairs.isEmpty) Map.empty
      else Suggest.enumCandidates(df, stringPairs,
        tag => present.getOrElse(tag, 0L), opts)._2

    groups.zipWithIndex.map { case ((label, _, nodes), gi) =>
      val tagByPointer: Map[String, String] = nodes.zipWithIndex
        .filter(_._1.vpath.isDefined)
        .map { case (n, ni) => n.pointer -> tagOf(gi, ni) }.toMap
      def presentAt(pointer: String): Long =
        tagByPointer.get(pointer).map(present.getOrElse(_, 0L)).getOrElse(0L)
      // a group whose root was never present has no evidence at all —
      // an all-invalid/all-NULL corpus induces "VOID" with zero presence
      val profiles: Seq[PathProfile] =
        if (presentAt("") == 0L) Seq.empty
        else nodes.zipWithIndex.map { case (n, ni) =>
          if (n.vpath.isEmpty) {
            // unaddressable key (quote/control chars): NO suggestions —
            // with no presence scan we cannot know whether the field
            // carries JSON nulls, and a bare type row would break the
            // round-trip invariant on a null-bearing path
            PathProfile(n.pointer, n.parent, None, 0L,
              n.parent.map(presentAt).getOrElse(0L),
              0L, None, None, None, None, None, None, None)
          } else {
            val tag = tagOf(gi, ni)
            val (numMin, numMax) = n.t match {
              case VScalar(sql) if sql.equalsIgnoreCase("BIGINT") =>
                (optNum(s"min__$tag").map(JLongV), optNum(s"max__$tag").map(JLongV))
              case VScalar(sql) if jsonTypeOf(VScalar(sql)).contains("number") =>
                (opt[Double](s"min__$tag").map(JDoubleV),
                 opt[Double](s"max__$tag").map(JDoubleV))
              case _ => (None, None)
            }
            val nulls = opt[Long](s"nul__$tag").getOrElse(0L)
            // read back only the fields this node's type aggregated
            val (lenMin, lenMax) = n.t match {
              case VScalar(sql) if sql.equalsIgnoreCase("STRING") =>
                (optNum(s"lmin__$tag"), optNum(s"lmax__$tag"))
              case _ => (None, None)
            }
            val (itemsMin, itemsMax) = n.t match {
              case VArray(_) => (optNum(s"imin__$tag"), optNum(s"imax__$tag"))
              case _ => (None, None)
            }
            // format: every STRING occurrence passes the engine's own
            // check (JSON nulls excluded — FormatC passes non-strings, so
            // the round-trip stays safe either way)
            val fmt = n.t match {
              case VScalar(sql) if sql.equalsIgnoreCase("STRING") && opts.detectFormats =>
                val strs = present.getOrElse(tag, 0L) - nulls
                if (strs <= 0) None
                else Suggest.FormatPriority.zipWithIndex.collectFirst {
                  case (f, fi) if opt[Long](s"fmt${fi}__$tag").getOrElse(0L) == strs => f
                }
              case _ => None
            }
            PathProfile(
              pointer = n.pointer, parent = n.parent,
              jsonType = jsonTypeOf(n.t),
              present = present.getOrElse(tag, 0L),
              parentPresent = n.parent.map(presentAt).getOrElse(0L),
              jsonNulls = nulls,
              numMin = numMin, numMax = numMax,
              lenMin = lenMin, lenMax = lenMax,
              itemsMin = itemsMin, itemsMax = itemsMax,
              // a JSON-null occurrence would violate the enum (null is
              // not in the candidate list) — suppress on null-bearing
              // paths
              enumValues = if (nulls > 0) None else enumVals.get(tag),
              format = fmt)
          }
        }
      label -> profiles
    }.toMap
  }

  /** Profile the JSON column in three scans (see object doc). */
  def profile(df: DataFrame, jsonCol: String,
              opts: Suggest.Options = Suggest.Options()): Seq[PathProfile] = {
    val v = try_parse_json(col(jsonCol))
    // scan 1: induced merged schema
    val schemaStr = df.agg(schema_of_variant_agg(v).as("s")).head().getString(0)
    if (schemaStr == null) return Seq.empty // no parseable document at all
    val nodes = flatten(parseVariantSchema(schemaStr))
    profileCore(df, v, Seq(("", None, nodes)), opts).getOrElse("", Seq.empty)
  }

  /** PER-KEY profiling — induce one schema per dispatch key (the per-tool
    * argument-schema registry of [[graft.Graft.validateJsonColumnBy]],
    * derived from data instead of hand-written): scan 1 is ONE grouped
    * `schema_of_variant_agg` (one tiny row per key), scans 2-3 stay ONE
    * aggregation / ONE melt with per-key gates — group count multiplies
    * agg columns, never corpus scans. The key column must be a bounded
    * vocabulary (a tool registry, not an id): more than `maxKeys` keys
    * fails loudly rather than building a silently huge plan. NULL keys
    * are not profiled (dispatch sends them to the default). */
  def profileBy(df: DataFrame, jsonCol: String, keyCol: String,
                opts: Suggest.Options = Suggest.Options(),
                maxKeys: Int = 64): Map[String, Seq[PathProfile]] = {
    val v = try_parse_json(col(jsonCol))
    val schemaRows = df.where(col(keyCol).isNotNull)
      .groupBy(col(keyCol).cast(org.apache.spark.sql.types.StringType).as("__k"))
      .agg(schema_of_variant_agg(v).as("__s"))
      .limit(maxKeys + 1).collect()
    require(schemaRows.length <= maxKeys,
      s"profileBy: over $maxKeys distinct '$keyCol' keys — dispatch keys " +
        "must be a bounded vocabulary (raise maxKeys if yours really is)")
    val groups = schemaRows.toSeq.flatMap { r =>
      val label = r.getString(0)
      Option(r.getString(1)).map(s =>
        (label, Some(col(keyCol).cast(org.apache.spark.sql.types.StringType) === label),
          flatten(parseVariantSchema(s))))
    }.sortBy(_._1)
    profileCore(df, v, groups, opts)
  }

  /** Per-key suggestion rows `(key, pointer, keyword, value)`. */
  def suggestionsBy(df: DataFrame, jsonCol: String, keyCol: String,
                    opts: Suggest.Options = Suggest.Options(),
                    maxKeys: Int = 64): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    profileBy(df, jsonCol, keyCol, opts, maxKeys).toSeq.sortBy(_._1)
      .flatMap { case (k, ps) =>
        suggestionRows(ps).map(r => (k, r._1, r._2, r._3)) }
      .toDF("key", "pointer", "keyword", "value")
  }

  /** The derived dispatch registry, ready for
    * [[graft.Graft.validateJsonColumnBy]]. */
  def suggestSchemasBy(df: DataFrame, jsonCol: String, keyCol: String,
                       opts: Suggest.Options = Suggest.Options(),
                       maxKeys: Int = 64): Map[String, SchemaSpec] =
    profileBy(df, jsonCol, keyCol, opts, maxKeys)
      .filter(_._2.nonEmpty).map { case (k, ps) => k -> toSchema(ps) }

  /** Suggestion rows `(pointer, keyword, value)`; `value` is JSON text. */
  def suggestionRows(profiles: Seq[PathProfile]): Seq[(String, String, String)] =
    profiles.flatMap { p =>
      val rows = Seq.newBuilder[(String, String, String)]
      p.jsonType.foreach { t =>
        // the schema merge absorbs JSON nulls (VOID) into the non-null
        // branch; a bare "X" would reject the observed null rows, so
        // null-bearing paths suggest the faithful ["X","null"] union
        val v = if (p.jsonNulls > 0 && t != "null")
          "[\"" + t + "\",\"null\"]" else "\"" + t + "\""
        rows += ((p.pointer, "type", v))
      }
      // required: present in every doc where the parent object is present
      if (p.parent.isDefined && p.parentPresent > 0 && p.present == p.parentPresent)
        rows += ((p.pointer, "required", "true"))
      p.numMin.foreach(v => rows += ((p.pointer, "minimum", JsonValue.render(v))))
      p.numMax.foreach(v => rows += ((p.pointer, "maximum", JsonValue.render(v))))
      p.lenMin.foreach(v => rows += ((p.pointer, "minLength", v.toString)))
      p.lenMax.foreach(v => rows += ((p.pointer, "maxLength", v.toString)))
      p.itemsMin.foreach(v => rows += ((p.pointer, "minItems", v.toString)))
      p.itemsMax.foreach(v => rows += ((p.pointer, "maxItems", v.toString)))
      p.format.foreach(f => rows += ((p.pointer, "format", "\"" + f + "\"")))
      p.enumValues.foreach(vs =>
        rows += ((p.pointer, "enum", vs.map(_._2).mkString("[", ",", "]"))))
      rows.result()
    }

  /** Profile + render as a DataFrame (the driver-query surface). */
  def suggestions(df: DataFrame, jsonCol: String,
                  opts: Suggest.Options = Suggest.Options()): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    suggestionRows(profile(df, jsonCol, opts))
      .toDF("pointer", "keyword", "value")
  }

  /** Rebuild the nested [[SchemaSpec]] from profiles — compilable on all
    * three paths; validating the profiled column yields zero violations
    * (JsonSuggestSpec asserts the round-trip). */
  def toSchema(profiles: Seq[PathProfile]): SchemaSpec = {
    val byParent = profiles.filter(_.parent.isDefined).groupBy(_.parent.get)
    def build(p: PathProfile): SchemaSpec = {
      val cs = Vector.newBuilder[Constraint]
      p.jsonType.foreach { t =>
        val jt = t match {
          case "integer" => JsonType.JInteger
          case "number"  => JsonType.JNumber
          case "string"  => JsonType.JString
          case "boolean" => JsonType.JBoolean
          case "object"  => JsonType.JObject
          case "array"   => JsonType.JArray
          case "null"    => JsonType.JNull
        }
        cs += TypeC(if (p.jsonNulls > 0) Set(jt, JsonType.JNull) else Set(jt))
      }
      (p.numMin, p.numMax) match {
        case (Some(mn), Some(mx)) =>
          cs += MinimumC(numOf(mn), exclusive = false)
          cs += MaximumC(numOf(mx), exclusive = false)
        case _ => ()
      }
      p.lenMin.foreach(v => cs += MinLengthC(v))
      p.lenMax.foreach(v => cs += MaxLengthC(v))
      p.format.foreach(f => cs += FormatC(f))
      p.itemsMin.foreach(v => cs += MinItemsC(v))
      p.itemsMax.foreach(v => cs += MaxItemsC(v))
      p.enumValues.foreach(vs =>
        cs += EnumC(vs.map(v => JStringV(v._1): JsonValue).toVector))
      val children = byParent.getOrElse(p.pointer, Seq.empty)
      if (children.nonEmpty) {
        val required = children
          .filter(c => c.parentPresent > 0 && c.present == c.parentPresent)
          .map(c => lastKey(c.pointer)).toVector
        if (required.nonEmpty) cs += RequiredC(required)
        cs += PropertiesC(
          children.map(c => lastKey(c.pointer) -> build(c)).toVector,
          Vector.empty, None)
      }
      ConstraintSchema(cs.result())
    }
    profiles.find(_.parent.isEmpty).map(build).getOrElse(TrueSchema)
  }

  private def lastKey(pointer: String): String =
    pointer.substring(pointer.lastIndexOf('/') + 1)
      .replace("~1", "/").replace("~0", "~")

  private def numOf(v: JsonValue): Double = v match {
    case JLongV(l) => l.toDouble
    case JDoubleV(d) => d
    case other => sys.error(s"not numeric: $other")
  }

  /** One-call form. */
  def suggestSchema(df: DataFrame, jsonCol: String,
                    opts: Suggest.Options = Suggest.Options()): SchemaSpec =
    toSchema(profile(df, jsonCol, opts))
}
