package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{FormatCheckExpr, MinHashExpr, PropsToJsonExpr,
  RegexSearchExpr, SimHashExpr, ThompsonRegexEngine, ValidateJsonExpr,
  XmlToJsonExpr, YamlToJsonExpr}

/** SQL surface for the engine's custom Catalyst expressions.
  *
  * Two ways in:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build, or
  *  - `GraftExtensions.register(spark)` on a live session.
  *
  * {{{
  * SELECT minhash(norm_text, 8, 32),
  *        simhash(norm_text),
  *        validate_json(yaml_to_json(doc), '{"type":"object"}').pass
  * FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {

  private def intArg(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other =>
      // a clear plan-time error beats Unevaluable's UnsupportedOperation
      // (non-foldable arg, e.g. a column reference) or an NPE (NULL literal)
      require(other.foldable, s"argument must be a literal, got $other")
      other.eval() match {
        case n: Number => n.intValue()
        case null      => throw new IllegalArgumentException(
          "argument must be a non-NULL integer literal")
        case v         => throw new IllegalArgumentException(
          s"argument must be an integer literal, got $v")
      }
  }

  /** Plan-time string literal (e.g. an inline schema document): fails with
    * a clear message on a column reference or a NULL literal instead of
    * Unevaluable's UnsupportedOperationException / an NPE. */
  private def stringArg(e: Expression, what: String): String = e match {
    case Literal(s, _) if s != null => s.toString
    case other =>
      require(other.foldable, s"$what must be a literal, got $other")
      val v = other.eval()
      require(v != null, s"$what must not be NULL")
      v.toString
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (new FunctionIdentifier("minhash"),
      new ExpressionInfo(classOf[MinHashExpr].getName, "minhash"),
      (args: Seq[Expression]) => {
        require(args.length == 3, "minhash(normText, k, numHashes)")
        MinHashExpr(args.head, intArg(args(1)), intArg(args(2)))
      }),
    (new FunctionIdentifier("simhash"),
      new ExpressionInfo(classOf[SimHashExpr].getName, "simhash"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "simhash(normText)")
        SimHashExpr(args.head)
      }),
    (new FunctionIdentifier("validate_json"),
      new ExpressionInfo(classOf[ValidateJsonExpr].getName, "validate_json"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "validate_json(jsonText, schemaJsonLiteral)")
        val schemaJson = stringArg(args(1), "validate_json: schema")
        ValidateJsonExpr(args.head, graft.spec.SpecParser.parse(schemaJson))
      }),
    (new FunctionIdentifier("format_check"),
      new ExpressionInfo(classOf[FormatCheckExpr].getName, "format_check"),
      (args: Seq[Expression]) => {
        require(args.length >= 2 && args.length <= 3,
          "format_check(text, formatLiteral[, strictDateTime])")
        val fmt = stringArg(args(1), "format_check: format")
        val strict = args.length == 3 && {
          require(args(2).foldable, "format_check: strictDateTime must be a literal")
          args(2).eval() match {
            case b: java.lang.Boolean => b.booleanValue()
            case s if s != null       => s.toString.equalsIgnoreCase("true")
            case _                    => false
          }
        }
        FormatCheckExpr(args.head, fmt, strict)
      }),
    (new FunctionIdentifier("regex_search_safe"),
      new ExpressionInfo(classOf[RegexSearchExpr].getName, "regex_search_safe"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "regex_search_safe(text, patternLiteral)")
        val pat = stringArg(args(1), "regex_search_safe: pattern")
        // linear-time Thompson NFA: safe against catastrophic backtracking
        RegexSearchExpr(args.head, pat, ThompsonRegexEngine)
      }),
    (new FunctionIdentifier("yaml_to_json"),
      new ExpressionInfo(classOf[YamlToJsonExpr].getName, "yaml_to_json"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "yaml_to_json(yamlText)")
        YamlToJsonExpr(args.head)
      }),
    (new FunctionIdentifier("props_to_json"),
      new ExpressionInfo(classOf[PropsToJsonExpr].getName, "props_to_json"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "props_to_json(propertiesText)")
        PropsToJsonExpr(args.head)
      }),
    (new FunctionIdentifier("xml_to_json"),
      new ExpressionInfo(classOf[XmlToJsonExpr].getName, "xml_to_json"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "xml_to_json(xmlText)")
        XmlToJsonExpr(args.head)
      }))

  /** Register on an existing session (tests, shells). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, id, info, builder)
    }
}
