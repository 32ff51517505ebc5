package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.compile.{CompileOptions, Compiler}
import graft.spec.SpecParser

/** Weak-typing mode (valijson kWeakTypes, `validator.hpp:22-26`): cast-
  * permissive checks per `basic_adapter.hpp:335-547` maybe/as rules —
  * exercised through BOTH the typed-column compiler and the native
  * variant walker (`Graft.validateJsonColumn` with strictTypes=false). */
class WeakTypingSpec extends SparkTestBase {
  import spark.implicits._

  private val weak = CompileOptions(strictTypes = false)

  private def passes(schema: String, df: DataFrame): Seq[Boolean] = {
    val c = Compiler.compile(SpecParser.parse(schema), col("doc"),
      df.schema("doc").dataType, lit(""), weak)
    df.select(coalesce(c.pass, lit(true))).collect().toSeq.map(_.getBoolean(0))
  }

  /** Same cases through the native walker: docs are JSON texts. */
  private def passesNative(schema: String, docs: Seq[String]): Seq[Boolean] = {
    val df = docs.toDF("doc")
    Graft.validateJsonColumn(df, "doc", Graft.parseSchema(schema), weak)
      .select("pass").collect().toSeq.map(_.getBoolean(0))
  }

  /** And through the pure-Catalyst variant path (weak subset: type, bounds,
    * multipleOf, length/pattern). */
  private def passesVariant(schema: String, docs: Seq[String]): Seq[Boolean] = {
    val df = docs.toDF("doc")
    Graft.validateJsonColumnCatalyst(df, "doc", Graft.parseSchema(schema), weak)
      .select("pass").collect().toSeq.map(_.getBoolean(0))
  }

  test("weak numeric token grammar is std::from_chars (double_parser.hpp:50-60)") {
    import graft.functions.WeakNum._
    // int64: optional '-', digits, full consumption; no '+', no whitespace
    parseLong("7") shouldBe 7L
    parseLong("-7") shouldBe -7L
    parseLong("007") shouldBe 7L
    parseLong(" 7") shouldBe null   // istringstream fallback would accept; from_chars does not
    parseLong("+7") shouldBe null
    parseLong("7 ") shouldBe null
    parseLong("") shouldBe null
    parseLong("-") shouldBe null
    parseLong("99999999999999999999") shouldBe null // result_out_of_range
    // double: general fixed/scientific forms, '-' only, specials allowed
    parseDouble("1.5") shouldBe 1.5
    parseDouble("-1.5e3") shouldBe -1500.0
    parseDouble(".5") shouldBe 0.5
    parseDouble("1.") shouldBe 1.0
    parseDouble("+1.5") shouldBe null
    parseDouble(" 1.5") shouldBe null
    parseDouble("1.5 ") shouldBe null
    parseDouble("e5") shouldBe null
    parseDouble("1e") shouldBe null
    parseDouble("inf").doubleValue.isPosInfinity shouldBe true
    parseDouble("-Infinity").doubleValue.isNegInfinity shouldBe true
    parseDouble("NAN").doubleValue.isNaN shouldBe true
    // result_out_of_range = FAILED parse (double_parser.hpp checks
    // `conversion.ec != std::errc()`): Java saturates overflow to
    // ±Infinity and underflow to zero where from_chars errors
    parseDouble("1e999") shouldBe null     // overflow
    parseDouble("-1e999") shouldBe null
    parseDouble("1e-999") shouldBe null    // underflow of a nonzero mantissa
    parseDouble("0.0e999") shouldBe 0.0    // zero mantissa: a real zero
    parseDouble("-0.000") shouldBe -0.0
    parseDouble("1e308") shouldBe 1e308    // representable: stays valid
    parseDouble("4.9e-324") shouldBe java.lang.Double.MIN_VALUE // subnormal ok
  }

  test("type: numeric strings satisfy integer/number in weak mode") {
    val df = Seq("12", "12.5", "x").toDF("doc")
    passes("""{"type":"integer"}""", df) shouldBe Seq(true, false, false)
    passes("""{"type":"number"}""", df) shouldBe Seq(true, true, false)
    val docs = Seq("\"12\"", "\"12.5\"", "\"x\"")
    passesNative("""{"type":"integer"}""", docs) shouldBe Seq(true, false, false)
    passesNative("""{"type":"number"}""", docs) shouldBe Seq(true, true, false)
  }

  test("type: boolean-ish and null-ish strings") {
    val df = Seq("true", "false", "TRUE", "").toDF("doc")
    passes("""{"type":"boolean"}""", df) shouldBe Seq(true, true, false, false)
    passes("""{"type":"null"}""", df) shouldBe Seq(false, false, false, true)
    val docs = Seq("\"true\"", "\"false\"", "\"TRUE\"", "\"\"")
    passesNative("""{"type":"boolean"}""", docs) shouldBe Seq(true, true, false, false)
    passesNative("""{"type":"null"}""", docs) shouldBe Seq(false, false, false, true)
  }

  test("type: string/array/object stay STRICT even in weak mode (VV:1654-1681)") {
    // the reference's ValidateNamedTypes has no maybe* branch for
    // kString/kArray/kObject — numbers are NOT type:string in weak mode
    passes("""{"type":"string"}""", Seq(1L, 2L).toDF("doc")) shouldBe Seq(false, false)
    passes("""{"type":"string"}""", Seq(true).toDF("doc")) shouldBe Seq(false)
    passesNative("""{"type":"string"}""", Seq("1", "true", "[]")) shouldBe
      Seq(false, false, false)
    passesNative("""{"type":"object"}""", Seq("[]")) shouldBe Seq(false)
    passesNative("""{"type":"array"}""", Seq("{}")) shouldBe Seq(false)
  }

  test("numeric bounds apply to parseable strings; unparseable pass") {
    val df = Seq("5", "50", "abc", "7.5").toDF("doc")
    passes("""{"minimum":0,"maximum":10}""", df) shouldBe Seq(true, false, true, true)
    passesNative("""{"minimum":0,"maximum":10}""",
      Seq("\"5\"", "\"50\"", "\"abc\"", "\"7.5\"")) shouldBe Seq(true, false, true, true)
  }

  test("multipleOf applies maybe-conversions even in STRICT mode (VV:934-984 has no gate)") {
    // typed string column, strict options
    val c = Compiler.compile(SpecParser.parse("""{"multipleOf":3}"""), col("doc"),
      org.apache.spark.sql.types.StringType, lit(""))
    Seq("9", "10", "x", "7.5").toDF("doc").select(coalesce(c.pass, lit(true)))
      .collect().toSeq.map(_.getBoolean(0)) shouldBe Seq(true, false, true, false)
    // native walker, strict
    Graft.validateJsonColumn(Seq("\"9\"", "\"10\"", "\"x\"").toDF("doc"), "doc",
      Graft.parseSchema("""{"multipleOf":3}"""))
      .select("pass").collect().toSeq.map(_.getBoolean(0)) shouldBe Seq(true, false, true)
  }

  test("multipleOf on strings in weak mode") {
    passes("""{"multipleOf":3}""", Seq("9", "10", "x").toDF("doc")) shouldBe Seq(true, false, true)
    passes("""{"multipleOf":1.5}""", Seq("4.5", "35").toDF("doc")) shouldBe Seq(true, false)
    passesNative("""{"multipleOf":1.5}""", Seq("\"4.5\"", "\"35\"")) shouldBe Seq(true, false)
  }

  test("length/pattern on numbers via asString (std::to_string semantics)") {
    // integer 1234 -> "1234" (len 4); double 1.5 -> "1.500000" (len 8)
    passes("""{"minLength":4}""", Seq(1234L).toDF("doc")) shouldBe Seq(true)
    passes("""{"minLength":5}""", Seq(1234L).toDF("doc")) shouldBe Seq(false)
    passes("""{"minLength":8,"maxLength":8}""", Seq(1.5).toDF("doc")) shouldBe Seq(true)
    passes("""{"pattern":"^true$"}""", Seq(true).toDF("doc")) shouldBe Seq(true)
    passes("""{"pattern":"^12"}""", Seq(1234L).toDF("doc")) shouldBe Seq(true)
    passesNative("""{"minLength":4}""", Seq("1234")) shouldBe Seq(true)
    passesNative("""{"minLength":5}""", Seq("1234")) shouldBe Seq(false)
    passesNative("""{"minLength":8,"maxLength":8}""", Seq("1.5")) shouldBe Seq(true)
    passesNative("""{"pattern":"^true$"}""", Seq("true")) shouldBe Seq(true)
  }

  test("variant-path weak mode agrees with the native walker (type/bounds/multipleOf/length/pattern)") {
    val cases: Seq[(String, Seq[String])] = Seq(
      ("""{"type":"integer"}""", Seq("\"12\"", "\"12.5\"", "\"x\"", "12", "12.5")),
      ("""{"type":"number"}""", Seq("\"12.5\"", "\"x\"", "true")),
      ("""{"type":"boolean"}""", Seq("\"true\"", "\"TRUE\"", "false")),
      ("""{"type":"null"}""", Seq("\"\"", "\"x\"", "null")),
      // " 5", Infinity, NaN, "+5": whitespace and special floats must be
      // treated identically by every path (WeakNum is the shared parser)
      ("""{"minimum":0,"maximum":10}""",
       Seq("\"5\"", "\"50\"", "\"abc\"", "5", "50", "\" 5\"", "\"Infinity\"", "\"NaN\"", "\"+5\"")),
      ("""{"multipleOf":3}""", Seq("\"9\"", "\"10\"", "\"x\"", "9", "10")),
      ("""{"minLength":4}""", Seq("1234", "123", "\"abcd\"", "true")),
      ("""{"pattern":"^12"}""", Seq("1234", "34", "\"129\"")))
    for ((schema, docs) <- cases) {
      val native = passesNative(schema, docs)
      val variant = passesVariant(schema, docs)
      withClue(s"$schema over $docs: native=$native variant=$variant") {
        variant shouldBe native
      }
    }
  }

  test("weak string form of a number is KIND-dependent, consistently on every path") {
    // long 2 renders "2" (length 1); double 2.0 renders "2.000000" (%.6f,
    // std::to_string semantics) — so maxLength 1 under contains passes
    // [2.5, 2] but fails [2.5, 2.0]. This is why the fuzz harness refuses
    // to lift mixed long/double arrays in weak mode: array<double>
    // promotion would silently turn the first doc into the second.
    val schema = """{"contains": {"maxLength": 1}}"""
    passesNative(schema, Seq("[2.5, 2]", "[2.5, 2.0]")) shouldBe Seq(true, false)
    passesVariant(schema, Seq("[2.5, 2]", "[2.5, 2.0]")) shouldBe Seq(true, false)
    // typed path: same-kind arrays agree with the walker kind-for-kind
    passes(schema, Seq(Seq(2L)).toDF("doc")) shouldBe Seq(true)
    passes(schema, Seq(Seq(2.0)).toDF("doc")) shouldBe Seq(false)
  }

  test("weak container aliases apply to object/array CONSTRAINTS (not type)") {
    // empty array is maybeObject: required/minProperties see 0 properties
    passesNative("""{"required":["a"]}""", Seq("[]", "[1]")) shouldBe Seq(false, true)
    passesNative("""{"minProperties":1}""", Seq("[]", "{\"a\":1}")) shouldBe Seq(false, true)
    // empty object is maybeArray: minItems sees 0 elements
    passesNative("""{"minItems":1}""", Seq("{}", "[1]")) shouldBe Seq(false, true)
    // the variant Catalyst path applies the same aliases (fuzz-found gap)
    passesVariant("""{"required":["a"]}""", Seq("[]", "[1]")) shouldBe Seq(false, true)
    passesVariant("""{"minProperties":1}""", Seq("[]", "{\"a\":1}")) shouldBe Seq(false, true)
    passesVariant("""{"minItems":1}""", Seq("{}", "[1]")) shouldBe Seq(false, true)
    passesVariant("""{"contains":{"type":"string"}}""", Seq("{}", "[\"x\"]")) shouldBe
      Seq(false, true)
  }

  test("weak enum/const equality (equalTo strict=false, basic_adapter.hpp:509-547)") {
    passesNative("""{"const":5}""", Seq("\"5\"", "5", "\"5.5\"")) shouldBe Seq(true, true, false)
    passesNative("""{"const":"true"}""", Seq("true", "\"true\"", "false")) shouldBe
      Seq(true, true, false)
    passesNative("""{"enum":[null]}""", Seq("\"\"", "null", "\"x\"")) shouldBe
      Seq(true, true, false)
    passesNative("""{"const":"7"}""", Seq("7", "8")) shouldBe Seq(true, false)
    // the variant Catalyst path implements the same weak equality
    passesVariant("""{"const":5}""", Seq("\"5\"", "5", "\"5.5\"")) shouldBe Seq(true, true, false)
    passesVariant("""{"const":"true"}""", Seq("true", "\"true\"", "false")) shouldBe
      Seq(true, true, false)
    passesVariant("""{"enum":[null]}""", Seq("\"\"", "null", "\"x\"")) shouldBe
      Seq(true, true, false)
    passesVariant("""{"const":[]}""", Seq("{}", "[]", "[1]")) shouldBe Seq(true, true, false)
    passesVariant("""{"const":{"a":1}}""", Seq("{\"a\":\"1\"}", "{\"a\":2}")) shouldBe
      Seq(true, false)
    // strict mode rejects all cross-type matches
    Graft.validateJsonColumn(Seq("\"5\"").toDF("doc"), "doc",
      Graft.parseSchema("""{"const":5}"""))
      .select("pass").collect()(0).getBoolean(0) shouldBe false
  }

  test("weak container delegation: empty containers cross kinds on the typed path") {
    import org.apache.spark.sql.types._
    // empty struct is maybeString "" (minLength applies) and maybeArray []
    // (contains finds nothing); matches the native walker's verdicts
    val st = StructType(Seq(StructField("doc",
      StructType(Seq(StructField("a", LongType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row(null)), Row(null))), st)
    passes("""{"minLength":1}""", df) shouldBe Seq(false, true)
    passes("""{"contains":{}}""", df) shouldBe Seq(false, true)
    passesNative("""{"minLength":1}""", Seq("{}", "null")) shouldBe Seq(false, true)
    // NULL container = JSON null, NOT absent: a type constraint must fail it
    passes("""{"type":"object"}""", df) shouldBe Seq(true, false)
    passesNative("""{"type":"object"}""", Seq("{}", "null")) shouldBe Seq(true, false)
  }

  test("weak nullish group: JSON null matches const \"\" on all paths") {
    val df = Seq[Option[String]](None, Some("")).map(Tuple1(_)).toDF("doc")
    passes("""{"const":""}""", df) shouldBe Seq(true, true)
    passes("""{"enum":[null]}""", df) shouldBe Seq(true, true)
    passesNative("""{"const":""}""", Seq("null", "\"\"")) shouldBe Seq(true, true)
    // strict mode keeps them distinct
    val strictC = Compiler.compile(SpecParser.parse("""{"const":""}"""),
      col("doc"), org.apache.spark.sql.types.StringType, lit(""))
    df.select(coalesce(strictC.pass, lit(true))).collect()
      .map(_.getBoolean(0)).toSeq shouldBe Seq(false, true)
  }

  test("weak mode: additionalProperties-false scan tolerates maybeObject arrays") {
    // regression: the reject-first-unexpected branch called objectSize()
    // unguarded, crashing on weak-mode empty arrays admitted by maybeObject
    passesNative("""{"properties":{"a":{}},"additionalProperties":false}""",
      Seq("[]", "{}", """{"b":1}""")) shouldBe Seq(true, true, false)
  }

  test("weak mode with a CustomC spec keeps the typed value shape") {
    import org.apache.spark.sql.types._
    val spec = graft.spec.ConstraintSchema(Vector(graft.spec.CustomC(
      "vIsEven", c => c.getField("v").cast("long") % 2 === 0, "v must be even")))
    val st = StructType(Seq(StructField("doc",
      StructType(Seq(StructField("v", LongType))))))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(Row(4L)), Row(Row(5L)))), st)
    val c = Compiler.compile(spec, col("doc"), st("doc").dataType, lit(""), weak)
    df.select(coalesce(c.pass, lit(true))).collect()
      .map(_.getBoolean(0)).toSeq shouldBe Seq(true, false)
  }
}
