package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.spec._
import graft.compile.{Compiler, Messages}

/** Leaf/combinator compiler semantics vs the reference validator
  * (valijson `validation_visitor.hpp`) — pass/fail parity plus verbatim
  * violation descriptions. */
class CompilerSpec extends SparkTestBase {
  import spark.implicits._

  test("custom constraint (PolyConstraint analog) runs on the NATIVE walker, both polarities") {
    // mirrors tests/test_poly_constraint.cpp ValidationCanPass/ValidationCanFail:
    // a stub keyword wired into the root subschema, validated against an
    // arbitrary document; failure pushes the exact message
    def stub(shouldValidate: Boolean) = ConstraintSchema(Vector(CustomC(
      "stub", c => lit(shouldValidate),
      "StubPolyConstraint intentionally failed validation",
      nativePredicate = Some((_: org.apache.spark.types.variant.Variant) => shouldValidate))))
    val df = Seq("""{"any":"doc"}""").toDF("doc")
    // ValidationCanPass: zero errors
    val pass = Graft.validateJsonColumn(df, "doc", stub(true))
      .select("pass", "violations").collect()(0)
    pass.getBoolean(0) shouldBe true
    pass.getSeq[Row](1) shouldBe empty
    // ValidationCanFail: exactly one error with the exact description
    val fail = Graft.validateJsonColumn(df, "doc", stub(false))
      .select("pass", "violations").collect()(0)
    fail.getBoolean(0) shouldBe false
    val errs = fail.getSeq[Row](1)
    errs.size shouldBe 1
    errs.head.getString(1) shouldBe "StubPolyConstraint intentionally failed validation"
    // the native predicate sees the PARSED document value (adapter analog)
    val typed = ConstraintSchema(Vector(CustomC(
      "isEvenInt", c => c.cast("long") % 2 === 0, "value must be even",
      nativePredicate = Some { v: org.apache.spark.types.variant.Variant =>
        v.getType == org.apache.spark.types.variant.VariantUtil.Type.LONG && v.getLong % 2 == 0
      })))
    Graft.validateJsonColumn(Seq("4", "5").toDF("doc"), "doc", typed)
      .select("pass").collect().map(_.getBoolean(0)).toSeq shouldBe Seq(true, false)
    // Column-only customs still fail loudly on the native walker
    val columnOnly = ConstraintSchema(Vector(CustomC("colOnly", c => c.isNotNull, "m")))
    intercept[UnsupportedOperationException] {
      Graft.validateJsonColumn(df, "doc", columnOnly).collect()
    }
  }

  test("custom keyword in a schema DOCUMENT compiles via a registered builder") {
    // ConstraintBuilder analog (constraint_builder.hpp:13-19, dispatched
    // schema_parser.hpp:1151-1167): the keyword arrives in JSON — nested
    // under properties, mixed with standard keywords — and the registered
    // builder turns its value node into the CustomC
    val builders: Map[String, graft.spec.SpecParser.ConstraintBuilder] = Map(
      "multipleOfDigits" -> { n =>
        val div = n.asLong() // keyword VALUE parameterizes the constraint
        CustomC(s"multipleOfDigits",
          c => c.cast("long") % div === 0,
          s"digit count must be multiple of $div",
          nativePredicate = Some { v: org.apache.spark.types.variant.Variant =>
            v.getType == org.apache.spark.types.variant.VariantUtil.Type.LONG &&
              v.getLong % div == 0
          })
      })
    val spec = Graft.parseSchema(
      """{"properties": {"n": {"type": "integer", "multipleOfDigits": 3}}}""",
      Map.empty, builders)
    val out = Graft.validateJsonColumn(
      Seq("""{"n": 9}""", """{"n": 10}""", """{"n": "x"}""").toDF("doc"), "doc", spec)
      .select("pass", "violations").collect()
    out(0).getBoolean(0) shouldBe true
    out(1).getBoolean(0) shouldBe false
    out(1).getSeq[Row](1).map(_.getString(1)) should contain(
      "digit count must be multiple of 3")
    out(2).getBoolean(0) shouldBe false // fails type AND the custom predicate
    // an UNregistered keyword in the same position is ignored (standard
    // JSON-Schema behavior — no builder, no constraint)
    val ignored = Graft.parseSchema(
      """{"properties": {"n": {"someUnknownKeyword": 3}}}""")
    Graft.validateJsonColumn(Seq("""{"n": 10}""").toDF("doc"), "doc", ignored)
      .select("pass").collect()(0).getBoolean(0) shouldBe true
  }

  /** Run a compiled spec over a single-column DF, return (pass, descriptions). */
  private def run(spec: SchemaSpec, df: DataFrame): Seq[(Boolean, Seq[String])] = {
    val schema = df.schema
    val c = Compiler.compileRow(spec, schema)
    df.select(c.pass.as("pass"), c.violations.as("v")).collect().toSeq.map { r =>
      (r.getBoolean(0), r.getSeq[Row](1).map(_.getString(1)))
    }
  }

  private def specOf(json: String): SchemaSpec = SpecParser.parse(json)

  test("hello-world schema: const on property (etc/hello-world.schema.json)") {
    val spec = specOf("""{"type":"object","properties":{"hello":{"const":"world"}}}""")
    val df = Seq("world", "mars", null).toDF("hello")
    val rs = run(spec, df)
    rs(0)._1 shouldBe true
    rs(1)._1 shouldBe false
    rs(1)._2 should contain(Messages.constNoMatch)
    rs(1)._2 should contain(Messages.propertySchemaFail("hello"))
    rs(2)._1 shouldBe true // absent property passes (not required)
  }

  test("enum + required on role column") {
    val spec = specOf(
      """{"type":"object",
         "properties":{"role":{"enum":["system","user","assistant","tool"]}},
         "required":["role"]}""")
    val df = Seq("user", "robot", null).toDF("role")
    val rs = run(spec, df)
    rs(0) shouldBe (true, Seq())
    rs(1)._1 shouldBe false
    rs(1)._2.head shouldBe Messages.enumNoMatch
    rs(2)._1 shouldBe false
    rs(2)._2 shouldBe Seq(Messages.missingRequired("role"))
  }

  test("minimum / maximum with exclusive variants and double formatting") {
    val spec = specOf("""{"properties":{"x":{"minimum":0,"maximum":100,"exclusiveMaximum":true}}}""")
    val df = Seq(0L, 50L, 100L, -1L).toDF("x")
    val rs = run(spec, df)
    rs.map(_._1) shouldBe Seq(true, true, false, false)
    rs(2)._2.head shouldBe "Expected number less than 100.000000"
    rs(3)._2.head shouldBe "Expected number greater than or equal to 0.000000"
  }

  test("integer-double rule: exact-integer doubles satisfy type integer") {
    val spec = specOf("""{"properties":{"x":{"type":"integer"}}}""")
    val df = Seq(1.0, 1.5).toDF("x")
    val rs = run(spec, df)
    rs.map(_._1) shouldBe Seq(true, false)
    rs(1)._2.head shouldBe Messages.typeNotPermitted
  }

  test("multipleOf integer and double tolerance") {
    val si = specOf("""{"properties":{"x":{"multipleOf":3}}}""")
    run(si, Seq(9L, 10L, 0L).toDF("x")).map(_._1) shouldBe Seq(true, false, true)
    val sd = specOf("""{"properties":{"x":{"multipleOf":0.01}}}""")
    val rs = run(sd, Seq(0.03, 0.035, 12391239123.0 * 1e-8 * 1e8).toDF("x"))
    rs(0)._1 shouldBe true
    rs(1)._1 shouldBe false
    rs(1)._2.head shouldBe "Value should be a multiple of 0.010000"
  }

  test("minLength counts code points; pattern is unanchored search") {
    val spec = specOf("""{"properties":{"s":{"minLength":3,"pattern":"b.d"}}}""")
    val rs = run(spec, Seq("abéd", "bd", "xxbadyy").toDF("s"))
    rs(0)._1 shouldBe true  // é is one code point; "b.d" search matches "béd"... wait: "abéd" contains b,é,d
    rs(1)._1 shouldBe false // too short and no match
    rs(1)._2 shouldBe Seq(Messages.minLength(3), Messages.patternNoMatch,
                          Messages.propertySchemaFail("s"))
    rs(2)._1 shouldBe true  // unanchored search finds "bad"
  }

  test("format: date, time, date-time, ipv4 incl. leap-second + day-range") {
    val d = specOf("""{"properties":{"s":{"format":"date"}}}""")
    run(d, Seq("2022-07-18", "2022-02-30", "2024-02-29", "2023-02-29").toDF("s")).map(_._1) shouldBe
      Seq(true, false, true, false)
    val t = specOf("""{"properties":{"s":{"format":"time"}}}""")
    run(t, Seq("16:52:45Z", "23:59:60Z", "16:52:60Z", "16:52:45+02:00", "24:00:00Z").toDF("s")).map(_._1) shouldBe
      Seq(true, true, false, true, false)
    val dt = specOf("""{"properties":{"s":{"format":"date-time"}}}""")
    run(dt, Seq("2022-07-18T16:52:45Z", "2022-07-18 16:52:45Z",
                "2022-06-30T23:59:60Z", "2022-06-30T17:59:60-06:00", "2022-06-30T12:00:60Z").toDF("s")).map(_._1) shouldBe
      Seq(true, false, true, true, false)
    val ip = specOf("""{"properties":{"s":{"format":"ipv4"}}}""")
    run(ip, Seq("192.168.0.1", "256.0.0.1", "1.2.3").toDF("s")).map(_._1) shouldBe
      Seq(true, false, false)
    // failure message is verbatim
    run(ip, Seq("nope").toDF("s"))(0)._2.head shouldBe "String should be a valid IPv4 address"
  }

  test("format: native FormatCheckExpr agrees with the pure-Catalyst regex formulation") {
    import graft.compile.CompileOptions
    val battery = Seq(
      "2022-07-18", "2022-02-30", "2024-02-29", "2023-02-29", "0000-01-01", "2022-7-18",
      "16:52:45Z", "23:59:60Z", "16:52:60Z", "16:52:45+02:00", "24:00:00Z", "23:59:60+00:00",
      "17:59:60-06:00", "16:52:45", "16:52:45z", "16:52:45.123Z",
      "2022-07-18T16:52:45Z", "2022-07-18 16:52:45Z", "2022-06-30T23:59:60Z",
      "2022-06-30T17:59:60-06:00", "2022-06-30T12:00:60Z", "2022-07-18t16:52:45.5+23:59",
      "192.168.0.1", "256.0.0.1", "1.2.3", "01.2.3.4", "", "garbage", null)
    val df = battery.toDF("s")
    for (fmt <- Seq("date", "time", "date-time", "ipv4"); strict <- Seq(false, true)) {
      val opts = CompileOptions(strictDateTime = strict)
      val catalyst = Compiler.compileFormatCatalyst(fmt, col("s"), StringType, lit(""), opts)
      val both = df.select(
        graft.functions.FormatCheckExpr.check(col("s"), fmt, strict).as("n"),
        catalyst.pass.as("c")).collect().toSeq
      val mismatches = both.zip(battery).filter { case (r, s) =>
        val n = if (r.isNullAt(0)) null else r.getBoolean(0)
        val c = if (r.isNullAt(1)) null else r.getBoolean(1)
        s != null && n != c
      }
      withClue(s"fmt=$fmt strict=$strict: $mismatches") { mismatches shouldBe empty }
    }
  }

  test("array constraints: items, minItems, uniqueItems, contains") {
    val spec = specOf(
      """{"properties":{"a":{
           "type":"array","items":{"type":"integer","minimum":0},
           "minItems":2,"uniqueItems":true,
           "contains":{"minimum":10}}}}""")
    val df = Seq(
      Seq(1L, 2L, 10L),       // ok
      Seq(1L),                // minItems + contains fail
      Seq(3L, 3L, 12L),       // uniqueItems fail
      Seq(-1L, 5L, 11L)       // items (minimum) fail on element 0
    ).toDF("a")
    val rs = run(spec, df)
    rs(0)._1 shouldBe true
    rs(1)._1 shouldBe false
    rs(1)._2 should contain(Messages.minItems(2))
    rs(1)._2 should contain(Messages.containsFail)
    rs(2)._1 shouldBe false
    rs(2)._2 should contain(Messages.uniqueViolation(0, 1))
    rs(3)._1 shouldBe false
    rs(3)._2 should contain("Expected number greater than or equal to 0.000000")
    rs(3)._2 should contain(Messages.itemFail(0))
  }

  test("tuple items + additionalItems") {
    val spec = specOf(
      """{"properties":{"a":{
           "items":[{"type":"integer"},{"minimum":5}],
           "additionalItems":{"maximum":3}}}}""")
    val df = Seq(Seq(1.5, 9.0, 1.0), Seq(1.0, 2.0), Seq(1.0, 9.0, 7.0)).toDF("a")
    val rs = run(spec, df)
    rs(0)._1 shouldBe false  // 1.5 not integer
    rs(0)._2 should contain(Messages.tupleItemFail(0))
    rs(1)._1 shouldBe false  // 2.0 < 5
    rs(1)._2 should contain(Messages.tupleItemFail(1))
    rs(2)._1 shouldBe false  // 7 > 3 against additional
    rs(2)._2 should contain(Messages.additionalItemFail(2))
  }

  test("tuple items without additionalItems rejects overflow") {
    val spec = specOf("""{"properties":{"a":{"items":[{"type":"number"}],"additionalItems":false}}}""")
    val rs = run(spec, Seq(Seq(1.0, 2.0)).toDF("a"))
    rs(0)._1 shouldBe false
    rs(0)._2.head shouldBe Messages.tooManyItems
  }

  test("combinators: allOf, anyOf, oneOf, not, if/then/else") {
    val allOf = specOf("""{"properties":{"x":{"allOf":[{"minimum":0},{"maximum":10}]}}}""")
    val r1 = run(allOf, Seq(5L, 20L).toDF("x"))
    r1(0)._1 shouldBe true
    r1(1)._1 shouldBe false
    r1(1)._2 shouldBe Seq("Expected number less than or equal to 10.000000",
                          Messages.allOfChildFail(1),
                          Messages.propertySchemaFail("x"))

    val anyOf = specOf("""{"properties":{"x":{"anyOf":[{"maximum":0},{"minimum":10}]}}}""")
    run(anyOf, Seq(-5L, 5L, 15L).toDF("x")).map(_._1) shouldBe Seq(true, false, true)

    val oneOf = specOf("""{"properties":{"x":{"oneOf":[{"maximum":10},{"minimum":5}]}}}""")
    val r3 = run(oneOf, Seq(2L, 7L, 20L).toDF("x"))
    r3.map(_._1) shouldBe Seq(true, false, true)
    r3(1)._2.head shouldBe Messages.oneOfTooMany

    val notS = specOf("""{"properties":{"x":{"not":{"minimum":0}}}}""")
    val r4 = run(notS, Seq(-1L, 1L).toDF("x"))
    r4.map(_._1) shouldBe Seq(true, false)
    r4(1)._2.head shouldBe Messages.notFail

    val cond = specOf("""{"properties":{"x":{"if":{"minimum":0},"then":{"maximum":10},"else":{"maximum":-5}}}}""")
    run(cond, Seq(5L, 50L, -6L, -1L).toDF("x")).map(_._1) shouldBe Seq(true, false, true, false)
  }

  test("dependencies: property-deps and schema-deps (cross-field)") {
    val spec = specOf(
      """{"dependencies":{
           "tool":["role"],
           "role":{"properties":{"n":{"minimum":0}}}}}""")
    val schema = StructType(Seq(
      StructField("tool", StringType), StructField("role", StringType),
      StructField("n", LongType)))
    val rows = Seq(
      Row("search", "tool", 1L),   // ok
      Row("search", null, 1L),     // tool present, role missing
      Row(null, "user", -1L),      // role present, n violates schema-dep
      Row(null, null, -7L))        // nothing present → ok
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val rs = run(spec, df)
    rs.map(_._1) shouldBe Seq(true, false, false, true)
    rs(1)._2.head shouldBe Messages.missingDependency("role")
    rs(2)._2 should contain(Messages.dependentSchemaFail)
  }

  test("additionalProperties: false rejects unknown present columns") {
    val spec = specOf("""{"properties":{"a":{}},"additionalProperties":false}""")
    val schema = StructType(Seq(StructField("a", LongType), StructField("b", LongType)))
    val rows = Seq(Row(1L, null), Row(1L, 2L))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val rs = run(spec, df)
    rs.map(_._1) shouldBe Seq(true, false)
    rs(1)._2.head shouldBe Messages.unexpectedProperty("b")
  }

  test("boolean false schema / $ref DAG / cycle rejection") {
    val f = specOf("""{"properties":{"x":false}}""")
    run(f, Seq(1L).toDF("x"))(0)._1 shouldBe false

    val ref = specOf(
      """{"definitions":{"pos":{"minimum":0}},
          "properties":{"x":{"$ref":"#/definitions/pos"},"y":{"$ref":"#/definitions/pos"}}}""")
    val df = Seq((1L, 2L), (1L, -2L)).toDF("x", "y")
    run(ref, df).map(_._1) shouldBe Seq(true, false)

    // cyclic $ref PARSES now (registry memoization, SP:486-531). On TYPED
    // columns the cycle dies out at the column's finite depth (a nested
    // properties constraint on a non-struct is vacuous), so compile
    // succeeds; only a VariantType column can actually reach the RefSchema,
    // where the compiler rejects it (asserted in RefSpec) and the native
    // walker evaluates it.
    val cyc = specOf("""{"definitions":{"a":{"properties":{"x":{"$ref":"#/definitions/a"}}}},
              "properties":{"x":{"$ref":"#/definitions/a"}}}""")
    run(cyc, Seq(1L).toDF("x")).map(_._1) shouldBe Seq(true)
  }

  test("violation json_pointer paths extend through properties and arrays") {
    val spec = specOf("""{"properties":{"a":{"items":{"minimum":0}}}}""")
    val c = Compiler.compileRow(spec, StructType(Seq(StructField("a", ArrayType(LongType)))))
    val df = Seq(Seq(1L, -2L)).toDF("a")
    val out = df.select(c.violations.as("v")).collect()(0).getSeq[Row](0)
    out.map(r => (r.getString(0), r.getString(1))) shouldBe Seq(
      ("/a/1", "Expected number greater than or equal to 0.000000"),
      ("/a", Messages.itemFail(1)),
      ("", Messages.propertySchemaFail("a")))
  }
}
