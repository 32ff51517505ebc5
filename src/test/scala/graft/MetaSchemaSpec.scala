package graft

import org.apache.spark.sql.functions._

import graft.spec.MetaSchemas

/** Meta-schema self-validation — the reference validates every fixture
  * schema against the bundled draft meta-schemas before use
  * (`tests/test_validator.cpp:38-66`, `doc/schema/draft-07.json`). The
  * draft-07 meta-schema is the deepest `$ref` object in the project: a
  * root `$id`, `"$ref": "#"` self-recursion through every value-descending
  * keyword, `anyOf`-of-`$ref` dispatch, boolean subschemas and unknown
  * `format`s that must pass. */
class MetaSchemaSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val meta = Graft.parseSchema(MetaSchemas.draft07)

  private def valid(docs: Seq[String]): Seq[Boolean] =
    Graft.validateJsonColumn(docs.toDF("doc"), "doc", meta)
      .select("pass").collect().toSeq.map(_.getBoolean(0))

  test("draft-07 meta-schema parses (cyclic root $ref knot-tied)") {
    meta should not be null
  }

  test("well-formed schema documents validate against the meta-schema") {
    valid(Seq(
      """{}""",
      """true""", """false""",
      """{"type":"string","minLength":3}""",
      """{"type":["string","null"]}""",
      """{"enum":[1,"a",null,[2]],"const":{"x":1}}""",
      """{"properties":{"a":{"type":"integer"}},"required":["a"]}""",
      """{"items":[{"type":"string"}],"additionalItems":false}""",
      """{"items":{"$ref":"#/definitions/x"},"definitions":{"x":{"minimum":0}}}""",
      """{"allOf":[{"minimum":0},{"maximum":9}],"not":{"multipleOf":3}}""",
      """{"if":{"type":"object"},"then":{"minProperties":1},"else":true}""",
      """{"dependencies":{"a":["b"],"c":{"required":["d"]}}}""",
      """{"patternProperties":{"^x":{"type":"number"}},"additionalProperties":false}""",
      """{"$id":"http://x.test/s.json","$schema":"http://json-schema.org/draft-07/schema#"}"""
    )).forall(identity) shouldBe true
  }

  test("malformed schema documents are rejected by the meta-schema") {
    valid(Seq(
      """{"type":123}""",                        // type: not a simpleType
      """{"type":"strnig"}""",                   // not in the enum
      """{"type":["string","string"]}""",        // uniqueItems on type array
      """{"type":[]}""",                         // minItems 1
      """{"exclusiveMinimum":"x"}""",            // must be number
      """{"required":"a"}""",                    // must be stringArray
      """{"required":[1]}""",                    // items type string
      """{"pattern":123}""",                     // must be string
      """{"maxLength":-1}""",                    // nonNegativeInteger
      """{"maxLength":2.5}""",                   // integer
      """{"allOf":[]}""",                        // schemaArray minItems 1
      """{"allOf":{"minimum":0}}""",             // must be array
      """{"properties":{"a":5}}""",              // subschema must be schema
      """{"uniqueItems":"yes"}""",               // must be boolean
      """3""", """"x""""                         // root type object|boolean
    )).exists(identity) shouldBe false
  }

  test("the meta-schema validates ITSELF") {
    valid(Seq(MetaSchemas.draft07)) shouldBe Seq(true)
  }

  private lazy val meta04 = Graft.parseSchema(MetaSchemas.draft04)
  private def valid04(docs: Seq[String]): Seq[Boolean] =
    Graft.validateJsonColumn(docs.toDF("doc"), "doc", meta04)
      .select("pass").collect().toSeq.map(_.getBoolean(0))

  test("draft-04 meta-schema: boolean exclusives, top-level dependencies, self-validation") {
    // draft-4 semantics the draft-07 meta-schema does not express
    valid04(Seq(
      """{"maximum": 5, "exclusiveMaximum": true}""",      // paired → ok
      """{"minimum": 0, "exclusiveMinimum": false}""",
      """{"type": "integer"}""",
      """{"required": ["a"]}""",
      """{"enum": [1]}"""
    )) shouldBe Seq(true, true, true, true, true)
    valid04(Seq(
      """{"exclusiveMaximum": true}""",   // dependency: requires maximum
      """{"exclusiveMinimum": true}""",   // dependency: requires minimum
      """{"exclusiveMaximum": 5}""",      // draft-4 form is boolean
      """{"enum": []}""",                 // draft-4 enum has minItems 1
      """{"required": []}""",             // draft-4 required has minItems 1
      """true""",                         // no boolean schemas in draft-4
      """{"multipleOf": 0}"""             // exclusiveMinimum 0 (boolean form)
    )) shouldBe Seq(false, false, false, false, false, false, false)
    // cross-draft divergence (per the reference's bundled copies): an empty
    // required array is VALID under draft-07 (stringArray has no minItems
    // there) but INVALID under draft-04; empty enum is invalid under both
    valid(Seq("""{"enum": []}""", """{"required": []}""")) shouldBe Seq(false, true)
    // and the draft-04 meta-schema validates itself
    valid04(Seq(MetaSchemas.draft04)) shouldBe Seq(true)
    // ... but is NOT a valid draft-04 instance of the draft-07 meta-schema?
    // it IS (draft-07 is laxer about the keywords it shares); assert the
    // asymmetric direction instead: the draft-07 meta-schema fails the
    // draft-04 meta-schema (numeric exclusiveMinimum in 'multipleOf')
    valid04(Seq(MetaSchemas.draft07)) shouldBe Seq(false)
  }

  private lazy val meta03 = Graft.parseSchema(MetaSchemas.draft03)
  private def valid03(docs: Seq[String]): Seq[Boolean] =
    Graft.validateJsonColumn(docs.toDF("doc"), "doc", meta03)
      .select("pass").collect().toSeq.map(_.getBoolean(0))

  test("draft-03 meta-schema: union types with embedded schemas, string dependencies, divisibleBy") {
    valid03(Seq(
      """{"type": "any"}""",
      """{"required": true, "type": "string"}""",          // draft-3 self-required form
      """{"dependencies": {"a": "b"}}""",                  // string-form dependency
      """{"dependencies": {"a": ["b", "c"]}}""",
      """{"divisibleBy": 2}""",
      """{"disallow": ["string", {"minimum": 0}]}""",      // union of name + schema
      """{"extends": {"minimum": 0}}""",
      """{"extends": [{"minimum": 0}, {"maximum": 9}]}""",
      """{"additionalProperties": false}""",               // boolean via union type
      """{"exclusiveMinimum": true, "minimum": 0}"""
    )) shouldBe Seq(true, true, true, true, true, true, true, true, true, true)
    valid03(Seq(
      """{"divisibleBy": 0}""",                 // exclusiveMinimum 0
      """{"type": ["string", 5]}""",            // 5 is neither a name nor a schema
      """{"dependencies": {"a": 5}}""",         // dep must be string/array/schema
      """{"exclusiveMinimum": true}""",         // string-form dependency unmet
      """{"enum": []}""",
      """{"required": "yes"}""",                // draft-3 required is boolean
      """true"""                                // no boolean root schemas in draft-3
    )) shouldBe Seq(false, false, false, false, false, false, false)
    // the draft-03 meta-schema validates itself
    valid03(Seq(MetaSchemas.draft03)) shouldBe Seq(true)
  }

  test("driver query shape: pass flag matches the closed-form oracle") {
    val q = SparkEntry.queries("q_metaschema")(spark, "/root/testdata/sf0.001")
    val bad = q.where(col("valid") =!= (pmod(col("event_id"), lit(8)).isin(0, 2, 4, 6)))
    bad.count() shouldBe 0L
  }
}
