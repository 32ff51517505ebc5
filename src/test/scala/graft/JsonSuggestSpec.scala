package graft

import org.apache.spark.sql.functions._

import graft.checks.{JsonSuggest, Suggest}

/** JSON-payload schema induction: variant schema-string parsing, the
  * per-path suggestion rules (presence vs JSON null, nesting, mixed
  * types, arrays), and the round-trip invariant. */
class JsonSuggestSpec extends SparkTestBase {

  import spark.implicits._

  test("variant schema-string parser: nesting, quoting, decimals") {
    import JsonSuggest._
    parseVariantSchema("BIGINT") shouldBe VScalar("BIGINT")
    parseVariantSchema("OBJECT<>") shouldBe VObject(Vector.empty)
    parseVariantSchema("OBJECT<a: BIGINT, b: STRING>") shouldBe
      VObject(Vector("a" -> VScalar("BIGINT"), "b" -> VScalar("STRING")))
    parseVariantSchema("OBJECT<`a b`: DECIMAL(3,2), c: ARRAY<STRING>>") shouldBe
      VObject(Vector("a b" -> VScalar("DECIMAL(3,2)"),
                     "c" -> VArray(VScalar("STRING"))))
    parseVariantSchema("OBJECT<`x``y`: OBJECT<z: DOUBLE>>") shouldBe
      VObject(Vector("x`y" -> VObject(Vector("z" -> VScalar("DOUBLE")))))
    an[IllegalArgumentException] should be thrownBy
      parseVariantSchema("OBJECT<a BIGINT>")
  }

  private val corpus = Seq(
    """{"k": 1, "s": "a", "arr": [1,2], "nested": {"x": "u"}}""",
    """{"k": 5, "s": "b", "arr": [1], "nested": {"x": "v"}}""",
    """{"k": 3, "s": "a"}"""
  ).toDF("doc")

  test("induced suggestions: nesting, presence-based required, bounds") {
    val rows = JsonSuggest.suggestions(corpus, "doc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows shouldBe Set(
      ("", "type", "\"object\""),
      ("/k", "type", "\"integer\""),
      ("/k", "required", "true"),
      ("/k", "minimum", "1"),
      ("/k", "maximum", "5"),
      ("/s", "type", "\"string\""),
      ("/s", "required", "true"),
      ("/s", "minLength", "1"),
      ("/s", "maxLength", "1"),
      // s: 2 distinct of 3 → fails the default 0.5 fraction rule, no enum
      ("/arr", "type", "\"array\""),       // present 2 of 3 → not required
      ("/arr", "minItems", "1"),
      ("/arr", "maxItems", "2"),
      ("/nested", "type", "\"object\""),
      ("/nested/x", "type", "\"string\""),
      ("/nested/x", "required", "true"),   // present in BOTH docs with nested
      ("/nested/x", "minLength", "1"),
      ("/nested/x", "maxLength", "1"))

    val loose = JsonSuggest.suggestions(corpus, "doc",
      Suggest.Options(enumMaxFraction = 1.0))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    loose should contain(("/s", "enum", "[\"a\",\"b\"]"))
    loose should contain(("/nested/x", "enum", "[\"u\",\"v\"]"))
  }

  test("mixed types, JSON nulls and invalid rows follow the variant merge") {
    val messy = Seq(
      """{"m": 1, "n": null, "v": null}""",
      """{"m": "x", "n": 2, "v": null}""",
      """not valid json at all""",
      null.asInstanceOf[String]
    ).toDF("doc")
    val rows = JsonSuggest.suggestions(messy, "doc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // m merges BIGINT+STRING → VARIANT: presence rules only, no type
    rows should contain(("/m", "required", "true"))
    rows.filter(_._1 == "/m").map(_._2) shouldBe Set("required")
    // n mixes JSON null with BIGINT → faithful ["integer","null"] union
    rows should contain(("/n", "type", "[\"integer\",\"null\"]"))
    rows should contain(("/n", "minimum", "2"))
    // v is ONLY JSON null → VOID → type "null"
    rows should contain(("/v", "type", "\"null\""))
    // the invalid row and the NULL row are excluded from every rule
    rows should contain(("/m", "required", "true")) // 2 of 2 parsed docs
  }

  test("round-trip: suggested schema validates its own messy source clean; drift fails") {
    val messy = Seq(
      """{"k": 1, "s": "aa", "n": null}""",
      """{"k": 9, "s": "bb", "n": 4}""",
      """{"k": 4, "s": "cc"}"""
    ).toDF("doc")
    val spec = JsonSuggest.suggestSchema(messy, "doc",
      Suggest.Options(enumMaxFraction = 1.0))
    val clean = Graft.validateJsonColumn(messy, "doc", spec)
    clean.where(!col("pass")).count() shouldBe 0L

    val drifted = Seq(
      """{"k": 10, "s": "aa"}""",          // maximum(k)=9
      """{"k": 4, "s": "zz"}""",           // enum(s)=[aa,bb,cc]
      """{"s": "aa"}"""                    // required k
    ).toDF("doc")
    val dv = Graft.validateJsonColumn(drifted, "doc", spec)
    dv.where(!col("pass")).count() shouldBe 3L
  }

  test("round-trip on testdata events.props (sf0.001)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val spec = JsonSuggest.suggestSchema(ev, "props")
    Graft.validateJsonColumn(ev.select("event_id", "props"), "props", spec)
      .where(!col("pass")).count() shouldBe 0L
  }

  test("unaddressable keys (quotes, control chars) degrade to no suggestions, never a crash") {
    // apostrophe keys ARE addressable via the double-quote bracket form —
    // full evidence, no crash (Spark's grammar has no quote escape, but it
    // has both quote kinds)
    val quoted = Seq(
      """{"it's": 1, "ok": 2}""",
      """{"it's": 5, "ok": 3}"""
    ).toDF("doc")
    val rows = JsonSuggest.suggestions(quoted, "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    rows should contain(("/it's", "minimum"))
    rows should contain(("/it's", "required"))
    rows should contain(("/ok", "minimum"))
    // a key with BOTH quote kinds is genuinely unaddressable: no rows
    val both = Seq("""{"a'b\"c": 1, "ok": 2}""").toDF("doc")
    val bothRows = JsonSuggest.suggestions(both, "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    bothRows.map(_._1) should not contain "/a'b\"c"
    bothRows should contain(("/ok", "minimum"))

    // a null-bearing UNADDRESSABLE path must not get a bare type row (no
    // presence scan ran, so the null count is unknowable) — the round-trip
    // on its own source must stay clean
    val tabKey = Seq(
      """{"a\tb": 1, "ok": 1}""",
      """{"a\tb": null, "ok": 2}"""
    ).toDF("doc")
    val tabRows = JsonSuggest.suggestions(tabKey, "doc")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    tabRows.map(_._1) should not contain "/a\tb"
    val spec = JsonSuggest.suggestSchema(tabKey, "doc")
    Graft.validateJsonColumn(tabKey, "doc", spec)
      .where(!col("pass")).count() shouldBe 0L
  }

  test("format detection on JSON string fields, incl. null-union paths") {
    val docs = Seq(
      """{"ts": "2024-01-05T10:00:00Z", "d": "2024-01-01", "free": "x"}""",
      """{"ts": "2023-12-31T23:59:59+01:00", "d": null, "free": "2024-01-01"}"""
    ).toDF("doc")
    val rows = JsonSuggest.suggestions(docs, "doc")
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows should contain(("/ts", "format", "\"date-time\""))
    // null-bearing path: format derives from the STRING occurrences only,
    // and the type is the faithful union
    rows should contain(("/d", "format", "\"date\""))
    rows should contain(("/d", "type", "[\"string\",\"null\"]"))
    rows.filter(_._1 == "/free").map(_._2) should not contain "format"
    // round-trip: JSON null passes FormatC (applies to strings only)
    val spec = JsonSuggest.suggestSchema(docs, "doc")
    Graft.validateJsonColumn(docs, "doc", spec)
      .where(!col("pass")).count() shouldBe 0L
  }

  test("per-key induction derives the dispatch registry; round-trip through validateJsonColumnBy") {
    val df = Seq(
      ("search", """{"q": "cats", "limit": 10}"""),
      ("search", """{"q": "dogs"}"""),
      ("fetch", """{"url": "http://a", "retries": 2}"""),
      ("fetch", """{"url": "http://bb", "retries": 0}"""),
      (null.asInstanceOf[String], """{"x": 1}""")
    ).toDF("tool", "args")
    val rows = JsonSuggest.suggestionsBy(df, "args", "tool").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)))
      .toSet
    rows should contain(("search", "/q", "required", "true"))
    rows should contain(("search", "/limit", "maximum", "10"))
    rows should not contain (("search", "/limit", "required", "true"))
    rows should contain(("fetch", "/retries", "minimum", "0"))
    rows should contain(("fetch", "/url", "minLength", "8"))
    // the NULL-key row is not profiled (dispatch sends it to the default)
    rows.map(_._2) should not contain "/x"

    val registry = JsonSuggest.suggestSchemasBy(df, "args", "tool")
    registry.keySet shouldBe Set("search", "fetch")
    Graft.validateJsonColumnBy(df.where(col("tool").isNotNull), "args", "tool",
      registry).where(!col("pass")).count() shouldBe 0L
    // a payload violating ITS OWN key's induced schema fails
    val bad = Seq(("fetch", """{"retries": 5}""")).toDF("tool", "args")
    Graft.validateJsonColumnBy(bad, "args", "tool", registry)
      .where(!col("pass")).count() shouldBe 1L
  }

  test("profileBy refuses unbounded key vocabularies") {
    val df = Seq(("a", "{}"), ("b", "{}"), ("c", "{}")).toDF("k", "doc")
    an[IllegalArgumentException] should be thrownBy
      JsonSuggest.profileBy(df, "doc", "k", maxKeys = 2)
  }

  test("no parseable document yields no suggestions") {
    val bad = Seq("nope", null.asInstanceOf[String]).toDF("doc")
    JsonSuggest.profile(bad, "doc") shouldBe Seq.empty
  }
}
