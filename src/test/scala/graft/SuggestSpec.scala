package graft

import org.apache.spark.sql.functions._

import graft.checks.Suggest
import graft.spec._

/** Constraint suggestion (Deequ-style profiler emitting the reference's own
  * keyword vocabulary): rule evidence, eligibility edges, and the
  * round-trip invariant (a suggested schema validates its source with zero
  * violations — every rule is an observed invariant). */
class SuggestSpec extends SparkTestBase {

  import spark.implicits._

  private val df = Seq(
    (1L, Some("alpha"), "a", Some(1.5)),
    (2L, Some("beta"), "b", Some(2.0)),
    (3L, None: Option[String], "a", Some(-0.5)),
    (4L, Some("gamma-long"), "c", None: Option[Double]),
    (5L, Some("delta"), "a", Some(9.25))
  ).toDF("id", "name", "cat", "score")

  test("suggestion rules: type/required/bounds/lengths/enum from evidence") {
    val rows = Suggest.suggestions(df, Seq("id", "name", "cat", "score"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows shouldBe Set(
      ("id", "type", "\"integer\""),
      ("id", "required", "true"),
      ("id", "minimum", "1"),
      ("id", "maximum", "5"),
      ("name", "type", "\"string\""),
      // one NULL → not required; lengths over non-null values only
      ("name", "minLength", "4"),
      ("name", "maxLength", "10"),
      ("cat", "type", "\"string\""),
      ("cat", "required", "true"),
      ("cat", "minLength", "1"),
      ("cat", "maxLength", "1"),
      // 3 distinct of 5 non-null → within maxDistinct=8 AND ≤ 0.5·5? No:
      // 3 > 2.5 — so with the DEFAULT fraction cat is NOT an enum. Widen
      // the fraction to admit it and the values arrive sorted + rendered.
      ("score", "type", "\"number\""),
      ("score", "minimum", "-0.5"),
      ("score", "maximum", "9.25"))

    val loose = Suggest.suggestions(df, Seq("cat"),
      Suggest.Options(enumMaxFraction = 1.0))
      .collect().map(r => (r.getString(1), r.getString(2))).toSet
    loose should contain(("enum", "[\"a\",\"b\",\"c\"]"))
  }

  test("enum eligibility edges: unique, single-valued, and id-like columns refused") {
    val u = Seq("u1", "u2", "u3", "u4").toDF("v")          // all distinct
    val single = Seq("x", "x", "x", "x").toDF("v")          // 1 distinct
    def kws(d: org.apache.spark.sql.DataFrame) =
      Suggest.suggestions(d, Seq("v")).collect().map(_.getString(1)).toSet
    kws(u) should not contain "enum"       // fraction rule (4 > 0.5*4)
    kws(single) should not contain "enum"  // needs >= 2 distinct values
    // JSON rendering escapes through Jackson (quotes/backslashes exact)
    val tricky = Seq("a\"b", "a\"b", "c\\d", "c\\d", "e", "e").toDF("v")
    val rows = Suggest.suggestions(tricky, Seq("v"),
      Suggest.Options(enumMaxFraction = 1.0)).collect()
      .map(r => (r.getString(1), r.getString(2))).toMap
    rows("enum") shouldBe "[\"a\\\"b\",\"c\\\\d\",\"e\"]"
  }

  test("round-trip: the suggested schema validates its own source clean; a drifted row fails") {
    val spec = Suggest.suggestSchema(df, Seq("id", "name", "cat", "score"))
    val v = Graft.validate(df, spec, Seq("id"))
    v.flagged.where(!col("pass")).count() shouldBe 0L
    v.violations.count() shouldBe 0L

    // same schema, data drifted out of the observed invariants
    val drifted = Seq(
      (6L, Some("x"), "zzz-not-short", Some(99.0)) // maxLength(cat)=1, max(score)=9.25
    ).toDF("id", "name", "cat", "score")
    val dv = Graft.validate(drifted, spec, Seq("id"))
    dv.flagged.where(!col("pass")).count() shouldBe 1L
    val descs = dv.violations.select("description").as[String].collect().toSet
    descs.exists(_.contains("String should be no more than")) ||
      descs.exists(_.contains("less than or equal")) shouldBe true
  }

  test("round-trip on testdata documents (sf0.001): suggested schema is clean on source") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")
    val spec = Suggest.suggestSchema(docs, cols)
    Graft.validate(docs, spec, Seq("doc_id"))
      .flagged.where(!col("pass")).count() shouldBe 0L
  }

  test("format detection: all-matching string columns get the engine's format keyword") {
    val df = Seq(
      ("2024-01-05", "10.0.0.1", "hello", "12:30:00"),
      ("2023-12-31", "255.255.255.255", "2024-01-01", "23:59:60")
    ).toDF("day", "ip", "mixed", "tm")
    val rows = Suggest.suggestions(df, Seq("day", "ip", "mixed", "tm"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    rows should contain(("day", "format", "\"date\""))
    rows should contain(("ip", "format", "\"ipv4\""))
    rows should contain(("tm", "format", "\"time\"")) // leap second allowed
    // one non-date value → no format suggestion (every rule is an invariant)
    rows.filter(_._1 == "mixed").map(_._2) should not contain "format"

    // round-trip clean; a calendar-invalid date then fails the format
    val spec = Suggest.suggestSchema(df, Seq("day", "ip", "mixed", "tm"))
    Graft.validate(df, spec, Seq("day")).flagged
      .where(!col("pass")).count() shouldBe 0L
    val drifted = Seq(("2024-13-01", "10.0.0.1", "x", "12:30:00"))
      .toDF("day", "ip", "mixed", "tm")
    Graft.validate(drifted, spec, Seq("day")).violations
      .where(col("kind") === "format").count() should be >= 1L
  }

  test("suggestion diff: added / removed / changed invariants between corpus versions") {
    val before = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "cat")
    val after = Seq((1L, Some("a")), (9L, Some("b")),
      (3L, None: Option[String])).toDF("id", "cat")
    val d = Suggest.suggestionDiff(before, after, Seq("id", "cat"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
                 r.getString(3), r.getString(4))).toSet
    d shouldBe Set(
      // the new corpus' max moved
      ("id", "maximum", "changed", "3", "9"),
      // a NULL appeared in cat → the required invariant dissolved
      ("cat", "required", "removed", "true", null))
    // identical corpora → empty report
    Suggest.suggestionDiff(before, before, Seq("id", "cat")).count() shouldBe 0L
  }

  test("profile is two scans' worth of driver state: no collect of corpus data") {
    // the profile of a high-cardinality string column must not buffer its
    // values anywhere: only the tiny per-column cardinality row comes back
    val big = spark.range(0, 10000).select(
      col("id"), concat(lit("v"), col("id")).as("s"))
    val p = Suggest.profile(big, Seq("s"))
    p.head.distinct shouldBe Some(10000L)
    p.head.enumValues shouldBe None
  }
}
