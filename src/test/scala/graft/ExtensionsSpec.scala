package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** SQL surface via GraftExtensions: minhash / simhash / validate_json
  * usable from plain SQL (same builders `spark.sql.extensions` injects). */
class ExtensionsSpec extends AnyFunSuite with Matchers {

  test("extension functions work from SQL") {
    val spark = SparkTestBase.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT minhash('hello world document', 8, 4) AS mh,
                simhash('hello world document') AS sh,
                validate_json('{"k": 99}',
                  '{"type":"object","properties":{"k":{"maximum":50}}}') AS res""").collect()(0)
    r.getSeq[Long](0).length shouldBe 4
    r.getLong(1) should not be 0L
    val res = r.getStruct(2)
    res.getBoolean(0) shouldBe false
    res.getSeq[org.apache.spark.sql.Row](1).map(_.getString(1)) should contain(
      "Expected number less than or equal to 50.000000")
  }

  test("format_check and regex_search_safe work from SQL") {
    val spark = SparkTestBase.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT format_check('2024-02-29', 'date') AS leap_ok,
                format_check('2023-02-29', 'date') AS nonleap,
                format_check('2000-01-01T00:00:00', 'date-time') AS permissive,
                format_check('2000-01-01T00:00:00', 'date-time', true) AS strict,
                regex_search_safe('tool_07', '^tool_[0-9]{2}$') AS re_ok,
                regex_search_safe('tool_7', '^tool_[0-9]{2}$') AS re_bad""").collect()(0)
    (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2), r.getBoolean(3),
      r.getBoolean(4), r.getBoolean(5)) shouldBe ((true, false, true, false, true, false))
  }

  test("yaml_to_json composes with validate_json in SQL") {
    val spark = SparkTestBase.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT yaml_to_json('v: 250') AS j,
                validate_json(yaml_to_json('v: 250'),
                  '{"properties":{"v":{"maximum":100}}}').pass AS bad,
                validate_json(yaml_to_json('v: 42'),
                  '{"properties":{"v":{"maximum":100}}}').pass AS ok,
                yaml_to_json(CAST(NULL AS STRING)) AS n""").collect()(0)
    r.getString(0) shouldBe """{"v":250}"""
    r.getBoolean(1) shouldBe false
    r.getBoolean(2) shouldBe true
    r.isNullAt(3) shouldBe true
  }

  test("props_to_json composes with validate_json in SQL") {
    val spark = SparkTestBase.spark
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT props_to_json('a.b=5\nc=x') AS j,
                props_to_json(CAST(NULL AS STRING)) AS n""").collect()(0)
    r.getString(0) shouldBe """{"a":{"b":"5"},"c":"x"}"""
    r.isNullAt(1) shouldBe true
  }
}
