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
}
