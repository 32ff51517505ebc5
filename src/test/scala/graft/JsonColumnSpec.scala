package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** validateJsonColumn edge behavior: NULL documents pass (absent),
  * malformed JSON fails with a parse violation, violations carry exact
  * pointers/messages. */
class JsonColumnSpec extends SparkTestBase {

  test("null / malformed / failing / passing documents") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1L, null),
        Row(2L, "{not json"),
        Row(3L, """{"k": 99}"""),
        Row(4L, """{"k": 5}"""))),
      StructType(Seq(StructField("id", LongType), StructField("doc", StringType))))
    val out = Graft.validateJsonColumn(df, "doc",
      Graft.parseSchema("""{"type":"object","required":["k"],
        "properties":{"k":{"maximum":50}}}"""))
    val rows = out.select("id", "pass", "violations").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getSeq[Row](2)
        .map(v => (v.getString(0), v.getString(1), v.getString(2))))).toMap
    rows(1L)._1 shouldBe true
    rows(2L)._1 shouldBe false
    rows(2L)._2 shouldBe Seq(("", "Failed to parse JSON document.", "parse"))
    rows(3L)._1 shouldBe false
    rows(3L)._2.head shouldBe (("/k", "Expected number less than or equal to 50.000000", "maximum"))
    rows(4L)._1 shouldBe true
    rows(4L)._2 shouldBe empty
  }

  test("driver entry() smoke: violations present") {
    SparkEntry.entry(spark).count() should be > 0L
  }
}
