package graft

import org.apache.spark.sql.functions._

/** Exploratory: Spark 4 variant capabilities used by the dynamic-JSON
  * compiler path (deleted once the real spec lands). */
class VariantExploreSpec extends SparkTestBase {
  import spark.implicits._

  test("variant: schema_of_variant, casts to map/array of variant") {
    val df = Seq(
      """{"a": 1, "b": "x"}""",
      """[1, 2.5, "s"]""",
      """"hello"""",
      """12""",
      """12.5""",
      """true""",
      """null""",
      """not json"""
    ).toDF("j").select(col("j"), try_parse_json(col("j")).as("v"))
    val out = df.select(
      col("j"),
      schema_of_variant(col("v")).as("sch"),
      col("v").try_cast("map<string,variant>").isNotNull.as("as_map"),
      col("v").try_cast("array<variant>").isNotNull.as("as_arr"),
      col("v").try_cast("string").as("as_str"),
      col("v").try_cast("bigint").as("as_long"),
      is_variant_null(col("v")).as("is_null"),
      col("v").isNull.as("parse_fail"))
    out.collect().foreach(r => info(r.toString))
    succeed
  }

  test("variant: map_keys / element_at / size on cast results") {
    val df = Seq("""{"a": 1, "b": [1,2,3]}""").toDF("j")
      .select(try_parse_json(col("j")).as("v"))
    val m = df.select(col("v").try_cast("map<string,variant>").as("m"))
    val r = m.select(
      org.apache.spark.sql.functions.size(col("m")).as("n"),
      map_keys(col("m")).as("ks"),
      schema_of_variant(element_at(col("m"), "a")).as("ta"),
      org.apache.spark.sql.functions.size(element_at(col("m"), "b").try_cast("array<variant>")).as("blen")).head()
    info(r.toString)
    succeed
  }
}
