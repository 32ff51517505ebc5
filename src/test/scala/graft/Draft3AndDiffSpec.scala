package graft

import org.apache.spark.sql.functions._

import graft.checks.TableChecks
import graft.compile.{CompileOptions, Compiler}
import graft.spec.SpecParser

/** Draft-3 keywords, strictDateTime mode, verdict regression diff, run
  * metrics. */
class Draft3AndDiffSpec extends SparkTestBase {
  import spark.implicits._

  private def passes(schema: String, df: org.apache.spark.sql.DataFrame,
                     opts: CompileOptions = CompileOptions()): Seq[Boolean] = {
    val c = Compiler.compile(SpecParser.parse(schema), col("doc"),
      df.schema("doc").dataType, lit(""), opts)
    df.select(coalesce(c.pass, lit(true))).collect().toSeq.map(_.getBoolean(0))
  }

  test("draft3: divisibleBy behaves like multipleOf") {
    passes("""{"divisibleBy":3}""", Seq(9L, 10L).toDF("doc")) shouldBe Seq(true, false)
  }

  test("draft3: extends = allOf; disallow = not-anyOf") {
    passes("""{"minimum":0,"extends":{"maximum":10}}""",
      Seq(5L, 20L, -1L).toDF("doc")) shouldBe Seq(true, false, false)
    passes("""{"disallow":"integer"}""", Seq(1L).toDF("doc")) shouldBe Seq(false)
    passes("""{"disallow":"integer"}""", Seq("x").toDF("doc")) shouldBe Seq(true)
    passes("""{"disallow":[{"minimum":100},"boolean"]}""",
      Seq(5L, 200L).toDF("doc")) shouldBe Seq(true, false)
  }

  test("strictDateTime: offsetless date-time rejected in strict, accepted in permissive") {
    val df = Seq("2022-07-18T16:52:45", "2022-07-18T16:52:45Z").toDF("doc")
    passes("""{"format":"date-time"}""", df) shouldBe Seq(true, true) // permissive default
    passes("""{"format":"date-time"}""", df,
      CompileOptions(strictDateTime = true)) shouldBe Seq(false, true)
  }

  test("verdictDiff surfaces changed partitions only") {
    val prev = Seq((0L, 100L, 0L, true), (1L, 100L, 2L, false))
      .toDF("part_id", "rows", "fail_rows", "pass")
    val curSame = Seq((0L, 100L, 0L, true), (1L, 100L, 2L, false))
      .toDF("part_id", "rows", "fail_rows", "pass")
    TableChecks.verdictDiff(prev, curSame).count() shouldBe 0L
    val curChanged = Seq((0L, 100L, 1L, false), (1L, 100L, 2L, false))
      .toDF("part_id", "rows", "fail_rows", "pass")
    val diff = TableChecks.verdictDiff(prev, curChanged).collect()
    diff.map(_.getString(4)).sorted shouldBe Array("cur_only", "prev_only")
  }

  test("resumable run writes lineage metrics JSONL") {
    val dir = java.nio.file.Files.createTempDirectory("graft-metrics").toString
    val turns = graft.data.TranscriptGen.turns(spark, 200, parts = 2, numParts = 4)
    val spec = SpecParser.parse(graft.data.TranscriptGen.transcriptSchemaJson)
    graft.run.Runner.runResumable(spark, turns, spec, Seq("conv_id", "turn_idx"), dir, "m1")
    val metrics = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "metrics-m1.jsonl"))
    metrics should include(""""run_id":"m1"""")
    metrics should include(""""partitions":4""")
    // part ids are strings now (partition values may be dates/names, not
    // just ints), and the record is Jackson-serialized so a runId with
    // quotes/backslashes can no longer produce an unparseable line
    metrics should include(""""part_ids":["0","1","2","3"]""")
    com.fasterxml.jackson.databind.json.JsonMapper.builder().build()
      .readTree(metrics.linesIterator.next()) should not be null
  }
}
