package graft

import org.apache.spark.sql.functions.{col, length => fnLength}

import graft.checks.Drift
import graft.data.TranscriptGen
import graft.run.TableRunner
import graft.run.TableRunner._
import graft.spec.SpecParser

class TableRunnerSpec extends SparkTestBase {

  lazy val turns = TranscriptGen.turns(spark, 1500, parts = 4, numParts = 8).cache()
  lazy val spec = SpecParser.parse(TranscriptGen.transcriptSchemaJson)

  test("full table validation report: all check families wired") {
    val baseline = Drift.sketch(turns, fnLength(col("text")).cast("double"), 0, 200, 20)
    val cfg = TableValidationConfig(
      rowSpec = spec,
      keyCols = Seq("conv_id", "turn_idx"),
      uniqueness = Seq(UniquenessSpec(Seq("conv_id", "turn_idx"))),
      referential = Seq(ReferentialSpec("tool", Left(TranscriptGen.toolVocab))),
      statsCols = Seq("role", "turn_idx"),
      drift = Seq(DriftSpec("text_len", Some(fnLength(col("text")).cast("double")), baseline)))
    val report = TableRunner.run(turns, cfg)
    // injected violations make every family non-trivial except drift
    report.violations.count() should be > 0L
    report.duplicateKeys.values.head.count() should be > 0L
    report.referentialViolations.values.head.count() should be > 0L
    report.stats.get.count() shouldBe 8L
    report.driftVerdicts.head._2.pass shouldBe true // same distribution
    report.pass() shouldBe false // row violations + dups + refs
  }

  test("clean table passes") {
    val clean = turns
      .where(col("role").isin(TranscriptGen.roleVocab: _*))
      .where(fnLength(col("text")) > 0)
      .where(!col("conv_id").isin("c0000000000")) // keep it simple
      .dropDuplicates("conv_id", "turn_idx")
      .where(col("tool").isNull || col("tool").rlike("^tool_[0-9]{2}$"))
    val cfg = TableValidationConfig(
      rowSpec = spec,
      keyCols = Seq("conv_id", "turn_idx"),
      uniqueness = Seq(UniquenessSpec(Seq("conv_id", "turn_idx"))),
      referential = Seq(ReferentialSpec("tool", Left(TranscriptGen.toolVocab))))
    TableRunner.run(clean, cfg).pass() shouldBe true
  }
}
