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

  test("empty input table passes (sum over zero verdict rows is SQL NULL, not a crash)") {
    val cfg = TableValidationConfig(
      rowSpec = spec,
      keyCols = Seq("conv_id", "turn_idx"),
      uniqueness = Seq(UniquenessSpec(Seq("conv_id", "turn_idx"))))
    val report = TableRunner.run(turns.where(col("conv_id").isNull), cfg)
    report.pass() shouldBe true // pre-fix: NullPointerException
    report.violations.count() shouldBe 0L
  }

  test("two referential specs on one column both run (Map collision used to silently drop one)") {
    val cfg = TableValidationConfig(
      rowSpec = spec,
      keyCols = Seq("conv_id", "turn_idx"),
      referential = Seq(
        ReferentialSpec("role", Left(TranscriptGen.roleVocab)), // narrator violates
        ReferentialSpec("role", Left(Seq("user")))))            // much stricter
    val report = TableRunner.run(turns, cfg)
    // pre-fix: .toMap keyed by column collapsed these to ONE entry, so the
    // dropped spec's violations were never computed and pass() could lie
    report.referentialViolations.keySet shouldBe Set("role", "role#1")
    val loose = report.referentialViolations("role").count()
    val strict = report.referentialViolations("role#1").count()
    loose should be > 0L
    strict should be > loose
  }

  test("statsCols over a table without the partition column derives it like the row pass") {
    val noPart = turns.drop("part_id")
    val cfg = TableValidationConfig(
      rowSpec = spec,
      keyCols = Seq("conv_id", "turn_idx"),
      statsCols = Seq("role"))
    // pre-fix: TableChecks.stats groupBy'd the raw df on the absent column
    // and run() threw AnalysisException before returning a report
    val report = TableRunner.run(noPart, cfg)
    report.stats.get.count() should be > 0L
    report.stats.get.columns should contain("part_id")
  }

  test("Graft.validate honors CompileOptions (rowChecks used to drop opts silently)") {
    // a digit STRING column against a numeric bound — the q_weak_typing
    // divergence: strict mode skips numeric constraints on non-numbers
    // (zero violations), weak mode coerces and checks the bound
    val numSpec = SpecParser.parse("""{"properties":{"v":{"maximum":100}}}""")
    val df = turns.withColumn("v", (col("turn_idx") * 60).cast("string"))
    val strictFails = graft.Graft.validate(df, numSpec, Seq("conv_id", "turn_idx"))
      .flagged.where(!col("pass")).count()
    val weakFails = graft.Graft.validate(df, numSpec, Seq("conv_id", "turn_idx"),
        opts = graft.compile.CompileOptions(strictTypes = false))
      .flagged.where(!col("pass")).count()
    strictFails shouldBe 0L
    weakFails should be > 0L // pre-fix: 0 — opts never reached the compiler
  }
}
