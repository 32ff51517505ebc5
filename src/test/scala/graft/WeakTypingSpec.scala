package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.compile.{CompileOptions, Compiler}
import graft.spec.SpecParser

/** Weak-typing mode (valijson kWeakTypes, `validator.hpp:22-26`): cast-
  * permissive checks per `basic_adapter.hpp:335-547` maybe/as rules. */
class WeakTypingSpec extends SparkTestBase {
  import spark.implicits._

  private val weak = CompileOptions(strictTypes = false)

  private def passes(schema: String, df: DataFrame): Seq[Boolean] = {
    val c = Compiler.compile(SpecParser.parse(schema), col("doc"),
      df.schema("doc").dataType, lit(""), weak)
    df.select(coalesce(c.pass, lit(true))).collect().toSeq.map(_.getBoolean(0))
  }

  test("type: numeric strings satisfy integer/number in weak mode") {
    val df = Seq("12", "12.5", "x").toDF("doc")
    passes("""{"type":"integer"}""", df) shouldBe Seq(true, false, false)
    passes("""{"type":"number"}""", df) shouldBe Seq(true, true, false)
  }

  test("type: boolean-ish and null-ish strings") {
    val df = Seq("true", "false", "TRUE", "").toDF("doc")
    passes("""{"type":"boolean"}""", df) shouldBe Seq(true, true, false, false)
    passes("""{"type":"null"}""", df) shouldBe Seq(false, false, false, true)
  }

  test("type: numbers and booleans are maybeString") {
    passes("""{"type":"string"}""", Seq(1L, 2L).toDF("doc")) shouldBe Seq(true, true)
    passes("""{"type":"string"}""", Seq(true).toDF("doc")) shouldBe Seq(true)
    // strict mode still rejects
    val c = Compiler.compile(SpecParser.parse("""{"type":"string"}"""), col("doc"),
      org.apache.spark.sql.types.LongType, lit(""))
    Seq(1L).toDF("doc").select(c.pass).head().getBoolean(0) shouldBe false
  }

  test("numeric bounds apply to parseable strings; unparseable pass") {
    val df = Seq("5", "50", "abc", "7.5").toDF("doc")
    passes("""{"minimum":0,"maximum":10}""", df) shouldBe Seq(true, false, true, true)
  }

  test("multipleOf on strings in weak mode") {
    passes("""{"multipleOf":3}""", Seq("9", "10", "x").toDF("doc")) shouldBe Seq(true, false, true)
    passes("""{"multipleOf":1.5}""", Seq("4.5", "35").toDF("doc")) shouldBe Seq(true, false)
  }

  test("length/pattern on numbers via asString (std::to_string semantics)") {
    // integer 1234 -> "1234" (len 4); double 1.5 -> "1.500000" (len 8)
    passes("""{"minLength":4}""", Seq(1234L).toDF("doc")) shouldBe Seq(true)
    passes("""{"minLength":5}""", Seq(1234L).toDF("doc")) shouldBe Seq(false)
    passes("""{"minLength":8,"maxLength":8}""", Seq(1.5).toDF("doc")) shouldBe Seq(true)
    passes("""{"pattern":"^true$"}""", Seq(true).toDF("doc")) shouldBe Seq(true)
    passes("""{"pattern":"^12"}""", Seq(1234L).toDF("doc")) shouldBe Seq(true)
  }

  test("empty array is maybeObject; empty map is maybeArray") {
    val adf = Seq(Seq.empty[Long], Seq(1L)).toDF("doc")
    passes("""{"type":"object"}""", adf) shouldBe Seq(true, false)
    val mdf = Seq(Map.empty[String, Long], Map("a" -> 1L)).toDF("doc")
    passes("""{"type":"array"}""", mdf) shouldBe Seq(true, false)
  }
}
