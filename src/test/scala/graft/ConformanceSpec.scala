package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compile.Compiler
import graft.spec.SpecParser

/** Conformance harness mirroring the reference's JSON-Schema-Test-Suite
  * driver (`tests/test_validator.cpp:96-182`): files of
  * `{description, schema, tests: [{description, data, valid}]}` groups;
  * assertion is `validate(schema, data) == valid` per case.
  *
  * Data values are arbitrary JSON; they are lifted into typed single-row
  * DataFrames (flat-row convention: JSON objects become rows, other values
  * a single `doc` column). Cases whose data shape cannot inhabit a static
  * Spark type (heterogeneous arrays, objects with null-valued properties)
  * are skipped with a count assertion, like the reference's skip-lists
  * (test_validator.cpp:129-134). */
class ConformanceSpec extends SparkTestBase {

  private val mapper = new ObjectMapper()


  private def infer(n: JsonNode) = TypedLift.infer(n)

  /** Dynamic path: the document as an arbitrary JSON value through the
    * VariantType compiler — no typing restrictions, nothing skipped. */
  private def runCaseVariant(schemaJson: JsonNode, data: JsonNode,
                             ext: Map[String, String] = Map.empty): Boolean = {
    val spec = SpecParser.parseNode(schemaJson, ext)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(data.toString))),
      StructType(Seq(StructField("j", StringType))))
    val out = Graft.validateJsonColumnCatalyst(df, "j", spec)
    out.select("pass").collect()(0).getBoolean(0)
  }

  /** Native single-pass path: the ValidateVariantExpr document walk. */
  private def runCaseNative(schemaJson: JsonNode, data: JsonNode,
                            ext: Map[String, String] = Map.empty): (Boolean, Seq[(String, String)]) = {
    val spec = SpecParser.parseNode(schemaJson, ext)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(data.toString))),
      StructType(Seq(StructField("j", StringType))))
    val out = Graft.validateJsonColumn(df, "j", spec)
    val r = out.select("pass", "violations").collect()(0)
    (r.getBoolean(0), r.getSeq[Row](1).map(x => (x.getString(0), x.getString(1))))
  }

  private def runCase(schemaJson: JsonNode, data: JsonNode,
                      ext: Map[String, String] = Map.empty): Option[Boolean] = {
    val spec = SpecParser.parseNode(schemaJson, ext)
    infer(data).map {
      case (st: StructType, row: Row) =>
        val df = spark.createDataFrame(spark.sparkContext.parallelize(Seq(row)), st)
        val c = Compiler.compileRow(spec, st)
        df.select(c.pass).collect()(0).getBoolean(0)
      case (dt, v) =>
        val st = StructType(Seq(StructField("doc", dt)))
        val df = spark.createDataFrame(
          spark.sparkContext.parallelize(Seq(Row(v))), st)
        val c = Compiler.compile(spec, col("doc"), dt, lit(""))
        df.select(coalesce(c.pass, lit(true))).collect()(0).getBoolean(0)
    }
  }

  /** Optional per-group `externalDocs` map — the remote-$ref surface (the
    * reference's fetchDocument callback, schema_parser.hpp:143-158),
    * resolved offline from the group's own fixture map. */
  private def extDocsOf(g: JsonNode): Map[String, String] =
    Option(g.get("externalDocs")).map(_.properties().asScala
      .map(e => e.getKey -> e.getValue.toString).toMap).getOrElse(Map.empty)

  private def forEachCase(
      f: (String, Map[String, String], JsonNode, JsonNode, Boolean) => Unit): Unit = {
    val dir = new java.io.File(getClass.getResource("/conformance").toURI)
    dir.listFiles().filter(_.getName.endsWith(".json")).sortBy(_.getName).foreach { file =>
      mapper.readTree(file).elements().asScala.foreach { g =>
        val ext = extDocsOf(g)
        g.get("tests").elements().asScala.foreach { t =>
          f(s"${file.getName}: ${g.get("description").asText()} / ${t.get("description").asText()}",
            ext, g.get("schema"), t.get("data"),
            t.get("valid").asBoolean())
        }
      }
    }
  }

  test("conformance suite: typed-column path (JSON-Schema-Test-Suite format)") {
    var total = 0; var passed = 0; var skipped = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    forEachCase { (label, ext, schema, data, want) =>
      total += 1
      try runCase(schema, data, ext) match {
        case None => skipped += 1
        case Some(got) =>
          if (got == want) passed += 1
          else failures += s"$label: got $got want $want"
      } catch {
        case _: IllegalArgumentException => skipped += 1 // unsupported construct
      }
    }
    info(s"typed conformance: $passed passed, $skipped skipped, ${failures.size} failed of $total")
    failures.foreach(f => info(s"  FAIL $f"))
    failures shouldBe empty
    passed should be > 80
  }

  test("conformance suite: dynamic variant path (cyclic refs excepted)") {
    // The variant Catalyst path compiles the schema to a FINITE expression
    // tree, so cyclic $ref cannot inhabit it by design (Compiler.scala
    // throws with a pointer to the native path, which runs every case).
    // Those cases are the only permitted skips.
    var total = 0; var passed = 0; var cyclicSkipped = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    forEachCase { (label, ext, schema, data, want) =>
      total += 1
      try {
        val got = runCaseVariant(schema, data, ext)
        if (got == want) passed += 1
        else failures += s"$label: got $got want $want"
      } catch {
        case e: IllegalArgumentException if e.getMessage.contains("cyclic $ref") =>
          cyclicSkipped += 1
      }
    }
    info(s"variant conformance: $passed passed, $cyclicSkipped cyclic-ref skipped, " +
      s"${failures.size} failed of $total")
    failures.foreach(f => info(s"  FAIL $f"))
    failures shouldBe empty
    // cyclic-ref cases (metaschema_definitions, ref_recursion_loops, the
    // anchors file's recursive groups) are the only permitted skips here;
    // the native path below runs them all
    cyclicSkipped should be <= 90
    passed shouldBe total - cyclicSkipped
  }

  test("conformance suite: native single-pass validator (no skips)") {
    var total = 0; var passed = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    forEachCase { (label, ext, schema, data, want) =>
      total += 1
      val (got, _) = runCaseNative(schema, data, ext)
      if (got == want) passed += 1
      else failures += s"$label: got $got want $want"
    }
    info(s"native conformance: $passed passed, ${failures.size} failed of $total")
    failures.foreach(f => info(s"  FAIL $f"))
    failures shouldBe empty
    passed shouldBe total
  }

  test("native validator replicates the reference golden violation sequence") {
    val schema = mapper.readTree(
      """{"allOf": [
           {"items": {"type": "integer"}, "additionalItems": false, "type": "array"},
           {"items": {"type": "number"}, "additionalItems": false, "type": "array",
            "uniqueItems": true}]}""")
    val (pass, viols) = runCaseNative(schema, mapper.readTree("[1.5, 2.5, 3.5]"))
    pass shouldBe false
    viols shouldBe Seq(
      ("/0", "Value type not permitted by 'type' constraint."),
      ("",   "Failed to validate item #0 in array."),
      ("/1", "Value type not permitted by 'type' constraint."),
      ("",   "Failed to validate item #1 in array."),
      ("/2", "Value type not permitted by 'type' constraint."),
      ("",   "Failed to validate item #2 in array."),
      ("",   "Failed to validate against child schema #0."))
  }
}
