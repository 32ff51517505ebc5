package graft

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, JsonNodeFactory}
import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.compile.{CompileOptions, Compiler}

/** Seeded random cross-path conformance fuzzing — the engine's three
  * independent evaluators (typed Catalyst compiler, variant Catalyst
  * compiler, native document walker) used as MUTUAL ORACLES, the cheap way
  * to buy the official suite's breadth automatically (the reference buys the
  * same confidence from libFuzzer, `tests/fuzzing/fuzzer.cpp`, plus
  * cross-adapter equivalence, `tests/test_adapter_comparison.cpp`).
  *
  * Schemas and documents are generated from a SHARED small vocabulary so
  * constraints and values collide on boundaries constantly; every value is
  * derived from a fixed seed — no wall-clock anywhere.
  *
  * Per schema, all documents run as ONE DataFrame through each path (2
  * Spark actions per schema, not 2 per case), keeping thousands of cases
  * affordable.
  */
class ConformanceFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val mapper = new ObjectMapper()
  private val F = JsonNodeFactory.instance

  // ---- shared vocabulary ----------------------------------------------------
  private val propNames = Vector("a", "b", "c", "p~q", "x/y", "\ud83d\udc32")
  private val stringPool = Vector("", "a", "ab", "abc", "foo", "bar", "0", "12",
    "true", "2024-01-15", "2024-02-30", "12:30:00Z", "23:59:60Z", "04:00:60Z",
    "1985-04-12T23:20:50.52Z", "1.2.3.4", "256.1.1.1", "αβγ", "💩x",
    // code-point edges: NFC vs NFD e-acute, astral clef, embedded NUL
    "\u00e9", "e\u0301", "\ud834\udd1e", "a\u0000b",
    // astral runs: quantifier/class behavior over surrogate pairs must agree
    // across paths (and both regex engines)
    "\ud83d\udc32", "\ud83d\udc32\ud83d\udc32", "\ud83d\udc32\ud83d\udc09")
  // includes the 2^53 boundary and int64 extremes to stress double-space
  // number equality (getNumber collapse, basic_adapter.hpp:516,633-651)
  private val longPool = Vector(-2L, -1L, 0L, 1L, 2L, 3L, 5L, 10L,
    9007199254740992L, 9007199254740993L, Long.MaxValue, Long.MinValue)
  private val doublePool = Vector(-1.5, 0.5, 1.5, 2.5, 7.0, 7.5, 10.0,
    9.007199254740992e15, 1e300, -1e300, 1e-300, java.lang.Double.MIN_VALUE,
    // signed zero: equal in double space everywhere, distinct in raw bits —
    // the r5 typed-uniqueItems bug class
    -0.0, 0.0)
  private val patternPool = Vector("^a", "b$", "[0-9]+", "^[a-z]{2,4}$",
    "foo|bar", "x.z", "\\d\\d", "^\\w+$", "a{2,3}",
    "^\ud83d\udc32*$", "[\ud83d\udc09-\ud83d\udc32]")
  private val formatPool = Vector("date", "time", "date-time", "ipv4", "custom-thing")

  // ---- document generator ---------------------------------------------------
  private def genValue(r: Random, depth: Int): com.fasterxml.jackson.databind.JsonNode =
    r.nextInt(if (depth <= 0) 7 else 10) match {
      case 0 => F.nullNode()
      case 1 => F.booleanNode(r.nextBoolean())
      case 2 | 3 => F.numberNode(longPool(r.nextInt(longPool.size)))
      case 4 => F.numberNode(doublePool(r.nextInt(doublePool.size)))
      case 5 | 6 => F.textNode(stringPool(r.nextInt(stringPool.size)))
      case 7 | 8 =>
        val o = F.objectNode()
        (0 until r.nextInt(4)).foreach { _ =>
          o.set[ObjectNode](propNames(r.nextInt(propNames.size)), genValue(r, depth - 1))
        }
        o
      case _ =>
        val a = F.arrayNode()
        (0 until r.nextInt(5)).foreach(_ => a.add(genValue(r, depth - 1)))
        a
    }

  // ---- schema generator -----------------------------------------------------
  /** One random keyword applied to `o`. `refsOk` gates `$ref` emission. */
  private def addKeyword(r: Random, o: ObjectNode, depth: Int, refsOk: Boolean): Unit = {
    def sub(): ObjectNode = genSchema(r, depth - 1, refsOk)
    r.nextInt(24) match {
      case 0 =>
        if (r.nextBoolean()) o.put("type", Vector("null", "boolean", "integer",
          "number", "string", "array", "object")(r.nextInt(7)))
        else {
          val a = o.putArray("type")
          r.shuffle(Vector("null", "boolean", "integer", "number", "string",
            "array", "object")).take(1 + r.nextInt(2)).foreach(a.add)
        }
      case 1 =>
        val e = o.putArray("enum")
        (0 until 1 + r.nextInt(3)).foreach(_ => e.add(genValue(r, 1)))
      case 2 => o.set[ObjectNode]("const", genValue(r, 1))
      case 3 => o.put("minimum", longPool(r.nextInt(longPool.size)))
      case 4 => o.put("maximum", doublePool(r.nextInt(doublePool.size)))
      case 5 => if (r.nextBoolean()) o.put("exclusiveMinimum", 0L)
                else o.put("exclusiveMaximum", 2.5)
      case 6 => if (r.nextBoolean()) o.put("multipleOf", 1 + r.nextInt(4))
                else o.put("multipleOf", Vector(0.5, 1.5, 2.5)(r.nextInt(3)))
      case 7 => o.put("pattern", patternPool(r.nextInt(patternPool.size)))
      case 8 => o.put("minLength", r.nextInt(5))
      case 9 => o.put("maxLength", r.nextInt(7))
      case 10 => o.put("format", formatPool(r.nextInt(formatPool.size)))
      case 11 =>
        val req = o.putArray("required")
        r.shuffle(propNames).take(1 + r.nextInt(2)).foreach(req.add)
      case 12 if depth > 0 =>
        val props = o.putObject("properties")
        r.shuffle(propNames).take(1 + r.nextInt(3)).foreach(p => props.set[ObjectNode](p, sub()))
        if (r.nextInt(3) == 0) {
          val pp = o.putObject("patternProperties")
          pp.set[ObjectNode](Vector("^a", "b$", "^[ab]")(r.nextInt(3)), sub())
        }
        if (r.nextInt(3) == 0) {
          if (r.nextBoolean()) o.put("additionalProperties", r.nextBoolean())
          else o.set[ObjectNode]("additionalProperties", sub())
        }
      case 13 => o.put("minProperties", r.nextInt(3))
      case 14 => o.put("maxProperties", r.nextInt(4))
      case 15 if depth > 0 =>
        val pn = o.putObject("propertyNames")
        if (r.nextBoolean()) pn.put("maxLength", 1 + r.nextInt(3))
        else pn.put("pattern", Vector("^a", "^[a-c]$")(r.nextInt(2)))
      case 16 if depth > 0 =>
        val d = o.putObject("dependencies")
        val k = propNames(r.nextInt(propNames.size))
        if (r.nextBoolean()) {
          val arr = d.putArray(k)
          arr.add(propNames(r.nextInt(propNames.size)))
        } else d.set[ObjectNode](k, sub())
      case 17 if depth > 0 =>
        if (r.nextBoolean()) o.set[ObjectNode]("items", sub())
        else {
          val its = o.putArray("items")
          (0 until 1 + r.nextInt(2)).foreach(_ => its.add(sub()))
          if (r.nextBoolean()) o.put("additionalItems", r.nextBoolean())
          else if (r.nextBoolean()) o.set[ObjectNode]("additionalItems", sub())
        }
      case 18 => o.put("minItems", r.nextInt(3)); if (r.nextBoolean()) o.put("maxItems", 2 + r.nextInt(3))
      case 19 => o.put("uniqueItems", true)
      case 20 if depth > 0 => o.set[ObjectNode]("contains", sub())
      case 21 if depth > 0 =>
        val comb = Vector("allOf", "anyOf", "oneOf")(r.nextInt(3))
        val arr = o.putArray(comb)
        (0 until 1 + r.nextInt(2)).foreach(_ => arr.add(sub()))
      case 22 if depth > 0 => o.set[ObjectNode]("not", sub())
      case 23 if depth > 0 =>
        o.set[ObjectNode]("if", sub())
        if (r.nextBoolean()) o.set[ObjectNode]("then", sub())
        if (r.nextBoolean()) o.set[ObjectNode]("else", sub())
      case _ => o.put("minimum", 0L) // depth-gated cases fall back to a leaf
    }
  }

  private def genSchema(r: Random, depth: Int, refsOk: Boolean): ObjectNode = {
    if (refsOk && depth > 0 && r.nextInt(6) == 0) {
      // draft-7 $ref node: siblings ignored, so emit it alone
      val o = F.objectNode()
      o.put("$ref", s"#/definitions/d${r.nextInt(2)}")
      return o
    }
    val o = F.objectNode()
    (0 until 1 + r.nextInt(2)).foreach(_ => addKeyword(r, o, depth, refsOk))
    o
  }

  private def genRootSchema(r: Random): ObjectNode = {
    val hasDefs = r.nextInt(5) < 2
    val root = genSchema(r, 2, refsOk = hasDefs)
    if (hasDefs) {
      val defs = root.putObject("definitions")
      defs.set[ObjectNode]("d0", genSchema(r, 1, refsOk = false))
      defs.set[ObjectNode]("d1", genSchema(r, 1, refsOk = false))
    }
    root
  }

  // ---- cross-path execution -------------------------------------------------
  private def passVectors(schemaJson: String, docs: Seq[String],
                          opts: CompileOptions): (Seq[Boolean], Seq[Boolean]) = {
    val spec = Graft.parseSchema(schemaJson)
    val df = docs.zipWithIndex.map { case (d, i) => (i, d) }.toDF("i", "doc")
    def run(out: org.apache.spark.sql.DataFrame): Seq[Boolean] =
      out.select(col("i"), col("pass")).collect()
        .sortBy(_.getInt(0)).map(_.getBoolean(1)).toSeq
    (run(Graft.validateJsonColumn(df, "doc", spec, opts)),
     run(Graft.validateJsonColumnCatalyst(df, "doc", spec, opts)))
  }

  /** Typed-path pass for every statically-typeable doc — scalars AND
    * composites, lifted through [[TypedLift.infer]] and batched per inferred
    * Spark type. Top-level JSON null is out of scope (SQL NULL means ABSENT
    * on the typed path, §2.1 mapping); untypeable shapes (heterogeneous
    * arrays, objects with null-valued properties) are skipped like the
    * curated harness. */
  private def typedPasses(schemaJson: String, docs: Seq[(Int, String)],
                          opts: CompileOptions): Seq[(Int, Boolean)] = {
    val spec = Graft.parseSchema(schemaJson)
    val lifted: Seq[(Int, DataType, Any)] = docs.flatMap { case (i, d) =>
      val n = mapper.readTree(d)
      if (n.isNull) None
      // mixed long/double arrays only lift under strict typing: weak-mode
      // string conversion is kind-dependent, so the long→double promotion
      // would change the value the constraints see (found by the r5 sweep)
      else TypedLift.infer(n, promoteMixedNumeric = opts.strictTypes)
        .map { case (dt, v) => (i, dt, v) }
    }
    lifted.groupBy(_._2).toSeq.flatMap { case (dt, rows) =>
      val st = StructType(Seq(StructField("i", IntegerType), StructField("doc", dt)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (i, _, v) => Row(i, v) }), st)
      val c = Compiler.compile(spec, col("doc"), dt, lit(""), opts)
      df.select(col("i"), coalesce(c.pass, lit(true)).as("p")).collect()
        .map(r => (r.getInt(0), r.getBoolean(1))).toSeq
    }
  }

  private def runFuzz(nSchemas: Int, docsPerSchema: Int, seed: Long,
                      opts: CompileOptions, typed: Boolean): (Int, Seq[String]) = {
    val r = new Random(seed)
    var cases = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()
    (0 until nSchemas).foreach { si =>
      val schema = genRootSchema(r).toString
      val docs = (0 until docsPerSchema).map(_ => genValue(r, 3).toString)
      try {
        val (native, variant) = passVectors(schema, docs, opts)
        cases += docs.size
        docs.indices.foreach { i =>
          if (native(i) != variant(i))
            failures += s"schema=$schema doc=${docs(i)}: native=${native(i)} variant=${variant(i)}"
        }
        if (typed) {
          typedPasses(schema, docs.zipWithIndex.map(_.swap), opts).foreach { case (i, tp) =>
            if (tp != native(i))
              failures += s"schema=$schema doc=${docs(i)}: typed=$tp native=${native(i)}"
          }
        }
      } catch {
        case e: Exception =>
          failures += s"schema=$schema: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").take(200)}"
      }
    }
    (cases, failures.toSeq)
  }

  // sweep knobs: CI runs the committed defaults; a larger fresh-seed hunt
  // (the round-3 15k sweep found two real divergences) is one env var away:
  //   SPARK_GRAFT_FUZZ_SCHEMAS=400 SPARK_GRAFT_FUZZ_SEED=12345 sbt "testOnly graft.ConformanceFuzzSpec"
  private val fuzzSchemas = sys.env.get("SPARK_GRAFT_FUZZ_SCHEMAS").map(_.toInt).getOrElse(120)
  private val fuzzSeed = sys.env.get("SPARK_GRAFT_FUZZ_SEED").map(_.toLong)

  test("strict-mode fuzz: native, variant and typed paths agree (seeded)") {
    val (cases, failures) = runFuzz(nSchemas = fuzzSchemas, docsPerSchema = 25,
      seed = fuzzSeed.getOrElse(99990817L), opts = CompileOptions(), typed = true)
    info(s"strict fuzz: $cases cases, ${failures.size} disagreements")
    failures.take(10).foreach(f => info(s"  DISAGREE $f"))
    failures shouldBe empty
    cases should be >= 2000
  }

  test("weak-mode fuzz: native, variant and typed paths agree (seeded)") {
    // budget raised to match the strict pass (round-3's 15k sweep found two
    // real weak-mode bugs; weak typing deserves the same in-suite depth)
    val (cases, failures) = runFuzz(nSchemas = fuzzSchemas, docsPerSchema = 25,
      seed = fuzzSeed.map(_ + 1).getOrElse(88880817L),
      opts = CompileOptions(strictTypes = false), typed = true)
    info(s"weak fuzz: $cases cases, ${failures.size} disagreements")
    failures.take(10).foreach(f => info(s"  DISAGREE $f"))
    failures shouldBe empty
    cases should be >= 2500
  }
}
