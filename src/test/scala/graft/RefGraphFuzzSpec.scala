package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.spec.SpecParser

/** Seeded fuzzer for the `$ref` RESOLUTION layer — the part the keyword
  * fuzzer (ConformanceFuzzSpec) deliberately keeps simple. Each case is a
  * small multi-document universe: a root schema plus two external documents
  * under distinct `$id` folders, with definitions reachable through every
  * resolution shape the reference supports (schema_parser.hpp
  * resolveThenPopulateSchema + internal/uri.hpp + internal/json_pointer.hpp):
  *
  *   - same-document pointers, including `~0`/`~1` escapes, %-encoded
  *     member names, and array-element indices;
  *   - absolute cross-document refs, and RELATIVE cross-document refs that
  *     must merge against the root's `$id` folder (same folder and `../`
  *     sibling folder);
  *   - plain-name anchors (`$id: "#name"`) referenced cross-document;
  *   - `$ref`-to-`$ref` chains and ref-shaped definitions.
  *
  * Invariants, per universe:
  *   1. `SpecParser.parse` either succeeds or throws
  *      `IllegalArgumentException` — never StackOverflow/NPE (generated
  *      chains can be cyclic; the parser must degrade to its guarded error).
  *   2. When it parses, the native single-pass walker and the Catalyst
  *      variant compiler agree on the pass verdict for a batch of random
  *      documents (the variant path may skip with its documented
  *      cyclic-$ref error).
  *   3. Parsing is deterministic: a second parse yields identical verdicts.
  *
  * In-suite default is 150 universes x 6 docs; set SPARK_GRAFT_REFFUZZ_N
  * for larger sweeps (each universe costs two local Spark jobs). */
class RefGraphFuzzSpec extends SparkTestBase {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private val UriA = "http://fz/a/one.json"
  private val UriB = "http://fz/b/two.json"
  private val RootId = "http://fz/a/root.json"

  // ---- generators -----------------------------------------------------------

  /** Leaf constraint objects (JSON text). Kept draft-7-simple: the keyword
    * fuzzer owns keyword-semantics breadth; this suite owns resolution. */
  private def genLeaf(r: Random): String = r.nextInt(8) match {
    case 0 => """{"type": "integer"}"""
    case 1 => """{"type": "string"}"""
    case 2 => s"""{"minimum": ${r.nextInt(10)}}"""
    case 3 => s"""{"maximum": ${r.nextInt(10)}}"""
    case 4 => s"""{"minLength": ${r.nextInt(4)}}"""
    case 5 => """{"required": ["a"]}"""
    case 6 => s"""{"enum": [${r.nextInt(5)}, "x"]}"""
    case 7 => """{"pattern": "^a"}"""
  }

  /** One external document under `uri`, with a definitions inventory whose
    * member names force every token-decoding path. */
  private def genExternalDoc(r: Random, uri: String): String = {
    s"""{
      "$$id": "$uri",
      "definitions": {
        "plain": ${genLeaf(r)},
        "esc~key": ${genLeaf(r)},
        "esc/key": ${genLeaf(r)},
        "pct key": ${genLeaf(r)},
        "arr": [${genLeaf(r)}, ${genLeaf(r)}],
        "anch": {"$$id": "#anch${uri.hashCode.abs % 100}", "allOf": [${genLeaf(r)}]},
        "chain": {"$$ref": "#/definitions/plain"}
      }
    }"""
  }

  /** A `$ref` STRING reaching some definition, from the root document's
    * point of view (root `$id` is `http://fz/a/root.json`). */
  private def genRefString(r: Random): String = r.nextInt(12) match {
    case 0 => "#/definitions/plain" // same-doc
    case 1 => "#/definitions/esc~0key" // ~0 escape
    case 2 => "#/definitions/esc~1key" // ~1 escape
    case 3 => "#/definitions/pct%20key" // %-decoding
    case 4 => s"#/definitions/arr/${r.nextInt(2)}" // array index
    case 5 => s"$UriA#/definitions/plain" // absolute cross-doc
    case 6 => s"$UriB#/definitions/chain" // absolute cross-doc, ref chain
    case 7 => "one.json#/definitions/plain" // relative, same $id folder
    case 8 => "../b/two.json#/definitions/pct%20key" // relative, ../ merge
    case 9 => s"one.json#anch${UriA.hashCode.abs % 100}" // plain-name anchor
    case 10 => "#/definitions/chain" // same-doc chain
    case 11 => "#/definitions/maybecycle" // 50/50 guarded or unguarded cycle
  }

  private def genRefNode(r: Random): String = s"""{"$$ref": "${genRefString(r)}"}"""

  /** Root schema document: local definitions (incl. chain + a sometimes-
    * cyclic member) and 1-2 structural applications of ref nodes. */
  private def genRoot(r: Random): String = {
    val cyc =
      if (r.nextBoolean()) s"""{"properties": {"c": {"$$ref": "#/definitions/maybecycle"}}}"""
      else s"""{"allOf": [{"$$ref": "#/definitions/maybecycle"}]}""" // unguarded -> parse error
    val body = r.nextInt(4) match {
      case 0 => s""""properties": {"a": ${genRefNode(r)}, "b": ${genLeaf(r)}}"""
      case 1 => s""""items": ${genRefNode(r)}"""
      case 2 => s""""allOf": [${genRefNode(r)}, ${genLeaf(r)}]"""
      case 3 => s""""anyOf": [${genRefNode(r)}, {"not": ${genRefNode(r)}}]"""
    }
    s"""{
      "$$id": "$RootId",
      "definitions": {
        "plain": ${genLeaf(r)},
        "esc~key": ${genLeaf(r)},
        "esc/key": ${genLeaf(r)},
        "pct key": ${genLeaf(r)},
        "arr": [${genLeaf(r)}, ${genLeaf(r)}],
        "chain": {"$$ref": "$UriA#/definitions/chain"},
        "maybecycle": $cyc
      },
      $body
    }"""
  }

  private def genDoc(r: Random): String = r.nextInt(8) match {
    case 0 => r.nextInt(12).toString
    case 1 => s""""${"a" * r.nextInt(4)}""""
    case 2 => s"""{"a": ${r.nextInt(12)}}"""
    case 3 => s"""{"a": "ab", "b": ${r.nextInt(5)}}"""
    case 4 => s"""[${r.nextInt(5)}, "a"]"""
    case 5 => "true"
    case 6 => s"""{"c": ${r.nextInt(5)}}"""
    case 7 => s"""{"a": {"a": 1}}"""
  }

  // ---- harness ---------------------------------------------------------------

  private def passVector(run: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
                         docs: Seq[String]): Seq[Boolean] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(docs.zipWithIndex.map { case (d, i) => Row(i, d) }),
      StructType(Seq(StructField("i", org.apache.spark.sql.types.IntegerType),
        StructField("j", StringType))))
    run(df).select("i", "pass").collect().sortBy(_.getInt(0)).map(_.getBoolean(1)).toSeq
  }

  test("ref-graph fuzz: parse never crashes; native and variant paths agree") {
    val n = sys.env.get("SPARK_GRAFT_REFFUZZ_N").map(_.toInt).getOrElse(150)
    val baseSeed = sys.env.get("SPARK_GRAFT_REFFUZZ_SEED").map(_.toLong).getOrElse(20260819L)
    var parsed = 0; var parseErrors = 0; var variantCyclicSkips = 0; var compared = 0
    val failures = scala.collection.mutable.ArrayBuffer[String]()

    (0 until n).foreach { i =>
      val r = new Random(baseSeed + i)
      val ext = Map(UriA -> genExternalDoc(r, UriA), UriB -> genExternalDoc(r, UriB))
      val root = genRoot(r)
      val docs = Seq.fill(6)(genDoc(r))
      val specTry =
        try Right(SpecParser.parse(root, ext))
        catch {
          case _: IllegalArgumentException => Left(()) // invariant 1: guarded error only
          case e: Throwable => failures += s"case $i: parse crashed with ${e.getClass}"; Left(())
        }
      specTry.foreach { spec =>
        parsed += 1
        val native = passVector(df => Graft.validateJsonColumn(df, "j", spec), docs)
        // invariant 3: determinism across a re-parse
        val native2 = passVector(
          df => Graft.validateJsonColumn(df, "j", SpecParser.parse(root, ext)), docs)
        if (native != native2) failures += s"case $i: re-parse verdicts differ"
        try {
          val variant = passVector(df => Graft.validateJsonColumnCatalyst(df, "j", spec), docs)
          compared += 1
          if (native != variant)
            failures += s"case $i: native=$native variant=$variant root=$root docs=$docs"
        } catch {
          case e: IllegalArgumentException if e.getMessage.contains("cyclic $ref") =>
            variantCyclicSkips += 1
        }
      }
      if (specTry.isLeft) parseErrors += 1
    }

    info(s"ref-graph fuzz: $n universes, $parsed parsed, $parseErrors guarded parse errors, " +
      s"$compared native/variant comparisons, $variantCyclicSkips variant cyclic skips, " +
      s"${failures.size} failures")
    failures.foreach(f => info(s"  FAIL $f"))
    failures shouldBe empty
    // generator health: both outcomes must actually occur
    parsed should be >= n / 3
    parseErrors should be >= 1
    compared should be >= parsed / 2
  }
}
