package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.checks.{JsonSuggest, Suggest}

/** Seeded round-trip fuzzer for the suggestion profilers: whatever messy
  * corpus comes out of the generator, the suggested schema must validate
  * its own source with ZERO violations on every parseable document — the
  * profiler's one hard contract (every emitted rule is an observed
  * invariant). Knobs: SPARK_GRAFT_SUGGESTFUZZ_N / _SEED. */
class SuggestFuzzSpec extends SparkTestBase {

  import spark.implicits._

  private val nCorpora = sys.env.get("SPARK_GRAFT_SUGGESTFUZZ_N").map(_.toInt).getOrElse(30)
  private val seed = sys.env.get("SPARK_GRAFT_SUGGESTFUZZ_SEED").map(_.toLong).getOrElse(20260870L)

  private val keyPool = Vector("a", "b2", "c_c", "with space", "q\"uote",
    "it's", "esc~/seg", "d")
  // includes format-shaped values so the format-detection rule fuzzes too
  // (an all-date column must suggest format=date and still round-trip)
  private val strPool = Vector("x", "yy", "zzz", "a\"b", "c\\d", "ünïcødé", "",
    "2024-01-05", "2023-12-31", "10.0.0.1", "12:30:00", "23:59:60",
    "2024-01-05T10:00:00Z")

  /** One random JSON value; nested objects/arrays only at depth 0. */
  private def randValue(r: Random, depth: Int): String = {
    val roll = r.nextInt(if (depth == 0) 8 else 6)
    roll match {
      case 0 => r.nextInt(2000).toString
      case 1 => (r.nextInt(1000) / 8.0).toString
      case 2 => "\"" + strPool(r.nextInt(strPool.size)).flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString } + "\""
      case 3 => if (r.nextBoolean()) "true" else "false"
      case 4 => "null"
      case 5 => r.nextInt(2000).toString
      case 6 => "[" + Seq.fill(r.nextInt(4))(r.nextInt(100)).mkString(",") + "]"
      case 7 => "{" + keyPool.take(2 + r.nextInt(3)).map(k =>
        "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\": " +
          randValue(r, 1)).mkString(",") + "}"
    }
  }

  private def randDoc(r: Random): String = {
    if (r.nextInt(20) == 0) return "not json at all" // parse-violation row
    val ks = r.shuffle(keyPool).take(1 + r.nextInt(keyPool.size))
    "{" + ks.map(k =>
      "\"" + k.replace("\\", "\\\\").replace("\"", "\\\"") + "\": " +
        randValue(r, 0)).mkString(",") + "}"
  }

  test(s"json round-trip fuzz: $nCorpora random corpora, suggested schema clean on source") {
    val r = new Random(seed)
    var checked = 0
    (1 to nCorpora).foreach { i =>
      val docs = Seq.fill(8 + r.nextInt(25))(randDoc(r))
      val df = docs.toDF("doc")
      val spec = JsonSuggest.suggestSchema(df, "doc",
        // vary eligibility knobs so the enum path fuzzes too
        Suggest.Options(enumMaxDistinct = 2 + r.nextInt(8),
          enumMaxFraction = 0.25 + r.nextDouble() * 0.75))
      val out = Graft.validateJsonColumn(df, "doc", spec)
      // every PARSEABLE doc must pass; unparseable rows fail with exactly
      // the parse violation (never a suggested-constraint violation)
      val bad = out.where(!col("pass"))
        .select(col("doc"), col("violations").getItem(0).getField("kind").as("kind"))
        .collect()
      val nonParse = bad.filterNot(_.getAs[String]("kind") == "parse")
      assert(nonParse.isEmpty,
        s"corpus $i (seed $seed): suggested schema flagged its own source: " +
          nonParse.take(3).mkString("; ") + s"\ndocs=${docs.mkString("\n")}")
      checked += docs.count(d => d != "not json at all")
    }
    info(s"suggest-fuzz: $nCorpora corpora, $checked parseable docs, 0 self-violations")
  }

  test("scalar round-trip fuzz: typed columns with nulls and unicode") {
    val r = new Random(seed + 1)
    (1 to 10).foreach { _ =>
      val rows = Seq.fill(10 + r.nextInt(20))((
        r.nextLong() % 1000,
        if (r.nextInt(5) == 0) None else Some(strPool(r.nextInt(strPool.size))),
        if (r.nextInt(4) == 0) None else Some(r.nextInt(100) / 4.0)))
      val df = rows.toDF("id", "s", "d")
      val spec = Suggest.suggestSchema(df, Seq("id", "s", "d"),
        Suggest.Options(enumMaxDistinct = 2 + r.nextInt(6),
          enumMaxFraction = 0.25 + r.nextDouble() * 0.75))
      Graft.validate(df, spec, Seq("id")).flagged
        .where(!col("pass")).count() shouldBe 0L
    }
  }
}
