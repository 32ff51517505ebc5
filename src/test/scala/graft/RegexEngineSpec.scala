package graft

import org.apache.spark.sql.functions._

import graft.compile.CompileOptions
import graft.functions.{JavaRegexEngine, ThompsonRegexEngine}

/** Pluggable regex engines (validator.hpp:100-116 analog): the JDK default
  * and the linear-time Thompson NFA. */
class RegexEngineSpec extends SparkTestBase {
  import spark.implicits._

  private val patterns = Seq(
    "^c[0-9]{10}$", "^tool_[0-9]{2}$", "Brand#1[0-9]", "abc", "a.c",
    "^(foo|bar)+$", "x*y+z?", "[^aeiou]{3}", "\\d+\\.\\d+", "\\w+@\\w+",
    "^\\s*$", "(?:ab){2,4}c", "colou?r", "^[A-Z][a-z]*( [A-Z][a-z]*)*$",
    "t[ae]st", "\\$\\{[a-z_]+\\}", "a{3}", "a{2,}b",
    // JDK \d \w \s are ASCII-only by default (no UNICODE_CHARACTER_CLASS);
    // non-ASCII digits/letters/spaces must behave identically on both engines
    "^\\d+$", "^\\w+$", "\\s", "\\D", "\\W+", "^\\S+$",
    // JDK-valid class edge forms: ']' first in a class; range-like '-' after
    // an escape class parses as a literal '-'
    "[]]", "[^]]", "[\\d-x]",
    // non-BMP: the JDK engine treats a surrogate pair as ONE atom (quantifier
    // binds the code point, '.' consumes the pair, class ranges span astral
    // endpoints) — the Thompson engine must agree code-point-for-code-point
    "^🐲*$", "🐲+", "^.$", "^[🐉-🐲]$", "^[^🐲]$", "^🐲{2}$", "a.c")

  private val inputs = Seq(
    "c0000000042", "c00000000", "tool_07", "tool_7", "Brand#13", "Brand#23",
    "xabcx", "abc", "aXc", "a\nc", "foobarfoo", "foobar", "xxyyz", "y",
    "bcd", "aei", "3.14", "12.", "user@host", "@host", "", "   ", " x ",
    "ababc", "ababababc", "abc2", "color", "colour", "colr",
    "Hello World", "Hello world", "test", "tast", "tist", "${var_name}",
    "aaa", "aa", "aaab", "ab", "AAAB",
    // non-ASCII probes: Arabic-Indic digits, NBSP, accented letters, CJK,
    // fullwidth digit, plus class-edge probes ']' and '-'
    "٠١٢", "x\u00a0y", "äöü", "日本語1",
    "１２", "a\u2003b", "]", "-", "2-x", "]]",
    // astral probes: dragons/relatives in and out of the class range, mixed
    // BMP/astral adjacency, and a lone (unpaired) high surrogate
    "🐲", "🐲🐲", "🐲🐲🐲",
    "🐉", "🐊", "🦄", "🐲🐉",
    "a🐲c", "x🐲y", "\uD83D")

  test("Thompson NFA agrees with the JDK engine across the battery") {
    for (p <- patterns; s <- inputs) {
      val j = JavaRegexEngine.search(p, s)
      val t = ThompsonRegexEngine.search(p, s)
      withClue(s"pattern=$p input='$s': java=$j thompson=$t") { t shouldBe j }
    }
  }

  test("Thompson NFA is immune to catastrophic backtracking") {
    // (a+)+$ against 'aaaa…!' is the classic exponential-backtracking case:
    // the JDK engine needs ~2^n steps; the NFA is linear.
    val evil = "(a+)+$"
    val input = "a" * 60 + "!"
    val t0 = System.nanoTime()
    ThompsonRegexEngine.search(evil, input) shouldBe false
    val ms = (System.nanoTime() - t0) / 1e6
    withClue(f"took $ms%.1f ms") { ms should be < 2000.0 }
    // and it still matches when it should
    ThompsonRegexEngine.search(evil, "baaa") shouldBe true
  }

  test("unsupported constructs fail at compile, not silently") {
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("(a)\\1", "aa") // backreference
    }
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a(?=b)", "ab") // lookahead
    }
    // possessive quantifiers change match EXISTENCE vs the JDK engine:
    // java "a*+a" never matches "aaa"; they must fail, not silently stack
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a*+a", "aaa")
    }
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a**", "aaa") // JDK-invalid stacking
    }
    // reluctant quantifiers are a no-op for existence-of-match search
    ThompsonRegexEngine.search("a+?b", "aab") shouldBe true
    ThompsonRegexEngine.search("a{2,3}?x", "aax") shouldBe true
    // '{' with no preceding atom: the JDK throws "Illegal repetition" for
    // a{b} and a bare '{'; the Thompson engine must fail loudly, not treat
    // it as a literal (which would silently diverge)
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a|{b}", "ax")
    }
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("{2}", "x{2}")
    }
    // '?' stacked on a quantifier: the reluctant marker is legal (a??),
    // a THIRD '?' or '?' after a reluctant '*'/'{}' is JDK-invalid
    // ("Dangling meta character") and used to compile silently here
    ThompsonRegexEngine.search("a??", "b") shouldBe true // optional a, reluctant
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a???", "a")
    }
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a*??", "a")
    }
    // more than two repetition fields: JDK throws, silently reading
    // {2,3,4} as {2,3} would reinterpret the pattern
    intercept[java.util.regex.PatternSyntaxException] {
      ThompsonRegexEngine.search("a{2,3,4}", "aaa")
    }
  }

  test("invalid patterns fail at PLAN time on the driver (eager compile)") {
    import org.apache.spark.sql.types.StringType
    val opts = CompileOptions(regexEngine = ThompsonRegexEngine)
    // the compile call itself must throw — before any action runs on executors
    intercept[java.util.regex.PatternSyntaxException] {
      graft.compile.Compiler.compile(
        graft.spec.SpecParser.parse("""{"pattern":"(a)\\1"}"""),
        col("tool"), StringType, lit(""), opts)
    }
    intercept[java.util.regex.PatternSyntaxException] {
      graft.compile.Compiler.compile(
        graft.spec.SpecParser.parse("""{"pattern":"[unclosed"}"""),
        col("tool"), StringType, lit("")) // default JDK engine path (rlike)
    }
  }

  test("pattern constraints evaluate through the configured engine on all paths") {
    val opts = CompileOptions(regexEngine = ThompsonRegexEngine)
    // typed path
    val df = Seq("tool_07", "tool_7", "xtool_12x").toDF("tool")
    val c = graft.compile.Compiler.compile(
      graft.spec.SpecParser.parse("""{"pattern":"^tool_[0-9]{2}$"}"""),
      col("tool"), org.apache.spark.sql.types.StringType, lit(""), opts)
    df.select(coalesce(c.pass, lit(true))).collect().map(_.getBoolean(0)).toSeq shouldBe
      Seq(true, false, false)
    // native dynamic path
    Graft.validateJsonColumn(Seq("\"tool_07\"", "\"tool_7\"").toDF("doc"), "doc",
        Graft.parseSchema("""{"pattern":"^tool_[0-9]{2}$"}"""), opts)
      .select("pass").collect().map(_.getBoolean(0)).toSeq shouldBe Seq(true, false)
    // full row validation agrees with the default engine on the transcript spec
    val turns = graft.data.TranscriptGen.turns(spark, 200, parts = 2, numParts = 4)
    val spec = Graft.parseSchema(graft.data.TranscriptGen.transcriptSchemaJson)
    val a = Graft.validate(turns, spec, Seq("conv_id", "turn_idx")).violations.count()
    val b = Graft.validate(turns, spec, Seq("conv_id", "turn_idx"), opts).violations.count()
    a shouldBe b
  }
}
