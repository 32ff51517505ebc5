package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, TextAnalysis}

/** Curation operators: deterministic stratified sampling, token-budget
  * packing, benchmark decontamination — semantics plus the plan shapes
  * that make them scale. */
class CurationSpec extends SparkTestBase {

  import spark.implicits._

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()

  test("hashSample is deterministic, stratified, and approximately calibrated") {
    val fr = Map("en" -> 0.5, "fr" -> 0.25, "de" -> 0.1)
    val s1 = Curation.hashSample(docs, "doc_id", "lang", fr, defaultFraction = 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val s2 = Curation.hashSample(docs, "doc_id", "lang", fr, defaultFraction = 0.05)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    s2 shouldBe s1 // pure function of the id: rerun selects the SAME rows
    // per-stratum rates land near their fractions (500 docs: generous bands)
    val byLang = Curation.hashSample(docs, "doc_id", "lang", fr, defaultFraction = 0.05)
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    enRate should be (0.5 +- 0.15)
    byLang.getOrElse("de", 0L).toDouble / totals("de") should be < 0.35
    // both u01 forms are valid probabilities
    val u = docs.select(Curation.uniform01Md5(col("doc_id")).as("m"),
      Curation.uniform01Xx(col("doc_id")).as("x")).collect()
    all(u.map(_.getDouble(0))) should (be >= 0.0 and be < 1.0)
    all(u.map(_.getDouble(1))) should (be >= 0.0 and be < 1.0)
  }

  test("hashSample plan is a shuffle-free codegen'd filter over the scan") {
    val p = Curation.hashSample(docs, "doc_id", "lang", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
  }

  test("budgetPack keeps exactly the maximal in-budget prefix per stratum") {
    val toks = TextAnalysis.tokenCountWs(col("text")).cast("long")
    val out = Curation.budgetPack(docs, "lang", toks,
      Seq(col("n_chars").desc, col("doc_id").asc),
      Map("en" -> 5000L, "fr" -> 2000L), defaultBudget = 1000L)
      .select(col("lang"), col("doc_id"), col("cum_tokens").cast("long")).collect()
    val byLang = out.groupBy(_.getString(0))
    // every stratum is truncated (budgets chosen below the stratum totals)
    val langTotals = docs.select(col("lang"), toks.as("n")).groupBy("lang")
      .agg(sum("n")).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    langTotals.foreach { case (l, total) =>
      val budget = Map("en" -> 5000L, "fr" -> 2000L).getOrElse(l, 1000L)
      total should be > budget // sanity: the budget bites at this SF
      val kept = byLang(l)
      kept.map(_.getLong(2)).max should be <= budget
      // maximality: the independently-computed prefix has the same size
      val ordered = docs.where(col("lang") === l)
        .select(col("doc_id"), toks.as("n"), col("n_chars"))
        .collect().sortBy(r => (-r.getLong(2), r.getLong(0)))
      var cum = 0L; var n = 0
      ordered.foreach { r => cum += r.getLong(1); if (cum <= budget) n += 1 }
      kept.length shouldBe n
    }
  }

  test("packChunks: closed-form straddling chunks, zero-token drop, one exchange") {
    val df = Seq(
      (1L, "a", 3L), (2L, "a", 4L), (3L, "a", 2L), // layout a: [0,3)[3,7)[7,9)
      (4L, "a", 0L),                               // zero tokens: dropped
      (5L, "b", 9L)                                // layout b: [0,9) spans 3 seqs
    ).toDF("id", "st", "ntok")
    val r = Curation.packChunks(df, "st", col("ntok"), Seq(col("id").asc), seqLen = 4L)
      .select("id", "st", "seq_id", "seq_off", "n_tok_in_seq")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3), x.getLong(4)))
      .toSet
    r shouldBe Set(
      (1L, "a", 0L, 0L, 3L),            // doc1 fills [0,3) of seq 0
      (2L, "a", 0L, 3L, 1L),            // doc2 straddles: 1 token in seq 0...
      (2L, "a", 1L, 0L, 3L),            // ...3 tokens in seq 1
      (3L, "a", 1L, 3L, 1L),            // doc3 straddles the same way
      (3L, "a", 2L, 0L, 1L),
      (5L, "b", 0L, 0L, 4L), (5L, "b", 1L, 0L, 4L), (5L, "b", 2L, 0L, 1L))
    // token conservation: per stratum, contributed tokens == total tokens
    val sums = Curation.packChunks(df, "st", col("ntok"), Seq(col("id").asc), 4L)
      .groupBy("st").agg(sum("n_tok_in_seq").as("s")).collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    sums shouldBe Map("a" -> 9L, "b" -> 9L)
    // one window shuffle, nothing else
    val plan = Curation.packChunks(df, "st", col("ntok"), Seq(col("id").asc), 4L)
      .queryExecution.executedPlan.toString
    plan.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
  }

  test("urlFeatures: counts, lowercased sorted domains, blocklist, null text") {
    val df = Seq(
      (1L, "go to https://WWW.Example.COM/Path and https://www.example.com:8080/x plus http://other.org"),
      (2L, "bare text, no urls; ftp://not.matched.org either"),
      (3L, "dup https://a.b.c/1 https://a.b.c/2 and https://Spam.BAD.example/z"),
      (4L, null.asInstanceOf[String])).toDF("id", "txt")
    val r = TextAnalysis.urlFeatures(df, "txt", blocklist = Seq("spam.bad.example"))
      .orderBy("id")
      .select(col("id"), col("n_urls"), concat_ws(",", col("url_domains")).as("d"),
        col("n_unique_domains"), col("url_blocked"))
      .collect().map(x => (x.getLong(0), x.getInt(1), x.getString(2), x.getInt(3), x.getBoolean(4)))
    r(0) shouldBe ((1L, 3, "other.org,www.example.com", 2, false))
    r(1) shouldBe ((2L, 0, "", 0, false))
    r(2) shouldBe ((3L, 3, "a.b.c,spam.bad.example", 2, true))
    r(3) shouldBe ((4L, 0, "", 0, false))
    // empty blocklist: url_blocked is constant false, still present
    TextAnalysis.urlFeatures(df, "txt").select("url_blocked")
      .collect().map(_.getBoolean(0)).toSet shouldBe Set(false)
    // one projection, no shuffle
    TextAnalysis.urlFeatures(df, "txt", Seq("x.y"))
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("redactPii redacts in order, counts what each pattern saw, and stays shuffle-free") {
    val df = Seq(
      (1L, "mail bob.smith@corp.example.com or 555-123-4567 from 10.0.0.1 done"),
      (2L, "no pii here"),
      (3L, "two mails a@b.co c%d@e-f.org and ip 192.168.254.3"),
      (4L, null.asInstanceOf[String])).toDF("id", "txt")
    val r = Curation.redactPii(df, "txt").orderBy("id")
      .select("id", "text_redacted", "n_email", "n_phone", "n_ipv4")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getInt(2), x.getInt(3), x.getInt(4)))
    r(0) shouldBe ((1L, "mail <EMAIL> or <PHONE> from <IP> done", 1, 1, 1))
    r(1) shouldBe ((2L, "no pii here", 0, 0, 0))
    r(2) shouldBe ((3L, "two mails <EMAIL> <EMAIL> and ip <IP>", 2, 0, 1))
    r(3) shouldBe ((4L, "", 0, 0, 0)) // NULL text: empty redaction, zero counts
    // ordering contract: a span consumed by an earlier category is not
    // double-counted — the phone-looking digits INSIDE an email are gone
    // before the phone pattern runs
    val tricky = Seq((1L, "x 555-123-4567@mail.example.com y")).toDF("id", "txt")
    val t = Curation.redactPii(tricky, "txt").select("text_redacted", "n_email", "n_phone")
      .collect().head
    t.getString(0) shouldBe "x <EMAIL> y"
    t.getInt(1) shouldBe 1
    t.getInt(2) shouldBe 0
    // one projection, no shuffle
    Curation.redactPii(df, "txt").queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("repetitionFeatures: closed-form signals, empty/null guards, no shuffle") {
    val df = Seq(
      (1L, "a b a b a"),         // words=5 distinct=2; bigrams: ab,ba,ab,ba → top 2/4; adj 0
      (2L, "go go go stop"),     // words=4 distinct=2; bigrams: "go go"x2,"go stop" → 2/3; adj 2/3
      (3L, "all distinct words here"), // no repetition
      (4L, "solo"),              // 1 word: no bigrams
      (5L, ""), (6L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionFeatures(df, "text").orderBy("doc_id")
      .select("r_n_words", "r_dup_word_frac", "r_top_bigram_frac", "r_adj_dup_frac")
      .collect().map(x => (x.getInt(0), x.getDouble(1), x.getDouble(2), x.getDouble(3)))
    r(0) shouldBe ((5, 1.0 - 2.0 / 5, 2.0 / 4, 0.0))
    r(1) shouldBe ((4, 0.5, 2.0 / 3, 2.0 / 3))
    r(2) shouldBe ((4, 0.0, 1.0 / 3, 0.0)) // every bigram unique: top frac = 1/n
    r(3) shouldBe ((1, 0.0, 0.0, 0.0))
    r(4) shouldBe ((0, 0.0, 0.0, 0.0))
    r(5) shouldBe ((0, 0.0, 0.0, 0.0))
    TextAnalysis.repetitionFeatures(df, "text")
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("removeBoilerplateLines: cross-doc lines go, order survives, no doc is lost") {
    val df = Seq(
      (1L, "COOKIE NOTICE\nunique alpha\n   \nfooter v1"),
      (2L, "COOKIE NOTICE\nunique beta\nfooter v1"),
      (3L, "  COOKIE NOTICE \nunique gamma\nfooter v2"), // trimmed form matches
      (4L, "COOKIE NOTICE"),                             // all lines boilerplate
      (5L, null.asInstanceOf[String])                    // NULL text: kept, empty
    ).toDF("id", "txt")
    val r = Curation.removeBoilerplateLines(df, "id", "txt", minDocs = 2L)
      .orderBy("id").select("id", "text_clean", "n_lines_removed")
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    // COOKIE NOTICE in 3 docs and "footer v1" in 2 docs are boilerplate;
    // "footer v2" (1 doc), the unique lines, and the whitespace-only line stay
    r(0) shouldBe ((1L, "unique alpha\n   ", 2L))
    r(1) shouldBe ((2L, "unique beta", 2L))
    r(2) shouldBe ((3L, "unique gamma\nfooter v2", 1L))
    r(3) shouldBe ((4L, "", 1L))
    r(4) shouldBe ((5L, "", 0L))
    // whitespace-only lines are never counted as boilerplate even though
    // they appear in "many" docs
    val ws = Seq((1L, "a\n \nb"), (2L, "c\n \nd"), (3L, "e\n \nf")).toDF("id", "txt")
    Curation.removeBoilerplateLines(ws, "id", "txt", 2L)
      .agg(sum("n_lines_removed")).collect().head.getLong(0) shouldBe 0L
    // plan: the boilerplate side joins broadcast, never sort-merge
    val p = Curation.removeBoilerplateLines(df, "id", "txt", 2L)
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("decontaminate flags exactly the docs sharing a k-shingle with the eval set") {
    // tiny closed-form corpus: doc 1 copies eval text, doc 2 is disjoint
    val eva = Seq((100L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "see: the quick brown fox jumps again"), // shares 13-shingles
      (2L, "zzz completely different content zzz")).toDF("doc_id", "text")
    val out = Curation.decontaminate(corpus, eva, "doc_id", "text", k = 13)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.keySet shouldBe Set(1L)
    out(1L) should be >= 1L
    // plan shape: the eval side broadcasts; no corpus-wide sort/range shuffle
    val p = Curation.decontaminate(docs.where(pmod(col("doc_id"), lit(97)) =!= 0),
      docs.where(pmod(col("doc_id"), lit(97)) === 0), "doc_id", "text", 13)
      .queryExecution.executedPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("decontaminateBloom matches the exact path bit-for-bit, even undersized") {
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val corpus = docs.where(pmod(col("doc_id"), lit(89)) =!= 0)
    val eva = docs.where(pmod(col("doc_id"), lit(89)) === 0)
    val exact = asMap(Curation.decontaminate(corpus, eva, "doc_id", "text", 13))
    exact should not be empty // the fixture must actually exercise overlap
    // well-sized sketch
    asMap(Curation.decontaminateBloom(corpus, eva, "doc_id", "text", 13)) shouldBe exact
    // deliberately UNDERSIZED sketch (fpp 0.9 → 64-bit floor → false
    // positives all over): phase 3 must still strip every one of them
    asMap(Curation.decontaminateBloom(corpus, eva, "doc_id", "text", 13,
      fpp = 0.9)) shouldBe exact
    // empty eval set → null sketch → correctly empty output
    Curation.decontaminateBloom(corpus, eva.where(lit(false)),
      "doc_id", "text", 13).count() shouldBe 0L
    // plan shape: the sketch probe is IN the corpus scan stage, before any
    // join — the codegen'd might_contain predicate is the point of the op
    val p = Curation.decontaminateBloom(corpus, eva, "doc_id", "text", 13)
      .queryExecution.executedPlan.toString
    p should include("might_contain")
  }

  test("shuffleShards: deterministic balanced permutation with dense in-shard positions") {
    val a = Curation.shuffleShards(docs, "doc_id", numShards = 8, seed = "s1")
      .select("doc_id", "shard", "shard_pos")
    val b = Curation.shuffleShards(docs.repartition(7), "doc_id", numShards = 8, seed = "s1")
      .select("doc_id", "shard", "shard_pos")
    // pure function of the id: identical layout under any input partitioning
    a.exceptAll(b).count() shouldBe 0L
    b.exceptAll(a).count() shouldBe 0L
    val rows = a.collect()
    // a permutation: every doc exactly once
    rows.map(_.getLong(0)).toSet.size shouldBe docs.count()
    // dense 1..n positions within each shard
    rows.groupBy(_.getInt(1)).foreach { case (_, rs) =>
      rs.map(_.getLong(2)).sorted.toSeq shouldBe (1L to rs.length.toLong)
    }
    // balanced within sampling noise (500 docs / 8 shards ≈ 62 ± band)
    val sizes = rows.groupBy(_.getInt(1)).view.mapValues(_.length)
    sizes.keys.toSet shouldBe (0 until 8).toSet
    all(sizes.values.toSeq) should (be >= 30 and be <= 100)
    // a different seed produces a different permutation
    val c = Curation.shuffleShards(docs, "doc_id", numShards = 8, seed = "s2")
      .select("doc_id", "shard", "shard_pos")
    c.exceptAll(a).count() should be > 0L
    // plan shape: one hash exchange on shard, never a single-partition window
    val plan = a.queryExecution.executedPlan.toString
    plan should include("hashpartitioning(shard")
    plan should not include "SinglePartition"
  }

  test("filterCascade: first-fail attribution, fail-closed NULLs, keep iff all pass") {
    import spark.implicits._
    val df = Seq(
      (1L, Some(10), Some(true)),   // passes both
      (2L, Some(-1), Some(true)),   // fails rule1 (and would fail rule2)
      (3L, Some(10), Some(false)),  // fails rule2 only
      (4L, None: Option[Int], Some(true)) // NULL predicate → fails rule1
    ).toDF("id", "x", "ok")
    val out = Curation.filterCascade(df, Seq(
      "nonneg" -> (col("x") >= 0),
      "flag" -> col("ok"))).select("id", "keep", "drop_reason").collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), Option(r.getString(2)))).toMap
    out(1L) shouldBe (true, None)
    out(2L) shouldBe (false, Some("nonneg")) // FIRST failing rule, not "flag"
    out(3L) shouldBe (false, Some("flag"))
    out(4L) shouldBe (false, Some("nonneg")) // NULL fails closed
    // rule order changes attribution, not the kept set
    val flipped = Curation.filterCascade(df, Seq(
      "flag" -> col("ok"), "nonneg" -> (col("x") >= 0)))
    flipped.where(col("keep")).select("id").collect().map(_.getLong(0)).toSet shouldBe Set(1L)
  }
}
