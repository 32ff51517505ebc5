package graft

import org.apache.spark.sql.functions
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Pipeline ops over the driver-provided documents/embeddings tables. */
class OpsSpec extends SparkTestBase {

  lazy val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").cache()
  lazy val embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()

  test("token counts: ws and bpe-ish are positive and ordered sanely") {
    val t = docs.select(
      TextAnalysis.tokenCountWs(col("text")).as("ws"),
      TextAnalysis.tokenCountBpeish(col("text")).as("bpe")).collect()
    all(t.map(_.getInt(0))) should be >= 0
    // BPE-ish splits at least as fine as whitespace for non-empty text
    t.count(r => r.getInt(1) >= r.getInt(0)).toDouble / t.length should be > 0.95
  }

  test("langId returns a code for every doc and mostly matches the lang column for English") {
    val scored = docs.select(col("lang"), TextAnalysis.langId(col("text")).as("pred"))
    val total = scored.count()
    scored.where(col("pred").isNull).count() shouldBe 0L
    total should be > 0L
  }

  test("langId accuracy fixture: each supported language identified on representative text") {
    // (the driver corpus's `lang` column is independent of its word-salad
    // text, so accuracy is asserted on real per-language sentences instead)
    import spark.implicits._
    val samples = Seq(
      ("en", "the cat and the dog went to the market for it is warm with sun"),
      ("es", "el perro y los gatos del barrio que están en las calles por la tarde"),
      ("fr", "le chat est dans les rues des voisins et une belle journée dans la ville"),
      ("de", "der hund und die katze das ist von dem haus mit den nachbarn für nicht viel"),
      ("pt", "um dia para a praia com não muito sol e do mar da cidade em que moro"),
      ("und", "zzz qqq xxx lorem"))
    val got = samples.toDF("expected", "text")
      .select(col("expected"), TextAnalysis.langId(col("text")).as("pred"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    got.foreach { case (want, pred) =>
      withClue(s"expected $want got $pred") { pred shouldBe want }
    }
  }

  test("quality score lands in [0,1]") {
    val q = TextAnalysis.qualityScore(docs, "text")
      .agg(min("quality_score"), max("quality_score")).head()
    q.getDouble(0) should be >= 0.0
    q.getDouble(1) should be <= 1.0001
  }

  test("exact dedup: groups found iff duplicate normalized text exists") {
    val nDistinct = docs.select(TextAnalysis.contentFingerprint(col("text"))).distinct().count()
    val survivors = Dedup.exact(docs, "doc_id", "text").count()
    survivors shouldBe nDistinct
  }

  test("exactGroups: audit groups carry every duplicated id, sorted, multiplicity > 1 only") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello  World"), (2L, "hello world"), (3L, "unique one"),
      (4L, " HELLO WORLD "), (5L, "unique two")).toDF("doc_id", "text")
    val g = Dedup.exactGroups(df, "doc_id", "text").collect()
    g.length shouldBe 1
    g.head.getAs[Long]("dup_count") shouldBe 3L
    g.head.getAs[Seq[Long]]("ids") shouldBe Seq(1L, 2L, 4L)
    // consistency with exact(): survivors + (groups' extra members) = rows
    val extras = g.map(r => r.getAs[Long]("dup_count") - 1).sum
    Dedup.exact(df, "doc_id", "text").count() + extras shouldBe df.count()
  }

  test("duplicateSpans: cross-doc passage, within-doc repeat, merge/split boundary") {
    import spark.implicits._
    // 12-word passage shared by docs 1 and 2 (surrounded by unique words);
    // doc 3 repeats its own 10-word run back-to-back; doc 4 is all-unique.
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val run = "one two three four five six seven eight nine ten"
    val df = Seq(
      (1L, s"u1a u1b $passage u1c"),
      (2L, s"u2a $passage u2b u2c u2d"),
      (3L, s"$run $run u3a"),
      (4L, "only unique words appear in this document body here xx yy zz"),
      (5L, null.asInstanceOf[String]),
      (6L, "short doc")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", windowWords = 8, minOcc = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    // doc 1: passage at words [2, 14) → window starts 2..6 (5 windows)
    // doc 2: passage at words [1, 13) → window starts 1..5
    // doc 3: "run run" = the 8-windows at p and p+10 coincide only while
    //        both lie inside a clean copy (p ≤ 2); seam-crossing windows
    //        mix run tail + head and recur nowhere. Dup starts
    //        {0,1,2,10,11,12}; the 2→10 gap is exactly w=8, which MERGES
    //        (only gap > w splits), so one span [0, 20) of 6 windows.
    spans shouldBe Array(
      (1L, 2L, 14L, 5L), (2L, 1L, 13L, 5L), (3L, 0L, 20L, 6L))
  }

  test("removeDuplicateSpans: canonical occurrence survives, the rest is excised") {
    import spark.implicits._
    val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima"
    val df = Seq(
      (1L, s"u1a u1b $passage u1c"),
      (2L, s"u2a $passage u2b u2c u2d"),
      (3L, null.asInstanceOf[String]),
      (4L, "short doc")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", windowWords = 8, minOcc = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    out.keySet shouldBe Set(1L, 2L, 3L, 4L)          // every row passes through
    out(1L) shouldBe ((s"u1a u1b $passage u1c", 0L)) // canonical: doc 1 wins min(id,p)
    out(2L) shouldBe (("u2a u2b u2c u2d", 12L))      // span [1,13) excised
    out(3L) shouldBe (("", 0L))                      // NULL text → empty, nothing removed
    out(4L) shouldBe (("short doc", 0L))             // below window size → untouched
  }

  test("removeDuplicateSpans: within-doc repeat keeps exactly the first copy's span") {
    import spark.implicits._
    val run = "one two three four five six seven eight"
    val df = Seq((7L, s"$run $run tail")).toDF("doc_id", "text")
    val out = Dedup.removeDuplicateSpans(df, "doc_id", "text", windowWords = 8, minOcc = 2)
      .collect()
    out.length shouldBe 1
    // the p=8 window duplicates p=0; canonical is p=0, so words [8,16) go
    out.head.getString(1) shouldBe s"$run tail"
    out.head.getLong(2) shouldBe 8L
  }

  test("duplicateSpans: islands split only when the gap exceeds the window") {
    import spark.implicits._
    // Two duplicated 8-word blocks separated by exactly 8 unique words in
    // doc 20 (gap == w → windows at p=0 and p=16: 16-0 > 8 → SPLIT), and
    // adjacent blocks in doc 30 (p=0 and p=8: 8-0 == w → MERGE).
    val blockA = "a1 a2 a3 a4 a5 a6 a7 a8"
    val blockB = "b1 b2 b3 b4 b5 b6 b7 b8"
    val df = Seq(
      (10L, s"$blockA x $blockB"),            // donor occurrences
      (20L, s"$blockA g1 g2 g3 g4 g5 g6 g7 g8 $blockB"),
      (30L, s"$blockA $blockB")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(df, "doc_id", "text", windowWords = 8, minOcc = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(t => (t._1, t._2))
    spans.filter(_._1 == 20L) shouldBe Array((20L, 0L, 8L), (20L, 16L, 24L))
    spans.filter(_._1 == 30L) shouldBe Array((30L, 0L, 16L))
  }

  test("rolling fingerprint: equals the min of independently-hashed shingles, both hash families") {
    import spark.implicits._
    val df = docs.limit(200)
    val sh = TextAnalysis.withShingles(df, "text", 8, "sh")
    // default (xxhash64) and md5 variants vs explode+min — different plan
    // shape exercising the same semantics
    val viaExpr = sh.select(col("doc_id"),
      TextAnalysis.rollingFingerprintOfShingles(col("sh")).as("fpx"),
      TextAnalysis.rollingFingerprintOfShingles(col("sh"), x => md5(x)).as("fpm"))
    val viaExplode = sh.select(col("doc_id"), explode(col("sh")).as("s"))
      .groupBy("doc_id")
      .agg(min(xxhash64(col("s"))).as("fpx2"), min(md5(col("s"))).as("fpm2"))
    val joined = viaExpr.join(viaExplode, "doc_id")
    joined.where(col("fpx") =!= col("fpx2") || col("fpm") =!= col("fpm2")).count() shouldBe 0L
    joined.count() shouldBe 200L
  }

  test("rolling fingerprint: stable for identical text, monotone under appended content") {
    import spark.implicits._
    val base = "abcdefghij klm nop qrstuvw"
    val df = Seq((1L, base), (2L, base), (3L, base + " appended tail")).toDF("doc_id", "text")
    val fp = TextAnalysis.rollingFingerprint(df, "text").select("doc_id", "fingerprint")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    fp(1L) shouldBe fp(2L)
    // appending only ADDS shingles, so the min can only drop or stay
    fp(3L) should be <= fp(1L)
  }

  test("embeddingChecks: dim, finiteness and norm flags; norm never NaN") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(3f, 4f)),                       // clean: norm exactly 5.0
      (2L, null.asInstanceOf[Seq[Float]]),     // null vector
      (3L, Seq(1f)),                           // wrong dim
      (4L, Seq(Float.NaN, 1f)),                // NaN element
      (5L, Seq(Float.PositiveInfinity, 0f)),   // Inf element
      (6L, Seq(0f, 0f))                        // zero vector: norm floor
    ).toDF("id", "v")
    val out = graft.ops.Similarity.embeddingChecks(df, "id", "v",
        expectedDim = 2, minNorm = 0.1, maxNorm = 100.0)
      .orderBy("id").collect()
    out(0).getDouble(4) shouldBe 5.0
    out(0).getBoolean(7) shouldBe true // pass
    out(1).getBoolean(2) shouldBe true // is_null
    out(1).isNullAt(4) shouldBe true
    out(1).getBoolean(7) shouldBe false
    out(2).getLong(1) shouldBe 1L
    out(2).getBoolean(5) shouldBe false // dim_ok
    out(3).getBoolean(3) shouldBe true // has_nonfinite (NaN)
    out(3).isNullAt(4) shouldBe true   // norm NULL, never NaN
    out(4).getBoolean(3) shouldBe true // has_nonfinite (Inf)
    out(5).getBoolean(6) shouldBe false // norm_ok: zero vector under floor
    out(5).getBoolean(7) shouldBe false
    // shuffle-free single projection
    graft.ops.Similarity.embeddingChecks(df, "id", "v", 2)
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("vocabulary: frequency floor, deterministic top-K tie-break, null/empty text") {
    import spark.implicits._
    val df = Seq(
      (1L, "The quick  fox"), (2L, "the QUICK dog"), (3L, "the b a"),
      (4L, null.asInstanceOf[String]), (5L, "   ")
    ).toDF("doc_id", "text")
    val all = TextAnalysis.vocabulary(df, "text", minCount = 1L, topK = 100)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    // normalized (lowercased, whitespace-collapsed); null/blank contribute 0
    all.toMap shouldBe Map("the" -> 3L, "quick" -> 2L, "fox" -> 1L,
      "dog" -> 1L, "b" -> 1L, "a" -> 1L)
    // top-K with ties broken token-ASC: deterministic kept set AND order
    val top4 = TextAnalysis.vocabulary(df, "text", minCount = 1L, topK = 4)
      .collect().map(_.getString(0)).toSeq
    top4 shouldBe Seq("the", "quick", "a", "b")
    // frequency floor
    TextAnalysis.vocabulary(df, "text", minCount = 2L, topK = 100)
      .collect().map(_.getString(0)).toSet shouldBe Set("the", "quick")
  }

  test("minhash near-dups: identical docs pair with est_jaccard 1.0") {
    // duplicate a couple docs under new ids to guarantee near-dup pairs
    val dupes = docs.limit(3).withColumn("doc_id", col("doc_id") + 1000000L)
    val aug = docs.unionByName(dupes)
    val pairs = Dedup.minhashNearDups(aug, "doc_id", "text", numHashes = 32, bands = 8,
      jaccardThreshold = 0.9).cache()
    pairs.where(col("id_b") >= 1000000L && col("est_jaccard") === 1.0).count() should be >= 3L
  }

  test("native MinHashExpr matches the HOF formulation bit-for-bit") {
    val nat = graft.ops.Dedup.minhashSignatures(docs, "doc_id", "text", 16, 8)
    val hof = graft.ops.Dedup.minhashSignaturesHof(docs, "doc_id", "text", 16, 8)
    val joined = nat.as("n").join(hof.as("h"), col("n.id") === col("h.id"))
      .where(expr("n.sig <> h.sig"))
    joined.count() shouldBe 0L
    // short-string edge: whole string as single shingle
    val one = spark.sql("SELECT 'abc' AS t")
    val a = graft.ops.Dedup.minhashSignatures(one.withColumn("id", lit(1L)), "id", "t", 4, 8).head().getSeq[Long](1)
    val b = graft.ops.Dedup.minhashSignaturesHof(one.withColumn("id", lit(1L)), "id", "t", 4, 8).head().getSeq[Long](1)
    a shouldBe b
  }

  test("native ShingleHashesExpr matches xxhash64 of the HOF shingles bit-for-bit") {
    import graft.functions.ShingleHashesExpr.shingleHashes
    // corpus sample: element-wise equality against the materialized form
    val k = 13
    val d = docs.limit(200)
      .select(TextAnalysis.normalizeText(col("text")).as("_norm"))
      .select(
        shingleHashes(col("_norm"), k).as("nat"),
        transform(TextAnalysis.shinglesOfNorm(col("_norm"), k), s => xxhash64(s)).as("hof"))
    d.where(expr("nat <> hof")).count() shouldBe 0L
    // edges: short (whole-string shingle), empty, unicode (code-point
    // windows over multi-byte text), and NULL propagation
    val edges = spark.sql(
      "SELECT * FROM VALUES ('ab'), (''), ('héllo wörld ünïcode!'), (CAST(NULL AS STRING)) AS t(s)")
    val e = edges.select(
      shingleHashes(col("s"), 5).as("nat"),
      when(col("s").isNotNull,
        transform(TextAnalysis.shinglesOfNorm(col("s"), 5), x => xxhash64(x))).as("hof"))
    e.where(expr("NOT (nat <=> hof)")).count() shouldBe 0L
  }

  test("native WordWindowHashesExpr matches xxhash64 of the slice+concat windows bit-for-bit") {
    import graft.functions.WordWindowHashesExpr.wordWindowHashes
    val w = 8
    val hofWins = (norm: org.apache.spark.sql.Column) => {
      val ws = split(norm, " ")
      when(functions.size(ws) >= w && ws.getItem(0) =!= "",
        transform(sequence(lit(0), functions.size(ws) - w),
          p => xxhash64(concat_ws(" ", slice(ws, p + 1, lit(w))))))
        .otherwise(array().cast("array<bigint>"))
    }
    val d = docs.limit(200)
      .select(TextAnalysis.normalizeText(col("text")).as("_norm"))
      .select(wordWindowHashes(col("_norm"), w).as("nat"), hofWins(col("_norm")).as("hof"))
    d.where(expr("nat <> hof")).count() shouldBe 0L
    // edges: exactly-w words, fewer than w, empty, unicode words (w=3)
    val edges = spark.sql(
      "SELECT * FROM VALUES ('a b c'), ('one two'), (''), ('é ü ö'), ('x y z w') AS t(s)")
    val hof3 = (norm: org.apache.spark.sql.Column) => {
      val ws = split(norm, " ")
      when(functions.size(ws) >= 3 && ws.getItem(0) =!= "",
        transform(sequence(lit(0), functions.size(ws) - 3),
          p => xxhash64(concat_ws(" ", slice(ws, p + 1, lit(3))))))
        .otherwise(array().cast("array<bigint>"))
    }
    edges.select(wordWindowHashes(col("s"), 3).as("nat"), hof3(col("s")).as("hof"))
      .where(expr("nat <> hof")).count() shouldBe 0L
  }

  test("PlanBarrierExpr is value-preserving and keeps filters above its projection") {
    import graft.functions.PlanBarrierExpr.barrier
    val d = docs.select(col("doc_id"), barrier(functions.length(col("text"))).as("len"),
      functions.length(col("text")).as("len2"))
    d.where(expr("NOT (len <=> len2)")).count() shouldBe 0L
    // a filter over the barriered column must NOT be pushed into the scan
    val filtered = docs.repartition(4)
      .withColumn("len", barrier(functions.length(col("text"))))
      .where(col("len") > 10)
    val p = filtered.queryExecution.executedPlan.toString
    // the filter evaluates the projected ATTRIBUTE; no clone of the
    // barriered expression is pushed below the exchange into a Filter
    p.linesIterator.filter(_.contains("Filter")).foreach { l =>
      l should not include "length("
    }
    p should include("planbarrierexpr")
  }

  test("pooled JPEG reader: repeated decodes are identical, corrupt input falls back closed") {
    import graft.ops.MediaCodecs
    val img = MediaCodecs.DecodedImage(16, 12, 3,
      Array.tabulate(16 * 12 * 3)(i => (i % 251).toByte))
    val jpeg = MediaCodecs.encodeJpeg(img)
    val a = MediaCodecs.decodeJdkImage(jpeg).get
    val b = MediaCodecs.decodeJdkImage(jpeg).get // same thread → pooled reader reused
    a.pixels.toSeq shouldBe b.pixels.toSeq
    a.width shouldBe 16; a.height shouldBe 12
    // corrupt payload with a JPEG SOI marker: pooled path must fail closed
    val corrupt = Array[Byte](0xFF.toByte, 0xD8.toByte, 1, 2, 3, 4)
    MediaCodecs.decodeJdkImage(corrupt) shouldBe None
    // and a subsequent good decode on the same thread still works
    MediaCodecs.decodeJdkImage(jpeg).map(_.width) shouldBe Some(16)
  }

  test("simhash: identical text distance 0, perturbed text small distance") {
    val sig = docs.limit(5).select(col("doc_id"), Dedup.simhash(col("text")).as("s"),
      Dedup.simhash(concat(col("text"), lit(" extra token"))).as("s2"))
    val rows = sig.collect()
    rows.foreach { r =>
      Dedup.hamming64(lit(r.getLong(1)), lit(r.getLong(1))).toString() // smoke
      val d = java.lang.Long.bitCount(r.getLong(1) ^ r.getLong(2))
      d should be <= 16
    }
  }

  test("simhash near-dups finds injected duplicates") {
    val dupes = docs.limit(3).withColumn("doc_id", col("doc_id") + 1000000L)
    val aug = docs.unionByName(dupes)
    Dedup.simhashNearDups(aug, "doc_id", "text", maxHamming = 3)
      .where(col("id_b") >= 1000000L && col("hamming") === 0).count() should be >= 3L
  }

  test("native SimHashExpr matches the HOF formulation bit-for-bit") {
    val nat = Dedup.simhashSignatures(docs, "doc_id", "text")
    val hof = Dedup.simhashSignaturesHof(docs, "doc_id", "text")
    nat.as("n").join(hof.as("h"), col("n.id") === col("h.id"))
      .where(col("n.sig") =!= col("h.sig")).count() shouldBe 0L
  }

  test("native HyperplaneSigExpr matches the HOF formulation bit-for-bit") {
    val dim = embs.head().getSeq[Float](1).length
    val nat = embs.select(col("vec_id"),
      Similarity.hyperplaneSignature(col("embedding"), dim, 12, 42).as("sig"))
    val hof = embs.select(col("vec_id"),
      Similarity.hyperplaneSignatureHof(col("embedding"), dim, 12, 42).as("sig"))
    nat.as("n").join(hof.as("h"), col("n.vec_id") === col("h.vec_id"))
      .where(col("n.sig") =!= col("h.sig")).count() shouldBe 0L
  }

  test("near-dup clusters: min-label connected components + survivors") {
    import spark.implicits._
    // chain 1-2, 2-3 (one cluster), isolated pair 10-11
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(pairs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    cl(1L) shouldBe 1L; cl(2L) shouldBe 1L; cl(3L) shouldBe 1L
    cl(10L) shouldBe 10L; cl(11L) shouldBe 10L
    val all = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val surv = Dedup.survivors(all, "doc_id", pairs).collect().map(_.getLong(0)).sorted
    surv shouldBe Array(1L, 10L, 99L)
  }

  test("zero-norm vectors never rank in top-k or pair as near-dups (cosine NULL, not NaN)") {
    import spark.implicits._
    // Spark orders NaN above every real double and evaluates NaN >= t as
    // true — 0/0 cosines used to rank all-zero embeddings FIRST
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f)), (3L, Array(0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      Seq(1.0f, 0.0f), 2).collect().map(_.getLong(0)).toSeq
    top shouldBe Seq(0L, 1L) // pre-fix: the two zero vectors ranked first
    val dups = Dedup.embeddingNearDups(vecs, "vec_id", "embedding",
      dim = 2, planes = 4, cosineThreshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    dups should not contain ((2L, 3L)) // NaN >= 0.9 used to emit this pair
    dups should contain((0L, 1L))
  }

  test("ivfAssign: NULL and wrong-dimension vectors get a NULL cell, not cell 0") {
    import spark.implicits._
    val centroids = Seq(Seq(0.0f, 0.0f), Seq(10.0f, 10.0f))
    val vecs = Seq[(Long, Array[Float])](
      (0L, Array(0.1f, 0.1f)), (1L, Array(9.9f, 9.9f)),
      (2L, null), (3L, Array(1.0f)) // null + ragged
    ).toDF("vec_id", "embedding")
    val cells = Similarity.ivfAssign(vecs, "embedding", centroids)
      .select("vec_id", "ivf_cell").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    cells(0L) shouldBe 0
    cells(1L) shouldBe 1
    cells(2L) shouldBe -1 // pre-fix: struct ordering dumped these in cell 0
    cells(3L) shouldBe -1
  }

  test("minhash banding rejects bands that do not divide numHashes (silent-empty-output guard)") {
    import spark.implicits._
    val df = Seq((1L, "aaaa"), (2L, "aaaa")).toDF("doc_id", "text")
    an[IllegalArgumentException] should be thrownBy
      Dedup.minhashNearDups(df, "doc_id", "text", numHashes = 16, bands = 32)
    an[IllegalArgumentException] should be thrownBy
      Dedup.minhashNearDups(df, "doc_id", "text", numHashes = 32, bands = 5)
  }

  test("qualityFeatures scores NULL text as empty text (no -1 word counts)") {
    import spark.implicits._
    val df = Seq[(Long, String)]((0L, "real words here."), (1L, null))
      .toDF("doc_id", "text")
    val q = TextAnalysis.qualityFeatures(df, "text")
      .select("doc_id", "q_n_chars", "q_n_words").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    q(1L) shouldBe ((0, 0)) // pre-fix: size(split(NULL)) leaked -1/NULL
    q(0L)._2 shouldBe 3
  }

  test("near-dup clusters: long-chain component (diameter > 8) converges; hitting maxIter throws") {
    import spark.implicits._
    // min-label propagation moves ONE hop per round: a 13-node chain
    // (diameter 12) needs ~12 rounds, past the old silent cap of 8 —
    // which returned WRONG labels for exactly this shape
    val chain = (0L until 12L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val cl = Dedup.clusters(chain).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    (0L to 12L).foreach(i => cl(i) shouldBe 0L)
    // an unconverged run must fail LOUD, not return approximate labels
    an[IllegalStateException] should be thrownBy
      Dedup.clusters(chain, maxIter = 3)
  }

  test("salted skewed count equals plain groupBy count") {
    val turns = graft.data.TranscriptGen.turns(spark, 300, parts = 4, numParts = 8)
    val plain = turns.groupBy("conv_id").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = graft.checks.TableChecks.countBySkewedKey(turns, "conv_id", salts = 4)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    salted shouldBe plain
  }

  test("ngram jaccard: identical 1.0, disjoint ~0") {
    val r = spark.range(1).select(
      Dedup.ngramJaccard(lit("the quick brown fox"), lit("the quick brown fox")).as("same"),
      Dedup.ngramJaccard(lit("aaaaaaaaaaaaaaa"), lit("zzzzzzzzzzzzzzz")).as("diff")).head()
    r.getDouble(0) shouldBe 1.0
    r.getDouble(1) shouldBe 0.0
  }

  test("brute-force cosine top-k: query vector's own row ranks first") {
    val first = embs.orderBy("vec_id").limit(1).collect()(0)
    val q = first.getSeq[Float](first.fieldIndex("embedding"))
    val top = Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 5).collect()
    top.head.getLong(0) shouldBe first.getLong(first.fieldIndex("vec_id"))
    top.head.getDouble(1) shouldBe 1.0 +- 1e-5
  }

  test("LSH top-k recall vs brute force on its candidate set") {
    val first = embs.orderBy("vec_id").limit(1).collect()(0)
    val q = first.getSeq[Float](first.fieldIndex("embedding"))
    val lsh = Similarity.lshTopK(embs, "vec_id", "embedding", q, 5, planes = 6)
    val got = lsh.collect()
    got.length should be > 0
    got.head.getLong(0) shouldBe first.getLong(first.fieldIndex("vec_id"))
  }

  test("embedding near-dups finds duplicated vectors") {
    val dupes = embs.limit(3).withColumn("vec_id", col("vec_id") + 1000000L)
    val aug = embs.unionByName(dupes)
    val dim = embs.select(expr("size(embedding)")).head().getInt(0)
    Dedup.embeddingNearDups(aug, "vec_id", "embedding", dim, planes = 8)
      .where(col("id_b") >= 1000000L && col("cosine") > 0.9999).count() should be >= 3L
  }

  test("multimodal: feature extraction and frame sampling plumbing") {
    import spark.implicits._
    val assets = Multimodal.syntheticAssets(spark, 300, parts = 4)
    val feats = Multimodal.extractFeatures(assets).cache()
    feats.count() shouldBe 300L
    feats.where(!col("ok")).count() shouldBe 0L
    feats.head().feat.length shouldBe Multimodal.DecodeStub.featDim
    // deterministic across reruns
    val f1 = feats.where(col("asset_id") === 7).head().feat.toSeq
    val f2 = Multimodal.extractFeatures(Multimodal.syntheticAssets(spark, 300, parts = 7))
      .where(col("asset_id") === 7).head().feat.toSeq
    f1 shouldBe f2

    val frames = Multimodal.sampleFrames(assets.toDF(), everyN = 4)
    frames.count() should be > 0L
    frames.select(max(fn_len(col("frame_bytes")))).head().getInt(0) should be <= 16

    val rs = Multimodal.resizePlan(assets.toDF(), maxSide = 32)
    rs.agg(max(greatest(col("target_width"), col("target_height")))).head().getInt(0) should be <= 32
  }

  test("media codecs: PNG round-trip across color types, filters and edge dims") {
    import graft.ops.MediaCodecs
    import MediaCodecs.DecodedImage
    def raster(w: Int, h: Int, nc: Int, seed: Int): DecodedImage =
      DecodedImage(w, h, nc, Array.tabulate(w * h * nc)(i => ((seed * 31 + i * 7) % 256).toByte))
    for {
      nc <- Seq(1, 3, 4)
      (w, h) <- Seq((1, 1), (1, 9), (9, 1), (8, 8), (13, 7), (64, 3))
      filterOfRow <- Seq[Int => Int](_ % 5, _ => 0, _ => 1, _ => 2, _ => 3, _ => 4)
    } {
      val img = raster(w, h, nc, w * 100 + h * 10 + nc)
      val decoded = MediaCodecs.decodePng(MediaCodecs.encodePng(img, filterOfRow))
      decoded.isDefined shouldBe true
      val d = decoded.get
      (d.width, d.height, d.channels) shouldBe ((w, h, nc))
      d.pixels.toSeq shouldBe img.pixels.toSeq
    }
  }

  test("media codecs: PNG decode is fail-closed on hostile/malformed input") {
    import graft.ops.MediaCodecs
    val good = MediaCodecs.encodePng(MediaCodecs.DecodedImage(8, 8, 3,
      Array.tabulate(8 * 8 * 3)(i => (i % 256).toByte)))
    MediaCodecs.decodePng(good).isDefined shouldBe true
    // truncation anywhere → None, never a throw
    for (cut <- Seq(0, 7, 8, 20, 33, good.length / 2, good.length - 1))
      MediaCodecs.decodePng(good.take(cut)) shouldBe None
    // flipped byte inside IDAT → chunk CRC mismatch → None
    val flipped = good.clone(); flipped(good.length - 20) = (flipped(good.length - 20) ^ 0x55).toByte
    MediaCodecs.decodePng(flipped) shouldBe None
    // crafted IHDR claiming a huge raster (allocation bomb) → None
    val bomb = good.clone()
    // IHDR data starts at offset 16: width/height big-endian
    bomb(16) = 0x7F.toByte; bomb(17) = 0xFF.toByte // width ≈ 2^31
    MediaCodecs.decodePng(bomb) shouldBe None // CRC also fails; either guard rejects
    // interlaced / 16-bit-depth flags → unsupported → None (valid CRC retained
    // by re-encoding through chunk surgery is unnecessary: CRC check fires first,
    // and unsupported-shape checks are exercised via direct header rebuilds)
    MediaCodecs.decodePng(Array.fill[Byte](64)(0x42)) shouldBe None
    MediaCodecs.decodePng(null) shouldBe None
    MediaCodecs.decodePng(Array.emptyByteArray) shouldBe None
  }

  test("media codecs: PNG dimension/stream disagreement is rejected both ways") {
    import graft.ops.MediaCodecs
    import java.util.zip.CRC32
    // take a valid 8x8 PNG and patch IHDR to claim 4x4 (stream now has
    // trailing data) and 16x16 (stream now short): both must fail, so a
    // decompression bomb can never materialize beyond the declared size
    val base = MediaCodecs.encodePng(MediaCodecs.DecodedImage(8, 8, 1,
      Array.tabulate(64)(i => (i * 3).toByte)))
    def patchDims(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val b = src.clone()
      val bb = java.nio.ByteBuffer.wrap(b, 16, 8)
      bb.putInt(w).putInt(h)
      val crc = new CRC32(); crc.update(b, 12, 4 + 13) // type + IHDR data
      val v = crc.getValue
      java.nio.ByteBuffer.wrap(b, 12 + 4 + 13, 4).putInt(v.toInt)
      b
    }
    MediaCodecs.decodePng(patchDims(base, 4, 4)) shouldBe None
    MediaCodecs.decodePng(patchDims(base, 16, 16)) shouldBe None
    MediaCodecs.decodePng(patchDims(base, 8, 8)).isDefined shouldBe true // patch is sound

    // IHDR dims are unsigned 32-bit: w = h = 0xFFFFFFFF makes w*h OVERFLOW
    // Long to a negative value, slipping past a product-only pixel cap and
    // (pre-guard) returning a DecodedImage with negative dims or throwing
    // NegativeArraySizeException. Each side must be bounded BEFORE the
    // multiply. putInt(-1) writes 0xFFFFFFFF.
    MediaCodecs.decodePng(patchDims(base, -1, -1)) shouldBe None
    // 0xC0000000 × 0xC0000000 ≈ 1.04e19 also wraps Long negative
    MediaCodecs.decodePng(patchDims(base, 0xC0000000, 0xC0000000)) shouldBe None
    // one huge side with the other tiny: caught by the per-side bound
    MediaCodecs.decodePng(patchDims(base, -1, 1)) shouldBe None
    MediaCodecs.decodePng(patchDims(base, 1, -1)) shouldBe None
  }

  test("media codecs: BMP round-trip, row padding, top-down and hostile input") {
    import graft.ops.MediaCodecs
    import MediaCodecs.DecodedImage
    for ((w, h) <- Seq((1, 1), (3, 5), (4, 4), (7, 2))) { // w=3,7 exercise padding
      val img = DecodedImage(w, h, 3,
        Array.tabulate(w * h * 3)(i => ((i * 11 + w) % 256).toByte))
      val d = MediaCodecs.decodeBmp(MediaCodecs.encodeBmp(img))
      d.isDefined shouldBe true
      d.get.pixels.toSeq shouldBe img.pixels.toSeq
    }
    // top-down variant: negate the height field of a bottom-up encode and
    // reverse the stored row order → identical decoded raster
    val img = DecodedImage(3, 2, 3, Array.tabulate(18)(i => (i * 5).toByte))
    val bu = MediaCodecs.encodeBmp(img)
    val td = bu.clone()
    java.nio.ByteBuffer.wrap(td, 22, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-2)
    val rowBytes = (3 * 3 + 3) & ~3
    for (r <- 0 until 2; i <- 0 until rowBytes)
      td(54 + r * rowBytes + i) = bu(54 + (1 - r) * rowBytes + i)
    MediaCodecs.decodeBmp(td).get.pixels.toSeq shouldBe img.pixels.toSeq
    // hostile: truncated, wrong magic, crafted huge dims
    MediaCodecs.decodeBmp(bu.take(40)) shouldBe None
    val badMagic = bu.clone(); badMagic(0) = 'X'.toByte
    MediaCodecs.decodeBmp(badMagic) shouldBe None
    val huge = bu.clone()
    java.nio.ByteBuffer.wrap(huge, 18, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(1 << 20)
    MediaCodecs.decodeBmp(huge) shouldBe None
    MediaCodecs.decodeBmp(null) shouldBe None
  }

  test("media codecs: GIF round-trip + JDK ImageIO cross-validation BOTH directions") {
    import graft.ops.MediaCodecs
    System.setProperty("java.awt.headless", "true")
    val rnd = new scala.util.Random(7)
    // sizes chosen to push LZW through several code-width flips and (at
    // 200x150 with 256 colors) toward dictionary pressure
    for ((w, h, pbits) <- Seq((1, 1, 2), (9, 7, 4), (40, 30, 4), (64, 64, 8), (200, 150, 8))) {
      val n = 1 << pbits
      val pal = Array.tabulate[Byte](n * 3)(i => ((i * 37 + 11) % 256).toByte)
      val idx = Array.tabulate[Byte](w * h)(_ => rnd.nextInt(n).toByte)
      def expected: Array[Byte] = Array.tabulate[Byte](w * h * 3) { i =>
        val p = i / 3; val c = i % 3; pal((idx(p) & 0xFF) * 3 + c)
      }
      // mine -> mine
      val gif = MediaCodecs.encodeGif(w, h, idx, pal)
      val d = MediaCodecs.decodeGif(gif)
      d.isDefined shouldBe true
      (d.get.width, d.get.height) shouldBe ((w, h))
      d.get.pixels.toSeq shouldBe expected.toSeq
      // mine -> JDK ImageIO (my ENCODER is standard)
      val iio = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
      iio should not be null
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = iio.getRGB(x, y); val j = (idx(y * w + x) & 0xFF) * 3
        ((rgb >> 16) & 0xFF, (rgb >> 8) & 0xFF, rgb & 0xFF) shouldBe
          ((pal(j) & 0xFF, pal(j + 1) & 0xFF, pal(j + 2) & 0xFF))
      }
      // JDK ImageIO writer -> my DECODER (my decoder is standard)
      val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val j = (idx(y * w + x) & 0xFF) * 3
        bi.setRGB(x, y, ((pal(j) & 0xFF) << 16) | ((pal(j + 1) & 0xFF) << 8) | (pal(j + 2) & 0xFF))
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(bi, "gif", bos)
      val mine = MediaCodecs.decodeGif(bos.toByteArray)
      mine.isDefined shouldBe true
      mine.get.pixels.toSeq shouldBe expected.toSeq
    }
    // hostile: truncation, bad magic, out-of-palette garbage LZW
    val ok = MediaCodecs.encodeGif(8, 8, Array.fill[Byte](64)(1), Array.fill[Byte](12)(9))
    for (cut <- Seq(0, 5, 12, 20, ok.length - 2))
      MediaCodecs.decodeGif(ok.take(cut)) shouldBe None
    val bad = ok.clone(); bad(0) = 'X'.toByte
    MediaCodecs.decodeGif(bad) shouldBe None
    MediaCodecs.decodeGif(null) shouldBe None
  }

  test("media codecs: JPEG decode via the JDK codec stays within tolerance of the source") {
    import graft.ops.MediaCodecs
    val w = 32; val h = 24
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      px(d) = (30 + x * 4).toByte; px(d + 1) = (40 + y * 5).toByte; px(d + 2) = 77.toByte
    }
    val jpeg = MediaCodecs.encodeJpeg(MediaCodecs.DecodedImage(w, h, 3, px))
    // really a JPEG (SOI marker), and the pure parsers correctly refuse it
    (jpeg(0) & 0xFF, jpeg(1) & 0xFF) shouldBe ((0xFF, 0xD8))
    MediaCodecs.decodePng(jpeg) shouldBe None
    MediaCodecs.decodeGif(jpeg) shouldBe None
    val d = MediaCodecs.decodeJdkImage(jpeg)
    d.isDefined shouldBe true
    (d.get.width, d.get.height, d.get.channels) shouldBe ((w, h, 3))
    val maxErr = (0 until w * h * 3).map(i => math.abs((d.get.pixels(i) & 0xFF) - (px(i) & 0xFF))).max
    maxErr should be <= 20
    // fail-closed on garbage
    MediaCodecs.decodeJdkImage(Array.fill[Byte](64)(0x11)) shouldBe None
    MediaCodecs.decodeJdkImage(jpeg.take(30)) shouldBe None
    MediaCodecs.decodeJdkImage(null) shouldBe None
  }

  test("media codecs: MJPEG AVI frame extraction round-trip + distributed sampling") {
    import graft.ops.MediaCodecs
    val w = 16; val h = 12
    def frame(seed: Int): Array[Byte] = {
      val px = Array.tabulate[Byte](w * h * 3) { i => (seed + i / 3).toByte }
      MediaCodecs.encodeJpeg(MediaCodecs.DecodedImage(w, h, 3, px))
    }
    val frames = (0 until 7).map(f => frame(f * 40))
    val avi = MediaCodecs.encodeMjpegAvi(frames, w, h)
    // byte-exact frame recovery (the container stores the JPEGs verbatim)
    val got = MediaCodecs.mjpegFrames(avi)
    got.isDefined shouldBe true
    got.get.size shouldBe 7
    got.get.zip(frames).foreach { case (a, b) => a.toSeq shouldBe b.toSeq }
    got.get.foreach(j => MediaCodecs.decodeJdkImage(j).isDefined shouldBe true)
    // hostile: truncation, non-AVI RIFF (a WAV), garbage
    for (cut <- Seq(0, 10, 30, avi.length / 2)) MediaCodecs.mjpegFrames(avi.take(cut)) shouldBe None
    val wav = MediaCodecs.encodeWavPcm(MediaCodecs.DecodedAudio(1, 8000, 16, Array(1, 2, 3)))
    MediaCodecs.mjpegFrames(wav) shouldBe None
    MediaCodecs.mjpegFrames(null) shouldBe None
    // distributed sampling: every 2nd frame, one row per (asset, frame)
    import spark.implicits._
    val assets = Seq((1L, avi), (2L, avi), (3L, wav /*dropped, fail-closed*/))
      .toDF("asset_id", "bytes")
    val sampled = Multimodal.sampleMjpegFrames(assets, "asset_id", "bytes", everyN = 2)
      .collect()
    sampled.map(r => (r.getLong(0), r.getInt(1))).sorted.toSeq shouldBe
      Seq((1L, 0), (1L, 2), (1L, 4), (1L, 6), (2L, 0), (2L, 2), (2L, 4), (2L, 6))
  }

  test("media codecs: nested-movi LIST bomb returns None, never StackOverflowError") {
    import graft.ops.MediaCodecs
    val ascii = java.nio.charset.StandardCharsets.US_ASCII
    // 60,000 nested `LIST…movi` headers (12 bytes per level): a recursive
    // walk without a depth cap dies in StackOverflowError — an Error no
    // fail-closed caller catches, so one hostile row would kill the task
    var inner = Array.emptyByteArray
    for (_ <- 0 until 60000) {
      val b = java.nio.ByteBuffer.allocate(12 + inner.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      b.put("LIST".getBytes(ascii)).putInt(4 + inner.length)
        .put("movi".getBytes(ascii)).put(inner)
      inner = b.array()
    }
    val riff = java.nio.ByteBuffer.allocate(12 + inner.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    riff.put("RIFF".getBytes(ascii)).putInt(4 + inner.length)
      .put("AVI ".getBytes(ascii)).put(inner)
    MediaCodecs.mjpegFrames(riff.array()) shouldBe None
    // legal nesting (movi → rec ) still extracts frames: everyday AVIs
    // sit at depth ≤ 2, far under the cap
    val fr = MediaCodecs.encodeJpeg(MediaCodecs.DecodedImage(4, 4, 3,
      Array.tabulate(48)(_.toByte)))
    val avi = MediaCodecs.encodeMjpegAvi(Seq(fr), 4, 4)
    MediaCodecs.mjpegFrames(avi).map(_.size) shouldBe Some(1)
  }

  test("media codecs: bilinear resize is exact on linear gradients, any channel count") {
    import graft.ops.MediaCodecs
    // Lossless path: PNG round-trip of a channelwise-linear 32x24 gradient
    // halved to 16x12. Pixel-center sampling lands on half-integer source
    // coordinates, so the expected value is the average of two adjacent
    // linear samples — exact up to round-to-nearest.
    val w = 32; val h = 24
    for (nc <- Seq(1, 3, 4)) {
      val px = new Array[Byte](w * h * nc)
      for (y <- 0 until h; x <- 0 until w; c <- 0 until nc)
        px((y * w + x) * nc + c) = (5 + x * 2 + y * 2 + c * 20).toByte // max 173, no wrap
      val img = MediaCodecs.DecodedImage(w, h, nc, px)
      val r = MediaCodecs.resizeBilinear(img, 16, 12)
      (r.width, r.height, r.channels) shouldBe ((16, 12, nc))
      for (y <- 0 until 12; x <- 0 until 16; c <- 0 until nc) {
        // src fx = 2x+0.5, fy = 2y+0.5 -> mean of 4 linear samples
        val expect = 5.0 + 2 * (2 * x + 0.5) + 2 * (2 * y + 0.5) + c * 20
        val got = r.pixels((y * 16 + x) * nc + c) & 0xFF
        math.abs(got - expect) should be <= 1.0
      }
      // PNG round-trip of the resized raster is byte-exact (lossless)
      val back = MediaCodecs.decodePng(MediaCodecs.encodePng(r))
      back.get.pixels.toSeq shouldBe r.pixels.toSeq
    }
    // identity target returns the same raster; 1x1 target is the corner mean
    val tiny = MediaCodecs.DecodedImage(2, 2, 1, Array[Byte](0, 100, 50, 70))
    MediaCodecs.resizeBilinear(tiny, 2, 2).pixels.toSeq shouldBe Seq[Byte](0, 100, 50, 70)
    (MediaCodecs.resizeBilinear(tiny, 1, 1).pixels(0) & 0xFF) shouldBe 55
  }

  test("resizeImages: distributed decode->resample->PNG, aspect kept, no upscale, fail-closed") {
    import graft.ops.MediaCodecs
    import spark.implicits._
    val w = 32; val h = 24
    val px = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val d = (y * w + x) * 3
      px(d) = (30 + x * 4).toByte; px(d + 1) = (40 + y * 5).toByte; px(d + 2) = 77.toByte
    }
    val png = MediaCodecs.encodePng(MediaCodecs.DecodedImage(w, h, 3, px))
    val small = MediaCodecs.encodePng(MediaCodecs.DecodedImage(4, 3, 3, new Array[Byte](36)))
    val assets = Seq((1L, png), (2L, small), (3L, Array.fill[Byte](40)(0x5A)))
      .toDF("asset_id", "bytes")
    val out = Multimodal.resizeImages(assets, "asset_id", "bytes", maxSide = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getAs[Array[Byte]](5)))).toMap
    out.keySet shouldBe Set(1L, 2L) // garbage payload dropped, fail-closed
    val (sw, sh, tw, th, outPng) = out(1L)
    ((sw, sh, tw, th)) shouldBe ((32, 24, 16, 12))
    val dec = MediaCodecs.decodePng(outPng).get
    for (y <- 0 until 12; x <- 0 until 16) {
      val d = (y * 16 + x) * 3
      math.abs((dec.pixels(d) & 0xFF) - (32.0 + 8 * x)) should be <= 1.0
      math.abs((dec.pixels(d + 1) & 0xFF) - (42.5 + 10 * y)) should be <= 1.0
      (dec.pixels(d + 2) & 0xFF) shouldBe 77
    }
    // already within maxSide: never upscaled, raster passes through
    out(2L)._3 shouldBe 4
    out(2L)._4 shouldBe 3
  }

  test("audioFeatures: windowed RMS/peak/zero-crossings over decoded PCM, exact") {
    import graft.ops.MediaCodecs
    import spark.implicits._
    // 40 samples, window 16 -> 2 complete windows, trailing 8 dropped.
    // Window 0: alternating +/-100 -> rms 100, peak 100, 15 crossings.
    // Window 1: ramp 0..15 (no sign change) scaled -> zero crossings 0.
    val samples = Array.tabulate(40) { i =>
      if (i < 16) (if (i % 2 == 0) 100 else -100)
      else if (i < 32) (i - 16) * 7
      else 9999
    }
    val wav = MediaCodecs.encodeWavPcm(MediaCodecs.DecodedAudio(1, 8000, 16, samples))
    val df = Seq((5L, wav), (6L, Array.fill[Byte](32)(0x7F))).toDF("asset_id", "bytes")
    val rows = Multimodal.audioFeatures(df, "asset_id", "bytes", windowSize = 16)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        ((r.getDouble(2), r.getInt(3), r.getInt(4)))).toMap
    rows.keySet shouldBe Set((5L, 0), (5L, 1)) // junk payload dropped; partial window dropped
    rows((5L, 0)) shouldBe ((100.0, 100, 15))
    val ramp = (0 until 16).map(i => (i * 7).toLong)
    val expRms = math.sqrt(ramp.map(v => v * v).sum.toDouble / 16)
    rows((5L, 1)) shouldBe ((expRms, 105, 0))
  }

  test("media codecs: WAV PCM round-trip (8/16-bit) and fail-closed paths") {
    import graft.ops.MediaCodecs
    import MediaCodecs.DecodedAudio
    val s16 = Array.tabulate(300)(i => ((i * 997) % 65536) - 32768)
    val d16 = MediaCodecs.decodeWavPcm(MediaCodecs.encodeWavPcm(DecodedAudio(2, 44100, 16, s16)))
    d16.isDefined shouldBe true
    (d16.get.channels, d16.get.sampleRate, d16.get.bits) shouldBe ((2, 44100, 16))
    d16.get.samples.toSeq shouldBe s16.toSeq
    val s8 = Array.tabulate(77)(i => (i % 256) - 128)
    val d8 = MediaCodecs.decodeWavPcm(MediaCodecs.encodeWavPcm(DecodedAudio(1, 8000, 8, s8)))
    d8.get.samples.toSeq shouldBe s8.toSeq
    // non-PCM format tag stays stubbed → None
    val enc = MediaCodecs.encodeWavPcm(DecodedAudio(1, 8000, 16, s16))
    val nonPcm = enc.clone()
    java.nio.ByteBuffer.wrap(nonPcm, 20, 2).order(java.nio.ByteOrder.LITTLE_ENDIAN).putShort(3)
    MediaCodecs.decodeWavPcm(nonPcm) shouldBe None
    // truncated / wrong magic
    MediaCodecs.decodeWavPcm(enc.take(30)) shouldBe None
    val bad = enc.clone(); bad(8) = 'X'.toByte
    MediaCodecs.decodeWavPcm(bad) shouldBe None
    MediaCodecs.decodeWavPcm(null) shouldBe None
  }

  test("multimodal: extractFeatures computes REAL statistics for decodable payloads") {
    import graft.ops.MediaCodecs
    // constant-value PNG: mean = the constant, std = 0
    val img = MediaCodecs.DecodedImage(5, 4, 3, Array.fill[Byte](60)(200.toByte))
    val f = Multimodal.decodeFeatures(MediaCodecs.encodePng(img))
    f(0) shouldBe 5f; f(1) shouldBe 4f; f(2) shouldBe 3f
    f(3) shouldBe 200f; f(4) shouldBe 0f; f(5) shouldBe 200f; f(6) shouldBe 200f
    f(7) shouldBe 1f // real-decode flag
    // WAV: constant sample → mean = rms magnitude = the constant
    val wav = MediaCodecs.encodeWavPcm(MediaCodecs.DecodedAudio(1, 16000, 16, Array.fill(64)(100)))
    val g = Multimodal.decodeFeatures(wav)
    g(0) shouldBe 64f; g(1) shouldBe 1f; g(2) shouldBe 16000f
    g(3) shouldBe 100f; g(4) shouldBe 100f; g(7) shouldBe 1f
    // garbage bytes fall to the declared stub, flagged 0
    Multimodal.decodeFeatures(Array.tabulate[Byte](50)(i => (i * 7).toByte)).last shouldBe 0f
  }

  test("multimodal: container header parsing (png/gif/bmp/jpeg, no codec)") {
    import graft.functions.ImageDimsExpr
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def dims(b: Array[Byte]): Option[(String, Int, Int)] =
      Option(ImageDimsExpr.parse(b)).map(r =>
        (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2)))

    // PNG: signature + IHDR, 640x480
    dims(hex("89504E470D0A1A0A 0000000D 49484452 00000280 000001E0 0806000000")) shouldBe
      Some(("png", 640, 480))
    // GIF89a little-endian 320x200
    dims(hex("474946383961 4001 C800 F70000")) shouldBe Some(("gif", 320, 200))
    // BMP little-endian 100x50, and top-down (negative height) 100x50
    dims(hex("424D 00000000 00000000 00000000 28000000 64000000 32000000 0100")) shouldBe
      Some(("bmp", 100, 50))
    dims(hex("424D 00000000 00000000 00000000 28000000 64000000 CEFFFFFF 0100")) shouldBe
      Some(("bmp", 100, 50))
    // JPEG: APP0 + fill bytes before SOF0, 1024x768
    dims(hex("FFD8 FFE00010 4A46494600010100000100010000 FFFF FFC0000B08 0300 0400 01110011 FFD9")) shouldBe
      Some(("jpeg", 1024, 768))
    // JPEG progressive (SOF2)
    dims(hex("FFD8 FFC2000B08 0010 0020 01110011 FFD9")) shouldBe Some(("jpeg", 32, 16))
    // DHT (C4) must be skipped, not treated as SOF
    dims(hex("FFD8 FFC40004 0000 FFC0000B08 0008 0009 01110011 FFD9")) shouldBe
      Some(("jpeg", 9, 8))
    // BITMAPCOREHEADER (OS/2) with LE16 dims
    dims(hex("424D 00000000 00000000 00000000 0C000000 6400 3200 0100 1800")) shouldBe
      Some(("bmp", 100, 50))
    // rejects: truncated PNG, PNG sig with a non-IHDR first chunk,
    // 'BM'-prefixed non-BMP blob, Int.MinValue BMP height,
    // EOI-before-SOF, garbage
    dims(hex("89504E470D0A1A0A 0000000D 494844")) shouldBe None
    dims(hex("89504E470D0A1A0A 00000004 67414D41 00000280 000001E0 08")) shouldBe None
    dims(("424D" + "2073616C657320666967757265732032303236206172652075702E").grouped(2)
      .map(Integer.parseInt(_, 16).toByte).toArray.take(30).padTo(30, 0.toByte)) shouldBe None
    dims(hex("424D 00000000 00000000 00000000 28000000 64000000 00000080 0100")) shouldBe None
    dims(hex("FFD8FFD9")) shouldBe None
    dims(hex("DEADBEEF00112233445566778899AABBCCDDEEFF0011223344556677")) shouldBe None

    // the Column surface parses inside a projection (codegen'd)
    import spark.implicits._
    val df = Seq(Tuple1(hex("474946383961 4001 C800 F70000"))).toDF("payload")
    val got = df.select(Multimodal.imageMeta(col("payload")).as("m"))
      .select("m.format", "m.width", "m.height").head()
    (got.getString(0), got.getInt(1), got.getInt(2)) shouldBe ("gif", 320, 200)
  }

  test("multimodal: WAV audio header parsing via fmt-chunk scan") {
    import graft.functions.AudioMetaExpr
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def meta(b: Array[Byte]): Option[(String, Int, Int, Int)] =
      Option(AudioMetaExpr.parse(b)).map(r =>
        (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3)))

    // canonical 16-bit stereo 44100 Hz PCM
    meta(hex("52494646 24000000 57415645 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000")) shouldBe
      Some(("wav", 2, 44100, 16))
    // fmt found after an odd-sized chunk (exercises 2-byte alignment)
    meta(hex("52494646 24000000 57415645 4C495354 03000000 414243 00" +
             "666D7420 10000000 0100 0100 803E0000 007D0000 0200 0800")) shouldBe
      Some(("wav", 1, 16000, 8))
    // rejects: RIFF but not WAVE, truncated fmt, missing fmt, zero channels
    meta(hex("52494646 24000000 41564920 666D7420 10000000 0100 0200 44AC0000 10B10200 0400 1000")) shouldBe None
    meta(hex("52494646 24000000 57415645 666D7420 10000000 0100 0200 44AC")) shouldBe None
    meta(hex("52494646 24000000 57415645 64617461 04000000 00000000")) shouldBe None
    meta(hex("52494646 24000000 57415645 666D7420 10000000 0100 0000 44AC0000 10B10200 0400 1000")) shouldBe None
  }

  test("multimodal: audio chunk-scan survives a near-Int.MaxValue chunk size (returns null)") {
    import graft.functions.AudioMetaExpr
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // JUNK chunk claiming size 0x7FFFFFFF: passes the size<0 check but must
    // bail out in long arithmetic instead of wrapping negative and crashing
    AudioMetaExpr.parse(hex("52494646 24000000 57415645 4A554E4B FFFFFF7F 00000000")) shouldBe null
  }

  test("multimodal: MP4 container header parsing (mvhd duration + tkhd dims)") {
    import graft.functions.VideoMetaExpr
    def hex(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def meta(b: Array[Byte]): Option[(String, Long, Option[Int], Option[Int])] =
      Option(VideoMetaExpr.parse(b)).map(r =>
        (r.getUTF8String(0).toString, r.getLong(1),
         if (r.isNullAt(2)) None else Some(r.getInt(2)),
         if (r.isNullAt(3)) None else Some(r.getInt(3))))

    val matrix = "000100000000000000000000" + "000000000001000000000000" +
      "000000000000000040000000"
    val ftyp = "00000010 66747970 69736F6D 00000200"
    // mvhd v0: timescale 600, duration 3000 -> 5000 ms
    val mvhd = "0000006C 6D766864 00000000 00000000 00000000 00000258 00000BB8" +
      "00010000 0100 0000 0000000000000000" + matrix +
      "000000000000000000000000000000000000000000000000" + "00000002"
    // tkhd v0: 1280x720 in 16.16 fixed point
    val tkhd = "0000005C 746B6864 00000007 00000000 00000000 00000001 00000000" +
      "00000BB8 0000000000000000 0000 0000 0000 0000" + matrix +
      "05000000 02D00000"
    val trak = "00000064 7472616B" + tkhd
    val full = hex(ftyp + "000000D8 6D6F6F76" + mvhd + trak)
    meta(full) shouldBe Some(("mp4", 5000L, Some(1280), Some(720)))

    // moov without a trak: duration still parsed, dims null
    meta(hex(ftyp + "00000074 6D6F6F76" + mvhd)) shouldBe
      Some(("mp4", 5000L, None, None))
    // rejects: no ftyp; truncated moov; crafted box size near Int.MaxValue
    // (must bail in long space, not wrap and crash)
    meta(hex("00000010 6D6F6F76 69736F6D 00000200")) shouldBe None
    meta(hex(ftyp + "000000D8 6D6F6F76 0000006C 6D7668")) shouldBe None
    meta(hex(ftyp + "7FFFFFFF 6D6F6F76 00000000")) shouldBe None

    // the Column surface parses inside a projection (codegen'd)
    import spark.implicits._
    val got = Seq(Tuple1(full)).toDF("payload")
      .select(Multimodal.videoMeta(col("payload")).as("m"))
      .select("m.format", "m.duration_ms", "m.width", "m.height").head()
    (got.getString(0), got.getLong(1), got.getInt(2), got.getInt(3)) shouldBe
      ("mp4", 5000L, 1280, 720)
  }

  test("header parsers never throw on arbitrary bytes (malformed payloads must not kill a 100TB job)") {
    import graft.functions.{AudioMetaExpr, ImageDimsExpr, VideoMetaExpr}
    // deterministic xorshift byte soup, plus adversarial prefixes that enter
    // each parser's main loop with hostile lengths/sizes
    var s = 0x9E3779B97F4A7C15L
    def next(): Long = { s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27; s * 0x2545F4914F6CDD1DL }
    val prefixes = Seq(
      Array[Byte](), "RIFF".getBytes, "RIFFxxxxWAVE".getBytes,
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A),
      "GIF89a".getBytes, "BM".getBytes, Array[Byte](0xFF.toByte, 0xD8.toByte),
      Array[Byte](0, 0, 0, 0x10, 'f', 't', 'y', 'p'))
    (0 until 400).foreach { i =>
      val len = (next() & 0x7F).toInt + (i % 4) * 16
      val body = Array.fill[Byte](len)((next() & 0xFF).toByte)
      val payload = prefixes(i % prefixes.size) ++ body
      noException should be thrownBy ImageDimsExpr.parse(payload)
      noException should be thrownBy AudioMetaExpr.parse(payload)
      noException should be thrownBy VideoMetaExpr.parse(payload)
    }
  }

  test("hyperplane signature: ragged vector (length != plane dim) leaves bits unset like the HOF form") {
    import spark.implicits._
    val dim = 4
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),   // exact dim
      (2L, Seq(1.0f, 2.0f)),               // short
      (3L, Seq(1.0f, 2.0f, 3.0f, 4.0f, 5.0f)) // long
    ).toDF("id", "v").withColumn("v", col("v").cast("array<float>"))
    val native = df.select(col("id"),
      Similarity.hyperplaneSignature(col("v"), dim, 8, 7L).as("sig"))
    val hof = df.select(col("id"),
      Similarity.hyperplaneSignatureHof(col("v"), dim, 8, 7L).as("sig"))
    native.exceptAll(hof).count() shouldBe 0L
    hof.exceptAll(native).count() shouldBe 0L
    // ragged rows collapse to bucket 0 (every bit unset)
    native.where(col("id") =!= 1L).select("sig").collect()
      .map(_.getLong(0)).toSeq shouldBe Seq(0L, 0L)
  }

  test("incremental dedup vs persisted LSH table matches the batch verified pair set") {
    val path = java.nio.file.Files.createTempDirectory("graft-inclsh").toString
    // guarantee cross-split near-dups: three corpus docs re-enter via the
    // increment under fresh %10==0 ids with identical text
    val aug = docs.select("doc_id", "text").unionByName(
      docs.where(col("doc_id") % 10 =!= 0).limit(3)
        .select((col("doc_id") * 10 + 1000000L).as("doc_id"), col("text")))
    val corpus = aug.where(col("doc_id") % 10 =!= 0)
    val inc = aug.where(col("doc_id") % 10 === 0)
    Dedup.writeMinhashLshTable(corpus, "doc_id", "text", path)
    val got = Dedup.incrementalNearDups(inc, "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // reference: the batch verified path over the full corpus, restricted to
    // cross (inc, corpus) pairs — orientation normalized to (inc, corpus)
    val batch = Dedup.minhashNearDupsVerified(aug, "doc_id", "text",
        jaccardThreshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .flatMap { case (a, b) =>
        if (a % 10 == 0 && b % 10 != 0) Some((a, b))
        else if (b % 10 == 0 && a % 10 != 0) Some((b, a))
        else None
      }.toSet
    got shouldBe batch
    got.size should be > 0
  }

  test("incremental dedup replay: probing the batch's own corpus copy emits no self-pairs") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-replay").toString
    val textA = "the quick brown fox jumps over the lazy dog again and again tonight"
    val textB = "unrelated text that matches nothing else in this corpus at all"
    val batch = Seq((2L, textA), (7L, textA), (13L, textB)).toDF("doc_id", "text")
    // simulate a streaming batch retried after its append landed but before
    // the offset commit: the batch is already IN the layout when re-probed
    Dedup.writeMinhashLshTable(batch, "doc_id", "text", path)
    val got = Dedup.incrementalNearDups(batch, "doc_id", "text", path)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // every doc collides with its replayed twin under the same id — the
    // meaningless (X, X) self-pairs are filtered in the probe join; the
    // genuine near-dup survives (both orientations: each side is an
    // increment doc probing the other's corpus copy)
    got shouldBe Set((2L, 7L), (7L, 2L))
  }

  test("LSH layout: an all-empty write never creates a poisoned _SUCCESS-only layout") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-emptylsh").toString + "/t"
    val textA = "the quick brown fox jumps over the lazy dog again and again tonight"
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    // an empty FIRST write must not leave a _SUCCESS-only directory: later
    // exists() would say yes and every read would fail schema inference —
    // one empty first micro-batch used to poison the stream permanently
    Dedup.writeMinhashLshTable(empty, "doc_id", "text", path)
    Dedup.lshTableExists(path) shouldBe false
    // a live layout accepts an empty append as a no-op
    Dedup.writeMinhashLshTable(Seq((1L, textA)).toDF("doc_id", "text"),
      "doc_id", "text", path)
    Dedup.appendMinhashLshTable(empty, "doc_id", "text", path)
    Dedup.lshTableExists(path) shouldBe true
    spark.read.parquet(path).count() shouldBe 8L // 1 doc x 8 bands
    // overwriting with an empty corpus REMOVES the layout (an empty corpus
    // has no layout) instead of leaving a poisoned or stale one
    Dedup.writeMinhashLshTable(empty, "doc_id", "text", path)
    Dedup.lshTableExists(path) shouldBe false
  }

  private def fn_len(c: org.apache.spark.sql.Column) = org.apache.spark.sql.functions.length(c)
}
