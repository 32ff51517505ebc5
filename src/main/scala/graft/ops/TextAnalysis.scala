package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * Column expressions (whole-stage codegen, shuffle-free, pushdown-friendly)
  * — no UDFs anywhere.
  */
object TextAnalysis {

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column =
    when(text.isNull || trim(text) === "", lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish token count: counts GPT-2-style pre-tokenizer matches
    * (contractions | letter runs | digit runs | punct runs). A good
    * length-estimate proxy when no tokenizer is available. */
  val bpeishPattern = "'(?:[sdmt]|ll|ve|re)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+"
  def tokenCountBpeish(text: Column): Column =
    when(text.isNull, lit(0)).otherwise(regexp_count(text, lit(bpeishPattern)))

  // --- language id (n-gram/stopword heuristic) -----------------------------

  /** Tiny per-language stopword signatures. */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "est", "dans", "que", "une"),
    "de" -> Seq("der", "die", "und", "das", "ist", "von", "mit", "den", "für", "nicht"),
    "pt" -> Seq("de", "que", "e", "do", "da", "em", "um", "para", "com", "não"))

  private def stopwordHits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit(words.mkString("\\b(", "|", ")\\b")))

  /** Best-scoring language code, or "und" when nothing matches.
    * Implemented as a fold over (score, lang) structs — argmax without any
    * shuffle or UDF. */
  def langId(text: Column): Column = {
    val scored = langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(stopwordHits(text, words).as("score"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*)) // struct ordering: by score, then lang
    when(text.isNull || best.getField("score") <= 0, lit("und"))
      .otherwise(best.getField("lang"))
  }

  // --- quality scoring ------------------------------------------------------

  /** Heuristic quality features (C4/Gopher-style): length, word stats,
    * punctuation/alpha ratios, stopword density. One projection. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    // NULL text scores as empty text: unguarded, NULL slips through
    // `when(trim(t) === "", 0)` (three-valued logic) into size(split(NULL)),
    // which is -1/NULL depending on ANSI mode — a negative word count in
    // downstream filters (tokenCountWs guards the same way)
    val t = coalesce(col(textCol), lit(""))
    val nChars = length(t)
    val words = split(trim(t), "\\s+")
    val nWords = when(trim(t) === "", 0).otherwise(size(words))
    df.withColumn("q_n_chars", nChars)
      .withColumn("q_n_words", nWords)
      .withColumn("q_mean_word_len",
        when(nWords > 0, nChars.cast("double") / nWords).otherwise(lit(0.0)))
      .withColumn("q_alpha_ratio",
        when(nChars > 0, regexp_count(t, lit("[\\p{L}]")).cast("double") / nChars)
          .otherwise(lit(0.0)))
      .withColumn("q_punct_ratio",
        when(nChars > 0, regexp_count(t, lit("[\\p{Punct}]")).cast("double") / nChars)
          .otherwise(lit(0.0)))
      .withColumn("q_stopword_ratio",
        when(nWords > 0, stopwordHits(t, langStopwords("en")).cast("double") / nWords)
          .otherwise(lit(0.0)))
      .withColumn("q_ends_with_punct",
        t.rlike("[.!?\"']\\s*$").cast("int"))
  }

  /** Scalar quality score in [0,1] from the features (monotone heuristics:
    * enough-but-not-degenerate length, mostly letters, some stopwords). */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val f = qualityFeatures(df, textCol)
    f.withColumn("quality_score",
      (least(col("q_n_words").cast("double") / 50.0, lit(1.0)) * 0.3 +
        col("q_alpha_ratio") * 0.3 +
        least(col("q_stopword_ratio") * 5.0, lit(1.0)) * 0.2 +
        (lit(1.0) - least(col("q_punct_ratio") * 4.0, lit(1.0))) * 0.1 +
        col("q_ends_with_punct").cast("double") * 0.1))
  }

  // --- URL / domain features ---------------------------------------------------

  /** Dialect-portable URL matcher (no lookaround/backreferences): scheme,
    * host, optional port, optional path. The host capture group is what
    * [[urlFeatures]] lowercases into domains. */
  val urlPattern = "https?://([A-Za-z0-9-]+(?:\\.[A-Za-z0-9-]+)+)(?::\\d+)?(?:/[^\\s]*)?"

  /** URL/domain signals for boilerplate + blocklist filtering: URL count,
    * the sorted distinct lowercased domain list, its size, and (when a
    * blocklist is given) whether any domain is blocklisted. One codegen'd
    * projection — extract-all plus array lambdas, no shuffle, no UDF; the
    * blocklist is a literal array (corpus-side curation lists are small;
    * a million-domain list belongs in a broadcast join instead). */
  def urlFeatures(df: DataFrame, textCol: String,
                  blocklist: Seq[String] = Nil): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val urls = regexp_extract_all(t, lit(urlPattern), lit(0))
    val domains = array_sort(array_distinct(
      transform(urls, u => lower(regexp_extract(u, urlPattern, 1)))))
    val base = df.withColumn("n_urls", size(urls))
      .withColumn("url_domains", domains)
      .withColumn("n_unique_domains", size(domains))
    if (blocklist.isEmpty) base.withColumn("url_blocked", lit(false))
    else base.withColumn("url_blocked", arrays_overlap(col("url_domains"),
      array(blocklist.map(d => lit(d.toLowerCase)): _*)))
  }

  // --- repetition signals ----------------------------------------------------

  /** Word-level repetition signals (the Gopher-repetition family, Rae et al.
    * 2021 §A1.1, recast at word granularity because transcript/corpus text
    * is often single-line): duplicate-word fraction, most-frequent-bigram
    * occurrence fraction, and adjacent-duplicate-word fraction ("the the",
    * "batch batch batch" stutter). High values flag degenerate/boilerplate
    * documents a quality filter should drop.
    *
    * All three are pure per-row array expressions over ONE split — a single
    * projection, no shuffle, nothing corpus-wide. The in-row top-bigram scan
    * is O(distinct·total) in the document's bigram count (document-bounded;
    * a 100k-word outlier costs that row alone, never an executor). */
  def repetitionFeatures(df: DataFrame, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val empty = array().cast("array<string>")
    df.withColumn("_words",
        when(trim(t) === "", empty).otherwise(split(trim(t), "\\s+")))
      .withColumn("r_n_words", size(col("_words")))
      .withColumn("r_dup_word_frac",
        when(col("r_n_words") > 0,
          lit(1.0) - size(array_distinct(col("_words"))).cast("double") / col("r_n_words"))
          .otherwise(lit(0.0)))
      .withColumn("_bigrams",
        when(col("r_n_words") >= 2,
          transform(sequence(lit(1), col("r_n_words") - 1), i =>
            concat(element_at(col("_words"), i), lit(" "),
              element_at(col("_words"), i + 1))))
          .otherwise(empty))
      .withColumn("r_top_bigram_frac",
        when(size(col("_bigrams")) > 0,
          array_max(transform(array_distinct(col("_bigrams")), b =>
            size(filter(col("_bigrams"), x => x === b)))).cast("double") /
            size(col("_bigrams")))
          .otherwise(lit(0.0)))
      .withColumn("r_adj_dup_frac",
        when(size(col("_bigrams")) > 0,
          size(filter(sequence(lit(1), col("r_n_words") - 1), i =>
            element_at(col("_words"), i) === element_at(col("_words"), i + 1)))
            .cast("double") / (col("r_n_words") - 1))
          .otherwise(lit(0.0)))
      .drop("_words", "_bigrams")
  }

  // --- fingerprinting -------------------------------------------------------

  /** Canonical text normalization: lowercase, trimmed, whitespace runs
    * collapsed. One regex pass — materialize it ONCE per row (its own
    * projected column) before any per-shingle/per-token work: an expression
    * captured inside a higher-order-function lambda is re-evaluated per
    * element in interpreted eval, turning O(len) normalizations into
    * O(len²). */
  def normalizeText(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** Exact-content fingerprint of normalized text — the key for exact
    * dedup. (Single reference to the normalization: one regex pass.) */
  def contentFingerprint(text: Column): Column =
    xxhash64(normalizeText(text))

  /** Character k-shingles of an ALREADY-NORMALIZED column. `norm` must be a
    * cheap expression (ideally a projected attribute — see
    * [[normalizeText]]): it is referenced inside the per-element lambda. */
  def shinglesOfNorm(norm: Column, k: Int = 8): Column =
    when(length(norm) < k, array(norm))
      .otherwise(transform(sequence(lit(1), length(norm) - (k - 1)),
        i => norm.substr(i, lit(k))))

  /** Convenience for tests/small data: normalize + shingle in one Column.
    * Cost warning: O(len) normalizations per row; at scale use
    * `withColumn("_norm", normalizeText(c))` + [[shinglesOfNorm]]. */
  def shingles(text: Column, k: Int = 8): Column =
    shinglesOfNorm(normalizeText(text), k)

  /** Staged (cost-safe) shingling: materializes `_norm` then `outCol`;
    * CollapseProject keeps the multi-referenced regex in its own projection,
    * so normalization runs once per row. */
  def withShingles(df: DataFrame, textCol: String, k: Int, outCol: String): DataFrame =
    df.withColumn("_norm", normalizeText(col(textCol)))
      .withColumn(outCol, shinglesOfNorm(col("_norm"), k))
      .drop("_norm")

  /** Rolling-hash document fingerprint over a shingle-array column: the
    * minimum shingle hash — a 1-hash MinHash, stable under small edits away
    * from the minimizing window. */
  def rollingFingerprintOfShingles(sh: Column): Column =
    rollingFingerprintOfShingles(sh, s => xxhash64(s))

  /** Hash-pluggable form of the rolling fingerprint: min over shingles of
    * `hash(shingle)`. xxhash64 is the production default (fast, codegen'd);
    * an order-preserving cross-engine hash (e.g. `md5`, hex string in both
    * Spark and DuckDB) makes the VALUES independently recomputable by the
    * correctness oracle. */
  def rollingFingerprintOfShingles(sh: Column, hash: Column => Column): Column =
    array_min(transform(sh, hash))

  def rollingFingerprint(df: DataFrame, textCol: String, k: Int = 8): DataFrame =
    withShingles(df, textCol, k, "_sh")
      .withColumn("fingerprint", rollingFingerprintOfShingles(col("_sh")))
      .drop("_sh")

  // --- vocabulary extraction -------------------------------------------------

  /** Tokenizer-prep vocabulary extraction: corpus-wide counts of normalized
    * whitespace tokens, with a frequency floor and a deterministic top-K
    * cut ordered by (count DESC, token ASC) — the input a BPE/WordPiece
    * trainer consumes.
    *
    * Scale shape: one codegen'd normalize + explode projection, then a
    * hash aggregation with map-side partial counts (the only shuffle moves
    * (token, partial-count) pairs, not text), and the top-K runs as
    * TakeOrderedAndProject — per-partition heaps of K, no global sort. The
    * tie-break on the token makes the kept SET a pure function of the
    * corpus, independent of partitioning. */
  def vocabulary(df: DataFrame, textCol: String,
                 minCount: Long = 2L, topK: Int = 1 << 16): DataFrame = {
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    require(topK >= 1, s"topK must be >= 1, got $topK")
    df.select(explode(split(normalizeText(
        coalesce(col(textCol).cast("string"), lit(""))), " ")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .where(col("n") >= minCount)
      .orderBy(col("n").desc, col("token").asc)
      .limit(topK)
  }
}
