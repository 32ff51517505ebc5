package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation operators for training-data pipelines: deterministic
  * stratified sampling, per-stratum token-budget packing, and benchmark
  * decontamination. Like the rest of `graft.ops`, everything is declarative
  * DataFrame/Column work — codegen'd projections and filters, window
  * aggregation only where the semantics genuinely need per-stratum state,
  * broadcast semi-joins for small reference sets — so each operator keeps
  * its one-scan / minimal-shuffle shape at 100 TB.
  */
object Curation {

  // --- deterministic stratified sampling ------------------------------------

  /** A uniform double in [0, 1) derived from the top 52 bits of md5(key) —
    * the hash-pluggable, cross-engine-recomputable form (13 hex chars = 52
    * bits, exactly representable in an IEEE double; DuckDB reproduces it
    * bit-for-bit with `('0x' || substring(md5(k), 1, 13))::uint64 / 2^52`).
    */
  def uniform01Md5(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 13), 16, 10).cast("double") /
      lit(4503599627370496.0) // 2^52

  /** Production form: xxhash64 (codegen'd, no string materialization).
    * Spark-only values, same distribution; use [[uniform01Md5]] when an
    * external engine must recompute the sample. */
  def uniform01Xx(key: Column, seed: Int = 42): Column =
    (pmod(xxhash64(key, lit(seed)), lit(1L << 52)).cast("double")) /
      lit(4503599627370496.0)

  /** Deterministic per-stratum Bernoulli sample: keep a row iff
    * `u01(idCol) < fraction(stratum)`. Unlike `df.sample`/`sampleBy`, the
    * decision is a pure function of the row's id — re-runs, retries and
    * incremental appends select the SAME rows (the property a reproducible
    * training-data pipeline actually needs), and the plan is a shuffle-free
    * codegen'd filter that pushes NOTHING to the driver.
    *
    * `fractions` maps stratum value → keep fraction; strata absent from the
    * map keep `defaultFraction` (0.0 = drop). */
  def hashSample(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double], defaultFraction: Double = 0.0,
                 u01: Column => Column = uniform01Md5): DataFrame = {
    val frac = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, f)) =>
      when(col(stratumCol) === k, lit(f)).otherwise(acc)
    }
    df.where(u01(col(idCol)) < frac)
  }

  // --- deterministic corpus shuffle → training shards ------------------------

  /** Deterministic global corpus shuffle into training shards — the "shuffle
    * the corpus once before training" step, without the global sort.
    *
    * Every row gets a pure-function shuffle key `u01(seed | id)`; its shard
    * is `floor(key · numShards)` and its dense position WITHIN the shard is
    * the rank by (key, id). Reading shards 0..numShards-1 each in shard_pos
    * order replays one fixed uniformly-shuffled permutation of the corpus —
    * re-runs, retries and a different Spark partitioning all reproduce it
    * bit-for-bit (the key is a function of the row, not of RNG state).
    *
    * Scale shape: NO global sort and no single-partition window — one hash
    * exchange on `shard` (u01 is uniform, so shards are balanced within
    * sampling noise regardless of id skew) and a spillable in-partition
    * sort for the rank. At 10^12 rows pick numShards >> cores so each
    * shard's sort fits an executor; the per-shard output is exactly the
    * file a training loader consumes.
    *
    * Adds `shuffle_key` (double), `shard` (int), `shard_pos` (long, 1-based
    * within shard). Ids must be unique or the (key, id) order — and thus
    * shard_pos — is nondeterministic between equal rows. */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
                    seed: String = "",
                    u01: Column => Column = uniform01Md5): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("shuffle_key"), col(idCol))
    df.withColumn("shuffle_key",
        u01(concat(lit(seed), lit("|"), col(idCol).cast("string"))))
      // u01 < 1 strictly, but key*N can round UP to N at the top of the
      // range in IEEE space — clamp so the last shard absorbs the edge
      .withColumn("shard",
        least(floor(col("shuffle_key") * numShards), lit(numShards - 1L)).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  // --- quality filter cascade ---------------------------------------------------

  /** Quality filter cascade with reason codes (the FineWeb/C4-style keep/drop
    * gate): rules apply IN ORDER and a dropped row reports the FIRST rule it
    * failed, so downstream ablation can attribute removal volume per rule.
    * A rule whose predicate evaluates NULL (e.g. a signal over NULL text)
    * fails that rule — filters are fail-closed.
    *
    * Adds `drop_reason` (first failing rule name, NULL when kept) and
    * `keep`. One codegen'd projection — no shuffle, no UDF — so the cascade
    * fuses with the scan and with the signal projections feeding it. */
  def filterCascade(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "filterCascade needs at least one rule")
    val reason = rules.foldRight(lit(null).cast("string")) {
      case ((name, pred), later) =>
        when(!coalesce(pred, lit(false)), lit(name)).otherwise(later)
    }
    df.withColumn("drop_reason", reason)
      .withColumn("keep", col("drop_reason").isNull)
  }

  // --- per-stratum token-budget packing --------------------------------------

  /** Greedy token-budget packing: within each stratum, rank rows by the
    * given priority order and keep the maximal prefix whose RUNNING token
    * sum stays within the stratum's budget (classic data-mixing step:
    * "fill N tokens of French from highest-quality down").
    *
    * One hash-partition shuffle on the stratum key, then a spillable
    * window cumsum — per-stratum state is a single running sum, so a
    * billion-row stratum costs sort-spill, never memory. The priority
    * order MUST be total (tie-break on a unique id) or the kept set is
    * nondeterministic under re-partitioning.
    *
    * Returns the kept rows plus `cum_tokens` (running sum including the
    * row itself). */
  def budgetPack(df: DataFrame, stratumCol: String, tokensCol: Column,
                 priority: Seq[Column], budgetByStratum: Map[String, Long],
                 defaultBudget: Long = 0L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(priority: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val budget = budgetByStratum.foldLeft(lit(defaultBudget)) { case (acc, (k, b)) =>
      when(col(stratumCol) === k, lit(b)).otherwise(acc)
    }
    df.withColumn("cum_tokens", sum(tokensCol).over(w))
      .where(col("cum_tokens") <= budget)
  }

  // --- training-sequence packing ----------------------------------------------

  /** Concat-and-chunk sequence packing (the Megatron/GPT pretraining shape):
    * within each stratum, documents are laid out end-to-end in the given
    * priority order and cut into fixed `seqLen`-token training sequences;
    * documents straddle sequence boundaries, so no token is wasted.
    *
    * Emits one row per (document, sequence) overlap: `seq_id` (0-based
    * within the stratum), `seq_off` (offset of the document's first token
    * inside that sequence) and `n_tok_in_seq` (tokens the document
    * contributes to it). A document spanning k sequences emits k rows —
    * fan-out is ceil(tokens/seqLen)+1, document-bounded, never corpus-wide.
    *
    * Scale shape: one hash-partition shuffle on the stratum key, a
    * spillable window cumsum (per-stratum state = one running Long), then a
    * codegen'd bounded explode. All offset arithmetic is exact Long-space
    * integer division — no doubles anywhere, so a petatoken stratum cannot
    * drift. The order MUST be total (tie-break on a unique id) or chunk
    * assignment is nondeterministic under re-partitioning. Zero-token rows
    * contribute nothing and are dropped. */
  def packChunks(df: DataFrame, stratumCol: String, tokensCol: Column,
                 order: Seq[Column], seqLen: Long): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(order: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    df.withColumn("_ntok", greatest(coalesce(tokensCol.cast("long"), lit(0L)), lit(0L)))
      .withColumn("_end", sum(col("_ntok")).over(w))
      .where(col("_ntok") > 0)
      .withColumn("_begin", col("_end") - col("_ntok"))
      .withColumn("seq_id", explode(sequence(
        expr(s"_begin div ${seqLen}L"), expr(s"(_end - 1L) div ${seqLen}L"))))
      .withColumn("seq_off",
        greatest(col("_begin") - col("seq_id") * seqLen, lit(0L)))
      .withColumn("n_tok_in_seq",
        least(col("_end"), (col("seq_id") + 1L) * seqLen) -
          greatest(col("_begin"), col("seq_id") * seqLen))
      .drop("_ntok", "_begin", "_end")
  }

  // --- PII redaction -----------------------------------------------------------

  /** Default PII patterns: (name, regex, replacement). The regexes are
    * deliberately dialect-portable — no backreferences, no lookaround —
    * so an RE2-based engine recomputes the identical redaction, and both
    * engines' leftmost-match semantics agree on every span. */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Redact PII spans and count matches per category — the scrubbing pass a
    * corpus runs before anything else sees the text. One codegen'd
    * projection (a regexp_replace chain plus regexp_extract_all counts):
    * no shuffle, no UDF, safe to fuse with the scan.
    *
    * Patterns apply IN ORDER to the running text, and each `n_<name>` is
    * measured on the text that pattern actually saw — so a span consumed
    * by an earlier category is never double-counted by a later one.
    * Output: `outCol` (default `text_redacted`) plus one `n_<name>` count
    * per pattern. */
  def redactPii(df: DataFrame, textCol: String,
                patterns: Seq[(String, String, String)] = piiPatterns,
                outCol: String = "text_redacted"): DataFrame = {
    val start = df.withColumn(outCol, coalesce(col(textCol).cast("string"), lit("")))
    patterns.foldLeft(start) { case (acc, (name, re, repl)) =>
      acc.withColumn(s"n_$name", size(regexp_extract_all(col(outCol), lit(re), lit(0))))
        .withColumn(outCol, regexp_replace(col(outCol), lit(re), lit(repl)))
    }
  }

  // --- corpus-level boilerplate line removal -----------------------------------

  /** Corpus-level boilerplate line removal (the C4/RefinedWeb cleanup step):
    * a line whose trimmed form occurs in at least `minDocs` DISTINCT
    * documents is boilerplate (cookie banners, nav bars, license footers) —
    * every occurrence is removed, and each document's surviving lines are
    * re-assembled in their original order. Whitespace-only lines are never
    * counted (they'd be degenerate "boilerplate") and are always kept.
    *
    * Shape for 100 TB: two shuffles plus one join.
    *   1. line-frequency agg — posexplode + partial/final countDistinct on
    *      the trimmed line; state per key is one HLL-free exact counter
    *      (partial agg halves the exchange), output is ≤ total_lines/minDocs
    *      rows, tiny for any honest threshold.
    *   2. mark join — lines ⟕ boilerplate keys; the boilerplate side is
    *      orders of magnitude smaller than the corpus, so AQE picks a
    *      broadcast hash join at any realistic threshold (falls back to a
    *      shuffle join gracefully if an adversarial threshold inflates it —
    *      never a driver collect).
    *   3. per-document regroup — sort_array(collect_list(...)) keyed by the
    *      DOCUMENT id. Unlike a per-conversation collect, this buffer is
    *      bounded by the source ROW itself (a document's own lines), so no
    *      hot key can exceed the max row size already flowing through the
    *      scan — skew-safe by construction.
    *
    * Returns one row per input document: idCol, `outCol` (cleaned text,
    * empty string when everything was boilerplate or the text was NULL) and
    * `n_lines_removed`. No document is ever dropped. */
  def removeBoilerplateLines(df: DataFrame, idCol: String, textCol: String,
                             minDocs: Long, outCol: String = "text_clean"): DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol),
        posexplode(split(coalesce(col(textCol).cast("string"), lit("")), "\n"))
          .as(Seq("_pos", "_line")))
      .withColumn("_key", trim(col("_line")))
    val boiler = lines.where(col("_key") =!= "")
      .groupBy("_key").agg(countDistinct(col(idCol)).as("_ndocs"))
      .where(col("_ndocs") >= minDocs)
      .select(col("_key"), lit(true).as("_bl"))
    lines.join(boiler, Seq("_key"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(when(col("_bl"), 1L).otherwise(0L)).as("n_lines_removed"),
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("_bl").isNull,
            struct(col("_pos"), col("_line"))))),
          x => x.getField("_line"))).as(outCol))
  }

  // --- benchmark decontamination ---------------------------------------------

  /** Benchmark decontamination: flag every corpus document sharing at least
    * one character k-shingle with any document of a (small) evaluation set —
    * the standard guard against test-set leakage into training data.
    *
    * Shape for 100 TB: the eval side is benchmarks (thousands of docs, not
    * billions) — its DISTINCT shingle set is computed once and broadcast,
    * so the corpus side is ONE scan with a codegen'd shingle projection and
    * a broadcast semi-join; the only aggregation keyed by corpus doc runs
    * AFTER the join, over matched shingles only (a tiny fraction of the
    * corpus). No corpus-wide shuffle exists.
    *
    * Returns (idCol, n_shared) — contaminated docs with their distinct
    * shared-shingle counts. */
  def decontaminate(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                    textCol: String, k: Int = 13): DataFrame = {
    val evalShingles = shingleFrame(evalSet, textCol, k).select("_sh").distinct()
    // The broadcast side carries (hash, shingle); the corpus scan emits
    // per-position HASHES only (native one-pass expression — no per-shingle
    // string allocation, guide §2.3/§4) and joins on the 64-bit key. The
    // string shingle is re-materialized ONLY for hash matches — a substr of
    // the row's own norm — and the string equality filter strips hash
    // collisions, so the output is bit-identical to the string join.
    val evalKeyed = evalShingles.select(col("_sh"), xxhash64(col("_sh")).as("_h"))
    shingleHashFrame(corpus, textCol, k, col(idCol))
      .join(broadcast(evalKeyed), Seq("_h"))
      .where(col("_norm").substr(col("_p") + 1, lit(k)) === col("_sh"))
      .groupBy(idCol)
      .agg(countDistinct(col("_sh")).as("n_shared"))
  }

  private def shingleFrame(df: DataFrame, textCol: String, k: Int,
                           keep: Column*): DataFrame =
    df.withColumn("_norm", TextAnalysis.normalizeText(col(textCol)))
      .select(keep :+ explode(TextAnalysis.shinglesOfNorm(col("_norm"), k)).as("_sh"): _*)

  /** Per-position shingle HASHES `(keep…, _norm, _p, _h)` — the probe-side
    * form of [[shingleFrame]]: `_h` equals `xxhash64` of the corresponding
    * `_sh` string (same bytes, native one-pass expression), `_p` is the
    * 0-based code-point position so a match can re-materialize its string
    * as `substr(_norm, _p + 1, k)`. Nothing per-shingle is allocated for
    * positions the downstream hash probe rejects. */
  private def shingleHashFrame(df: DataFrame, textCol: String, k: Int,
                               keep: Column*): DataFrame =
    df.withColumn("_norm", TextAnalysis.normalizeText(col(textCol)))
      .select(keep :+ col("_norm") :+
        posexplode(graft.functions.ShingleHashesExpr.shingleHashes(col("_norm"), k))
          .as(Seq("_p", "_h")): _*)

  /** Benchmark decontamination for eval sets too LARGE to broadcast exactly —
    * the 100 TB growth path of [[decontaminate]], with IDENTICAL output.
    *
    * Three phases:
    *   1. ONE Bloom filter over the eval side's distinct shingle hashes,
    *      built with Spark's own `BloomFilterAggregate` — the sketch
    *      machinery Catalyst's InjectRuntimeFilter uses for runtime join
    *      pruning — and collected to the driver. This is a fixed-size
    *      SKETCH (numBits/8 bytes), not data: the same small-by-construction
    *      class as the IVF centroid collect, and it broadcasts with the plan
    *      as a binary literal where a billion-shingle exact set cannot.
    *   2. The corpus scan probes the sketch in place:
    *      `might_contain(sketch, xxhash64(shingle))` is a codegen'd
    *      predicate fused with the shingle explode, so the (overwhelming)
    *      majority of corpus shingles that miss pay one 64-bit hash and NO
    *      join at all.
    *   3. Only the surviving candidate shingles join the exact eval set to
    *      remove Bloom false positives — a shuffle of the tiny candidate
    *      subset, never the corpus (AQE still picks broadcast when the eval
    *      side happens to be small).
    *
    * Sizing: numBits is the textbook optimum `-n·ln(fpp)/ln²2` for the
    * measured distinct-shingle count, subject to Spark's
    * `spark.sql.optimizer.runtime.bloomFilter.maxNumBits` cap — raise that
    * conf for billion-shingle eval sets. An undersized filter only raises
    * the false-positive rate (more phase-3 work); the output never changes.
    * An EMPTY eval set yields a null sketch, `might_contain` evaluates null,
    * and the result is correctly empty. */
  def decontaminateBloom(corpus: DataFrame, evalSet: DataFrame, idCol: String,
                         textCol: String, k: Int = 13,
                         fpp: Double = 0.01): DataFrame = {
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    import org.apache.spark.sql.GraftSqlBridge.{column, expression}
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.types.BinaryType
    // Pinned: the distinct eval-shingle set is read three times (the sizing
    // count, the sketch aggregation, the phase-3 exact join) — without the
    // persist each read would re-run the eval scan + shingle explode + the
    // distinct's full shuffle, tripling exactly the work this growth path
    // exists to bound. MEMORY_AND_DISK so a billion-shingle eval set spills
    // rather than OOMs; the blocks are released by Spark's ContextCleaner
    // when the returned frame's lineage is dropped.
    val evalShingles = shingleFrame(evalSet, textCol, k).select("_sh").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // one tiny job to size the sketch: n is the count being sketched anyway
    // (and it materializes the cache the two later reads hit)
    val n = math.max(evalShingles.count(), 1L)
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2.0) * math.log(2.0))).toLong)
    val agg = new BloomFilterAggregate(expression(xxhash64(col("_sh"))),
      Literal(n), Literal(numBits)).toAggregateExpression()
    val sketch = evalShingles.select(column(agg).as("_bf"))
      .head().getAs[Array[Byte]](0) // one row: the serialized sketch
    // The corpus scan emits per-position HASHES (native one-pass expression
    // — no per-shingle string allocation) and probes the sketch on the
    // 64-bit key directly: identical probe values to might_contain(
    // xxhash64(_sh)) since _h hashes the same bytes. Only surviving
    // candidates re-materialize their string (substr of the row's own norm)
    // for the exact phase-3 join, so the overwhelming majority of corpus
    // shingles pay one hash and one bloom probe — and nothing else.
    val probe = column(new BloomFilterMightContain(
      Literal(sketch, BinaryType), expression(col("_h"))))
    shingleHashFrame(corpus, textCol, k, col(idCol))
      .where(probe)                 // phase 2: codegen'd in-scan prefilter
      .select(col(idCol), col("_norm").substr(col("_p") + 1, lit(k)).as("_sh"))
      .join(evalShingles, "_sh")    // phase 3: exact verify, candidates only
      .groupBy(idCol)
      .agg(countDistinct(col("_sh")).as("n_shared"))
  }
}
