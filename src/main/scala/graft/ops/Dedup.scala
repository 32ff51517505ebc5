package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Column

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every variant reduces to (1) a shuffle-free projection
  * computing a signature, (2) ONE shuffle on the signature (groupBy or
  * band-bucket join), (3) verification confined to candidate buckets. No
  * all-pairs work ever leaves a bucket, so cost is O(rows) + O(Σ bucket²)
  * with banding tuned to keep buckets tiny at 100 TB.
  */
object Dedup {

  /** Exact dedup on normalized content hash: one hash-aggregate shuffle.
    * Returns the surviving rows (min id per content group). */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val fp = TextAnalysis.contentFingerprint(col(textCol))
    df.withColumn("_fp", fp)
      .groupBy(col("_fp"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("dup_count"))
      .drop("_fp")
  }

  /** Exact duplicate *groups* (for auditing): content hash → ids.
    *
    * `dup_count` is always the FULL group multiplicity; `ids` carries the
    * `maxIds` smallest member ids. Bounding matters at scale: a corpus with
    * one degenerate value (empty text, boilerplate) can put 10⁹ rows in a
    * single group, and an unbounded `collect_list` would buffer them all in
    * one in-memory aggregation buffer (a single group's ArrayBuffer never
    * spills) → executor OOM. Instead, ids are ranked with `row_number` over
    * a window (WindowExec buffers per-group rows in a SPILLABLE
    * ExternalAppendOnlyUnsafeRowArray) and only ranks ≤ maxIds enter the
    * collect — `collect_list` skips the NULLs the `when` leaves for the
    * rest. The groupBy reuses the window's hash partitioning on `_fp`, so
    * this still costs exactly ONE shuffle (asserted in PlanSpec). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String,
                  maxIds: Int = 1024): DataFrame = {
    require(maxIds >= 2, s"maxIds must be >= 2, got $maxIds")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_fp")).orderBy(col(idCol))
    df.withColumn("_fp", TextAnalysis.contentFingerprint(col(textCol)))
      .withColumn("_rn", row_number().over(w))
      .groupBy("_fp")
      .agg(count(lit(1)).as("dup_count"),
        sort_array(collect_list(when(col("_rn") <= maxIds, col(idCol)))).as("ids"))
      .where(col("dup_count") > 1)
  }

  // --- MinHash + LSH ---------------------------------------------------------

  /** MinHash signature over a SHINGLE-ARRAY column: H independent hashes,
    * each the min over shingles of xxhash64(shingle, h).
    *
    * Single `aggregate` pass referencing the shingle array exactly once —
    * a formulation like transform(0..H, h => array_min(transform(sh, ...)))
    * would re-evaluate `sh` (and anything captured in it) H times per row
    * in interpreted HOF eval. */
  def minhashSignatureOfShingles(sh: Column, numHashes: Int = 32): Column =
    // family member h = xxhash64(shingle, h) — Spark chains multi-arg
    // xxhash64 as hashLong(h, seed = hashBytes(shingle, 42)), so the native
    // MinHashExpr reproduces it with ONE bytes-hash per shingle.
    aggregate(sh,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, s) => zip_with(acc, sequence(lit(0L), lit(numHashes - 1L)),
        (m, h) => least(m, xxhash64(s, h))))

  /** Staged DataFrame form: id, sig. Uses the native codegen'd
    * [[graft.functions.MinHashExpr]] — one pass over the normalized bytes,
    * no shingle-array materialization; bit-identical to the HOF
    * formulation (asserted in OpsSpec). */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        numHashes: Int = 32, shingleK: Int = 8): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.normalizeText(col(textCol)).as("_norm"))
      .select(col("id"),
        graft.functions.MinHashExpr.minhash(col("_norm"), shingleK, numHashes).as("sig"))

  /** HOF reference implementation of the signature (oracle for the native
    * expression; also usable where a pure-builtin plan is preferred). */
  def minhashSignaturesHof(df: DataFrame, idCol: String, textCol: String,
                           numHashes: Int = 32, shingleK: Int = 8): DataFrame =
    TextAnalysis.withShingles(
        df.select(col(idCol).as("id"), col(textCol).as("_text")), "_text", shingleK, "_sh")
      .select(col("id"), minhashSignatureOfShingles(col("_sh"), numHashes).as("sig"))

  /** rows-per-band with the misconfiguration guard. Unchecked integer
    * division here is a SILENT-EMPTY-OUTPUT bug: bands > numHashes gives
    * rowsPerBand = 0, every document then shares every (empty-slice) band
    * key, and capBuckets drops the over-full buckets — the dedup reports
    * ZERO pairs while exact duplicates sail through. A non-divisor would
    * silently ignore trailing signature components. */
  private def bandRows(numHashes: Int, bands: Int): Int = {
    require(bands > 0 && numHashes % bands == 0,
      s"bands ($bands) must be a positive divisor of numHashes ($numHashes)")
    numHashes / bands
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`
    * and emit (band_idx, band_hash) keys. Docs sharing any band key are
    * candidates. */
  def lshBandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)).cast("string")).as("bh")))

  /** Candidate near-duplicate pairs via MinHash LSH, verified with the
    * estimated Jaccard (fraction of agreeing minhash components).
    *
    * One explode (narrow) + one shuffle on band keys + per-bucket self-join.
    * At 100 TB: tune bands/rows so expected bucket size stays O(1..100); the
    * groupBy carries only (key, id, signature).
    */
  def minhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 32, bands: Int = 8,
                      jaccardThreshold: Double = 0.7,
                      shingleK: Int = 8,
                      maxBucketSize: Int = 256): DataFrame =
    estCandidates(
      minhashSignatures(df, idCol, textCol, numHashes, shingleK)
        .where(col("sig").isNotNull),
      numHashes, bands, jaccardThreshold, maxBucketSize)

  /** Banded LSH candidate pairs from a (id, sig) frame, filtered by the
    * estimated Jaccard (fraction of agreeing minhash components). One
    * explode (narrow) + one shuffle on band keys + per-bucket self-join. */
  private def estCandidates(sigd: DataFrame, numHashes: Int, bands: Int,
                            jaccardThreshold: Double, maxBucketSize: Int): DataFrame = {
    val rowsPerBand = bandRows(numHashes, bands)
    val banded0 = sigd.select(col("id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("bk.band").as("band"), col("bk.bh").as("bh"), col("id"), col("sig"))
    val banded = capBuckets(banded0, Seq("band", "bh"), maxBucketSize)
    // bucket self-join; a.id < b.id orders each pair once
    val a = banded.as("a"); val bSide = banded.as("b")
    val pairs = a.join(bSide,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (aggregate(zip_with(col("a.sig"), col("b.sig"),
            (x, y) => when(x === y, 1).otherwise(0)),
            lit(0), (acc, v) => acc + v).cast("double") / numHashes).as("est_jaccard"))
    pairs.where(col("est_jaccard") >= jaccardThreshold)
      .dropDuplicates("id_a", "id_b")
  }

  /** The one-scan substrate every MinHash operation shares: `(id, norm,
    * sig)` — normalized text plus the signature. Probe, self-join,
    * verification and layout append all derive from this frame; computing
    * it ONCE per increment (pin with a lazy localCheckpoint) halves the
    * normalize+minhash cost of a probe-then-append cycle, which at corpus
    * scale is the dominant per-increment compute. */
  def minhashBase(df: DataFrame, idCol: String, textCol: String,
                  numHashes: Int = 32, shingleK: Int = 8): DataFrame =
    df.select(col(idCol).as("id"),
        TextAnalysis.normalizeText(col(textCol)).as("norm"))
      .withColumn("sig",
        graft.functions.MinHashExpr.minhash(col("norm"), shingleK, numHashes))

  /** MinHash-LSH candidates verified with EXACT shingle-set Jaccard: the
    * output is precisely the pairs with true Jaccard >= `jaccardThreshold`
    * among band-colliding candidates (estimate used only as a cheap pruning
    * filter at half the threshold). With banding tuned for recall at the
    * threshold this equals the exact near-dup pair set — independently
    * checkable in SQL — while doing O(candidates) verification work
    * instead of all pairs.
    *
    * COVERAGE BOUNDS (not silent): (1) banding recall — at bands=8/rows=4 a
    * pair at exactly J=0.5 collides with p≈0.4 but a near-dup at J>=0.9
    * with p≈0.9998; choose bands for the corpus's similarity gap (the
    * driver corpus is bimodal: >=0.9 or <0.2). (2) `maxBucketSize` drops
    * over-full band buckets before the self-join — clusters with more than
    * `maxBucketSize` near-identical members lose pairs; audit with
    * [[overfullBuckets]] or raise the cap when exactness matters more than
    * the O(bucket²) join cost. */
  def minhashNearDupsVerified(df: DataFrame, idCol: String, textCol: String,
                              numHashes: Int = 32, bands: Int = 8,
                              jaccardThreshold: Double = 0.5,
                              shingleK: Int = 8,
                              maxBucketSize: Int = 256): DataFrame =
    minhashNearDupsVerifiedFromBase(
      minhashBase(df, idCol, textCol, numHashes, shingleK).localCheckpoint(false),
      numHashes, bands, jaccardThreshold, shingleK, maxBucketSize)

  /** [[minhashNearDupsVerified]] over a precomputed [[minhashBase]] frame
    * (pin it with persist/localCheckpoint so the signature pass runs once
    * even though the candidate join and verification both read it). */
  def minhashNearDupsVerifiedFromBase(base: DataFrame,
                                      numHashes: Int = 32, bands: Int = 8,
                                      jaccardThreshold: Double = 0.5,
                                      shingleK: Int = 8,
                                      maxBucketSize: Int = 256): DataFrame = {
    // SINGLE corpus scan: (id, norm, sig) is projected once and pinned by
    // the caller; the banded candidate join and the verification shingles
    // all derive from the pinned blocks — the corpus parquet is never read
    // twice (round-2's second full text scan). Shingle sets — the
    // expensive O(len) array per doc — are computed ONLY for documents
    // that appear in a candidate pair (broadcast semi-join on the
    // candidate id set), so verification cost is O(candidates), not
    // O(corpus). The banding explode still carries only (id, sig).
    val sigd = base.select(col("id"), col("sig")).where(col("sig").isNotNull)
    val cands = estCandidates(sigd, numHashes, bands,
        jaccardThreshold = jaccardThreshold / 2, maxBucketSize)
      .select(col("id_a"), col("id_b"))
      // small; reused for the id set and the final join. localCheckpoint
      // (not persist) is deliberate for these one-shot batch frames: the
      // blocks are freed by the ContextCleaner when the frame is GC'd,
      // with no unpersist hook needed — whereas long-lived repeating
      // callers (StreamingDedup's per-batch base) persist + unpersist so
      // release is deterministic per batch, not GC-paced.
      .localCheckpoint(false)
    val candIds = cands.select(col("id_a").as("id"))
      .unionAll(cands.select(col("id_b").as("id"))).distinct()
    val sh = base.join(broadcast(candIds), "id")
      .select(col("id"),
        array_distinct(TextAnalysis.shinglesOfNorm(col("norm"), shingleK)).as("_sh"))
    cands
      .join(sh.select(col("id").as("id_a"), col("_sh").as("_sa")), "id_a")
      .join(sh.select(col("id").as("id_b"), col("_sh").as("_sb")), "id_b")
      .where(size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
        size(array_union(col("_sa"), col("_sb"))).cast("double") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
  }

  // --- incremental dedup against a persisted signature table -----------------

  /** Persist a corpus's MinHash-LSH banded layout, Hive-partitioned by
    * (band, bhp) where `bhp` is a 6-bit band-hash prefix — the production
    * append-only dedup shape: signatures, band keys and the normalized text
    * needed for exact verification are written ONCE; each increment then
    * probes only the directories matching its own band keys instead of
    * rescanning (or re-hashing) the corpus.
    *
    * `prefixBuckets` sizes the directory fan-out: bands × prefixBuckets
    * directories total. It is a pure layout knob — `bhp = bh mod buckets`
    * carries no semantics, so any value yields identical pairs — and should
    * be sized so each directory holds well-sized files: 64 (the default)
    * keeps per-directory file counts sane at 100 TB while still pruning
    * ~98% of the layout for a small increment; a small corpus wants fewer
    * (each parquet file costs ~3ms to open and ~6ms to create regardless of
    * size, so a 512-directory layout over 40k rows spends seconds on pure
    * per-file overhead). Probe and append must use the layout's value. */
  def writeMinhashLshTable(df: DataFrame, idCol: String, textCol: String,
                           path: String, numHashes: Int = 32, bands: Int = 8,
                           shingleK: Int = 8, prefixBuckets: Int = 64): Unit =
    writeMinhashLshTableMode(df, idCol, textCol, path, "overwrite",
      numHashes, bands, shingleK, prefixBuckets)

  /** Append an increment's banded signatures INTO an existing layout — the
    * append-only step after [[incrementalNearDups]] has probed it, so later
    * increments dedup against this one without any corpus rebuild.
    * `prefixBuckets` must match the value the layout was written with. */
  def appendMinhashLshTable(df: DataFrame, idCol: String, textCol: String,
                            path: String, numHashes: Int = 32, bands: Int = 8,
                            shingleK: Int = 8, prefixBuckets: Int = 64): Unit =
    writeMinhashLshTableMode(df, idCol, textCol, path, "append",
      numHashes, bands, shingleK, prefixBuckets)

  /** Does a layout exist at `path` (written by [[writeMinhashLshTable]])?
    * Resolved through the Hadoop FileSystem API: a java.io.File probe is
    * always false for hdfs://, s3a://, … paths — the production shape —
    * and would silently make every streaming batch take the no-corpus
    * branch (never probing, so cross-batch duplicates pass unseen). */
  def lshTableExists(path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val conf = org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()
    p.getFileSystem(conf).exists(p)
  }

  /** Append a precomputed [[minhashBase]] frame into an existing layout —
    * the signature-sharing form of [[appendMinhashLshTable]] for callers
    * (e.g. streaming probe-then-append) that already hold the base. */
  def appendMinhashLshTableFromBase(base: DataFrame, path: String,
                                    numHashes: Int = 32, bands: Int = 8,
                                    prefixBuckets: Int = 64): Unit =
    writeBandedFromBase(base, path, "append", numHashes, bands, prefixBuckets)

  private def writeMinhashLshTableMode(df: DataFrame, idCol: String, textCol: String,
                                       path: String, mode: String,
                                       numHashes: Int, bands: Int,
                                       shingleK: Int, prefixBuckets: Int): Unit =
    writeBandedFromBase(minhashBase(df, idCol, textCol, numHashes, shingleK),
      path, mode, numHashes, bands, prefixBuckets)

  private def writeBandedFromBase(base: DataFrame, path: String, mode: String,
                                  numHashes: Int, bands: Int,
                                  prefixBuckets: Int): Unit = {
    val rowsPerBand = bandRows(numHashes, bands)
    // An all-empty write would create a _SUCCESS-only directory: every
    // later [[lshTableExists]] says yes, every later read throws ("unable
    // to infer schema") — one empty first micro-batch permanently poisons
    // the stream. Skip the write instead, and honor overwrite semantics by
    // deleting whatever is at the path (an empty corpus HAS no layout;
    // keyed on raw directory existence, not _SUCCESS, so the part files of
    // a previously INTERRUPTED write can't resurface under a later
    // append's _SUCCESS). The emptiness probe is an extra take(1) job, so
    // it runs only where the poison can arise — never on the hot path of
    // appending to an already-live layout.
    if (mode == "overwrite" || !lshTableExists(path)) {
      if (base.where(col("sig").isNotNull).isEmpty) {
        if (mode == "overwrite") {
          val p = new org.apache.hadoop.fs.Path(path)
          val fs = p.getFileSystem(base.sparkSession.sessionState.newHadoopConf())
          if (fs.exists(p)) fs.delete(p, true)
        }
        return
      }
    }
    base
      .where(col("sig").isNotNull)
      .select(col("id"), col("sig"), col("norm"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("norm"),
        col("bk.band").as("band"), col("bk.bh").as("bh"))
      .withColumn("bhp", pmod(col("bh"), lit(prefixBuckets)).cast("int"))
      // cluster rows of one (band, bhp) directory into one writer task:
      // without this every input task writes a sliver into every directory
      // (bands×buckets×tasks small files — the classic partitioned-write
      // explosion); with it each directory holds O(1) well-sized files.
      // The partition count is EXPLICIT: a keyed repartition() without one
      // is an AQE coalesce target, and on a small append AQE collapses it
      // to a single task that then creates all bands×buckets directory
      // files serially (~4-6s of pure file-open overhead); pinning the
      // count keeps the writers parallel at every scale.
      .repartition(base.sparkSession.sessionState.conf.numShufflePartitions,
        col("band"), col("bhp"))
      .write.mode(mode).partitionBy("band", "bhp").parquet(path)
  }

  /** Near-dup pairs of an INCREMENT against a persisted corpus LSH table —
    * without rescanning the corpus. The increment's band keys are computed
    * in one projection; its distinct (band, bhp) prefix set (≤
    * bands×prefixBuckets values, collected driver-side — tiny by
    * construction, this is the
    * probe's partition-pruning predicate, not data) restricts the corpus
    * read to matching directories (PartitionFilters asserted in PlanSpec).
    * Candidates join on the exact (band, bh) key, est-Jaccard prunes at
    * half the threshold, exact shingle-Jaccard verifies — same coverage
    * bounds as [[minhashNearDupsVerified]] (banding recall at the corpus's
    * similarity gap; `maxBucketSize` caps the CORPUS side of a band bucket,
    * auditable via [[overfullBuckets]] on the table).
    *
    * Output: (id_a = increment id, id_b = corpus id, true J >= threshold);
    * with `includeWithinIncrement` also (id_a < id_b) pairs WITHIN the
    * increment — sharing the banded frame and the verification pass, so
    * intra-increment recall costs one extra bucket self-join, not a second
    * normalize/signature/shingle pipeline. */
  def incrementalNearDups(increment: DataFrame, idCol: String, textCol: String,
                          lshTablePath: String,
                          numHashes: Int = 32, bands: Int = 8,
                          jaccardThreshold: Double = 0.5,
                          shingleK: Int = 8,
                          maxBucketSize: Int = 256,
                          includeWithinIncrement: Boolean = false,
                          prefixBuckets: Int = 64): DataFrame =
    // ONE cached frame carries everything derived from the increment scan
    // (norm for verification, sig for banding): a single lazy checkpoint
    // materialized by the probe-key job below. The banded explode is
    // recomputed from it on use — array slicing of a cached sig, not a
    // re-normalize/re-minhash — so a second checkpoint would only add a
    // materialization job's fixed cost.
    incrementalNearDupsFromBase(
      minhashBase(increment, idCol, textCol, numHashes, shingleK)
        .localCheckpoint(false),
      lshTablePath, numHashes, bands, jaccardThreshold, shingleK,
      maxBucketSize, includeWithinIncrement, prefixBuckets)

  /** [[incrementalNearDups]] over a precomputed pinned [[minhashBase]]
    * frame — the probe half of a probe-then-append cycle that computes
    * signatures exactly once (pair with
    * [[appendMinhashLshTableFromBase]]). */
  def incrementalNearDupsFromBase(base: DataFrame, lshTablePath: String,
                                  numHashes: Int = 32, bands: Int = 8,
                                  jaccardThreshold: Double = 0.5,
                                  shingleK: Int = 8,
                                  maxBucketSize: Int = 256,
                                  includeWithinIncrement: Boolean = false,
                                  prefixBuckets: Int = 64): DataFrame = {
    val spark = base.sparkSession
    val rowsPerBand = bandRows(numHashes, bands)
    val banded = base
      .where(col("sig").isNotNull)
      .select(col("id"), col("sig"),
        explode(lshBandKeys(col("sig"), bands, rowsPerBand)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    // the probe's pruning key set: ≤ bands × prefixBuckets (band, prefix) values
    val probeKeys = banded
      .select((col("band") * prefixBuckets + pmod(col("bh"), lit(prefixBuckets)))
        .cast("int").as("k"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val corpus0 = spark.read.parquet(lshTablePath)
      .where((col("band") * prefixBuckets + col("bhp")).isin(probeKeys: _*))
    val corpus = capBuckets(corpus0, Seq("band", "bh"), maxBucketSize)
    def estOk(a: Column, b: Column): Column =
      (aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, v) => acc + v).cast("double") / numHashes) >= jaccardThreshold / 2
    // a.id =!= b.id: a replayed increment (streaming batch retried after
    // its append landed) probes against its own corpus copy — identical
    // ids would emit meaningless (X, X) self-pairs that poison downstream
    // keep-one-of-each-pair logic into deleting sole document copies
    val probeCands = banded.as("a")
      .join(corpus.as("b"), col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.id") =!= col("b.id"))
      .where(estOk(col("a.sig"), col("b.sig")))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("b.norm").as("_nb"))
    val cands0 =
      if (!includeWithinIncrement) probeCands
      else {
        // intra-increment candidates from the SAME banded frame (capped
        // like the corpus side), oriented id_a < id_b; the b-side norm for
        // verification joins in from `base` (no recomputation)
        val bandedCapped = capBuckets(banded, Seq("band", "bh"), maxBucketSize)
        val within = bandedCapped.as("a")
          .join(bandedCapped.as("b"),
            col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
              col("a.id") < col("b.id"))
          .where(estOk(col("a.sig"), col("b.sig")))
          .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
          .join(base.select(col("id").as("id_b"), col("norm").as("_nb")), "id_b")
          .select(col("id_a"), col("id_b"), col("_nb"))
        probeCands.unionAll(within)
      }
    val cands = cands0.dropDuplicates("id_a", "id_b")
    // exact shingle verification: increment shingles computed only for
    // candidate ids; corpus norms already rode along from the pruned read
    val incSh = base.select(col("id").as("id_a"),
      array_distinct(TextAnalysis.shinglesOfNorm(col("norm"), shingleK)).as("_sa"))
    cands.join(incSh, "id_a")
      .withColumn("_sb", array_distinct(TextAnalysis.shinglesOfNorm(col("_nb"), shingleK)))
      .where(size(array_intersect(col("_sa"), col("_sb"))).cast("double") /
        size(array_union(col("_sa"), col("_sb"))).cast("double") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"))
  }

  /** Drop over-full LSH buckets before the self-join. A band hash shared by
    * thousands of rows carries almost no locality signal but costs O(n²) in
    * the bucket join — production LSH dedup skips super-frequent band
    * hashes for exactly this reason. NOT a silent cap: use
    * [[overfullBuckets]] to audit what was dropped. */
  private def capBuckets(banded: DataFrame, keys: Seq[String], maxBucketSize: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
    banded.withColumn("_bucket_n", count(lit(1)).over(w))
      .where(col("_bucket_n") <= maxBucketSize)
      .drop("_bucket_n")
  }

  /** Audit view of the buckets a given cap would drop: (band key..., n). */
  def overfullBuckets(banded: DataFrame, keys: Seq[String], maxBucketSize: Int): DataFrame =
    banded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("n"))
      .where(col("n") > maxBucketSize)

  /** Exact n-gram Jaccard over ALREADY-NORMALIZED columns (see
    * [[TextAnalysis.normalizeText]]): |A∩B| / |A∪B| over distinct
    * k-shingles. `normA`/`normB` must be cheap expressions (ideally
    * projected attributes): they are referenced inside the per-shingle
    * lambda, so an embedded regex would re-run per element. This is the
    * scale-path form — normalize once in a projection, score pairs here. */
  def ngramJaccardOfNorms(normA: Column, normB: Column, k: Int = 8): Column = {
    val sa = array_distinct(TextAnalysis.shinglesOfNorm(normA, k))
    val sb = array_distinct(TextAnalysis.shinglesOfNorm(normB, k))
    size(array_intersect(sa, sb)).cast("double") /
      size(array_union(sa, sb)).cast("double")
  }

  /** Exact n-gram Jaccard between candidate pairs (verification step or
    * small-scale direct use): |A∩B| / |A∪B| over distinct shingles.
    * Cost warning: normalizes inside the shingle lambda — at scale project
    * `_norm` columns first and use [[ngramJaccardOfNorms]]. */
  def ngramJaccard(textA: Column, textB: Column, k: Int = 8): Column =
    ngramJaccardOfNorms(TextAnalysis.normalizeText(textA),
      TextAnalysis.normalizeText(textB), k)

  // --- SimHash ----------------------------------------------------------------

  /** 64-bit SimHash over a TOKEN-ARRAY column: per-bit vote of token
    * hashes. ONE aggregate pass over the tokens accumulating all 64 vote
    * counters (referencing the token array exactly once — a per-bit
    * aggregate would re-scan the tokens 64 times per row). */
  def simhashOfTokens(tokens: Column): Column = {
    // hash each token once; the per-bit vote reads bits of the lambda var
    val hashes = transform(tokens, t => xxhash64(t))
    val votes = aggregate(hashes,
      array_repeat(lit(0L), 64),
      (acc, h) => zip_with(acc, sequence(lit(0L), lit(63L)),
        (v, i) => v + when(call_function("shiftright", h, i).bitwiseAND(1) === 1, 1L).otherwise(-1L)))
    // fold votes to a 64-bit signature: bit i set iff vote > 0
    aggregate(zip_with(votes, sequence(lit(0L), lit(63L)),
        (v, i) => when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, b) => acc.bitwiseOR(b))
  }

  /** Convenience Column form (normalization inlined — fine for one-shot
    * use; the token array is referenced once). */
  def simhash(text: Column): Column =
    simhashOfTokens(split(TextAnalysis.normalizeText(text), " "))

  /** Staged DataFrame form: id, sig. Uses the native codegen'd
    * [[graft.functions.SimHashExpr]]; bit-identical to the HOF form. */
  def simhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.normalizeText(col(textCol)).as("_norm"))
      .select(col("id"), graft.functions.SimHashExpr.simhash(col("_norm")).as("sig"))

  /** HOF reference implementation (oracle for the native expression). */
  def simhashSignaturesHof(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), TextAnalysis.normalizeText(col(textCol)).as("_norm"))
      .withColumn("_tokens", split(col("_norm"), " "))
      .select(col("id"), simhashOfTokens(col("_tokens")).as("sig"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dups: band the 64-bit signature into four 16-bit chunks
    * (pigeonhole: any pair within Hamming distance 3 shares ≥1 exact chunk),
    * bucket-join, verify with full Hamming distance. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int = 3, maxBucketSize: Int = 256): DataFrame = {
    val sigd = simhashSignatures(df, idCol, textCol)
    val banded0 = sigd.select(col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("band"),
          call_function("shiftright", col("sig"), b * 16).bitwiseAND(0xFFFFL).as("chunk")))).as("bk"))
      .select(col("bk.band").as("band"), col("bk.chunk").as("chunk"), col("id"), col("sig"))
    val banded = capBuckets(banded0, Seq("band", "chunk"), maxBucketSize)
    val a = banded.as("a"); val bSide = banded.as("b")
    a.join(bSide,
        col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming64(col("a.sig"), col("b.sig")).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .dropDuplicates("id_a", "id_b")
  }

  // --- near-dup clusters -----------------------------------------------------

  /** Connected components over near-dup pairs (id_a, id_b) → (id, cluster)
    * where cluster = min id reachable. Iterative min-label propagation:
    * the min label moves ONE hop per round, so convergence takes
    * O(component diameter) iterations — near-dup clusters are tiny
    * (chains of a few docs), so 2-3 rounds suffice in practice. `maxIter`
    * is a SAFETY CAP, not a silent truncation: hitting it without
    * convergence throws (wrong cluster labels in a dedup pipeline would
    * silently drop the wrong survivors — fail loud instead, and raise
    * maxIter for graphs with diameter > 50). Each round is one shuffle on
    * id; label frames are cached and localCheckpoint-ed to cut the
    * growing lineage. */
  def clusters(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
      .unionAll(pairs.select(col("id_b").as("a"), col("id_a").as("b")))
      .distinct().cache()
    var labels = edges.select(col("a").as("id")).distinct()
      .withColumn("cluster", col("id"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // candidate label per node: min over own label and neighbors' labels.
      // The node's OLD label rides the same union as a tagged column, so
      // the convergence check is a filter over the one groupBy shuffle —
      // not a second join-shuffle against the previous frame (each id
      // appears exactly once in `labels`, so max(_old) recovers it).
      val viaNeighbors = edges.join(labels, edges("b") === labels("id"))
        .select(edges("a").as("id"), col("cluster"))
      val next = labels.select(col("id"), col("cluster"),
          col("cluster").as("_old"))
        .unionAll(viaNeighbors.withColumn("_old",
          when(lit(false), col("cluster")))) // typed null: neighbor rows carry no old label
        .groupBy("id").agg(min("cluster").as("cluster"), max("_old").as("_old"))
        .localCheckpoint(true)
      val changed = next.where(col("cluster") =!= col("_old")).count()
      labels = next.select(col("id"), col("cluster"))
      converged = changed == 0
      iter += 1
    }
    // the returned frame reads the LAST checkpoint, not edges: release the
    // edge cache now (per-iteration checkpoints are not CacheManager
    // entries — the ContextCleaner reclaims each one as its reference
    // drops on reassignment). Without this every clusters()/survivors()
    // call pinned its edge set in executor storage for the session's life.
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"clusters() did not converge in $maxIter iterations — a component " +
          "has diameter > maxIter; raise maxIter (labels would be WRONG, " +
          "not approximate: min-label propagation moves one hop per round)")
    labels
  }

  /** Survivors after near-dup clustering: keep the min id per cluster.
    * `all` = the full id set (ids not in any pair survive untouched). */
  def survivors(all: DataFrame, idCol: String, pairs: DataFrame): DataFrame = {
    val cl = clusters(pairs)
    val losers = cl.where(col("id") =!= col("cluster")).select(col("id").as(idCol))
    all.join(losers, Seq(idCol), "left_anti")
  }

  // --- embedding near-dup -------------------------------------------------------

  /** Embedding-cosine near-duplicates: random-hyperplane LSH buckets
    * (deterministic seeded planes), then exact cosine within buckets.
    * planes are generated driver-side from a seed and inlined as literals —
    * they broadcast with the plan. */
  def embeddingNearDups(df: DataFrame, idCol: String, vecCol: String,
                        dim: Int, planes: Int = 12, seed: Long = 42,
                        cosineThreshold: Double = 0.95,
                        maxBucketSize: Int = 1024): DataFrame = {
    val sigCol = Similarity.hyperplaneSignature(col(vecCol), dim, planes, seed)
    // norm pre-projected per side: each candidate pair in the bucket join
    // pays ONE zip_with dot instead of three full-vector aggregate passes
    val withSig0 = df.select(col(idCol).as("id"), col(vecCol).as("v"), sigCol.as("bucket"),
      Similarity.l2norm(col(vecCol)).as("n"))
    val withSig = capBuckets(withSig0, Seq("bucket"), maxBucketSize)
    val a = withSig.as("a"); val bSide = withSig.as("b")
    a.join(bSide, col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        Similarity.cosineWithNorms(col("a.v"), col("b.v"),
          col("a.n"), col("b.n")).as("cosine"))
      .where(col("cosine") >= cosineThreshold)
  }

  /** Exact duplicate-substring SPANS (the ExactSubstr shape of Lee et al.
    * 2022, "Deduplicating Training Data Makes Language Models Better"): a
    * word-window of `windowWords` tokens that occurs at least `minOcc`
    * times corpus-wide (across OR within documents) is a duplicated
    * window; maximal runs of overlapping/adjacent duplicated windows are
    * merged into spans. Returns one row per span:
    * `(idCol, span_start, span_end, n_windows)` with 0-based word offsets,
    * `span_end` exclusive — the span covers normalized words
    * `[span_start, span_end)`.
    *
    * The reference scope (valijson) has no corpus-level operator; this is
    * pipeline breadth per the north rule, sibling to [[minhashNearDups]]
    * (whole-document near-dup) and `Curation.removeBoilerplateLines`
    * (line-granularity): ExactSubstr catches the long verbatim passage
    * embedded in otherwise-distinct documents that both of those miss.
    *
    * Shape for 100 TB — the suffix-array of the paper is replaced by the
    * Spark-native equivalent (windowed hashing + one hash-agg), trading
    * the suffix array's arbitrary-length maximality for fixed-window
    * granularity, the standard distributed relaxation:
    *   1. window hashes — a codegen'd projection emits one 64-bit
    *      `xxhash64` per word position (the window TEXT is transient
    *      inside the projection; only `(id, pos:int, hash:long)` ~20 bytes
    *      per token is ever shuffled, never the strings).
    *   2. ONE corpus-wide hash-agg on the window hash; duplicated keys are
    *      a tiny fraction of distinct windows for any honest corpus. The
    *      mark-join back is AQE-broadcastable when the dup-key set is
    *      small and degrades to a shuffle join, never a driver collect.
    *   3. span merge — gaps-and-islands over `(id, pos)`: a sort-based
    *      WINDOW (spillable, no per-group buffer) whose exchange is SHARED
    *      with the final per-(id, island) aggregate — one shuffle, and a
    *      hot document costs a disk sort, not an OOM.
    *
    * Collision note: two distinct window texts colliding in xxhash64 would
    * conflate their counts; at 2^64 key space this needs ~10^9 × the
    * corpus sizes tested here before the birthday bound matters — the
    * same trade the paper's own hashed variants make. */
  def duplicateSpans(df: DataFrame, idCol: String, textCol: String,
                     windowWords: Int = 8, minOcc: Long = 2): DataFrame = {
    require(windowWords >= 2, s"windowWords must be >= 2, got $windowWords")
    require(minOcc >= 2, s"minOcc must be >= 2, got $minOcc")
    val w = windowWords
    val wins = windowHashes(normFrame(df, idCol, textCol), idCol, w)
    val dup = wins.groupBy(col("_h")).agg(count(lit(1)).as("_c"))
      .where(col("_c") >= minOcc).select(col("_h"))
    val matched = wins.join(dup, Seq("_h")).select(col(idCol), col("_p"))
    mergeSpans(matched, idCol, w)
      .select(col(idCol), col("span_start"), col("span_end"), col("n_windows"))
  }

  /** Remove duplicated substrings, keeping ONE canonical occurrence — the
    * removal half of the ExactSubstr recipe ([[duplicateSpans]] is the
    * detection half). For every duplicated window the corpus-wide FIRST
    * occurrence (minimal `(id, pos)`, lexicographic) is canonical and
    * survives; spans are merged over the NON-canonical occurrences only
    * and their words excised. Removal happens in normalized-word space
    * (the space the windows were matched in): `text_clean` is the
    * surviving normalized words re-joined, for EVERY input row (short,
    * empty and NULL texts pass through with `n_words_removed = 0`).
    *
    * Caveat (shared with the paper's recipe): a canonical occurrence can
    * still lose words to an overlapping span of a DIFFERENT duplicated
    * window whose canonical home is elsewhere; kept-text is guaranteed
    * per-window-choice, not per-character.
    *
    * Scale shape: [[duplicateSpans]]' three exchanges, with the dup-key
    * agg additionally carrying a `min(struct(id, pos))` partial (same
    * shuffle, +16 bytes per key), plus one row-bounded `collect_list` of
    * merged spans per doc joined back to the words array — the excision
    * itself is a codegen'd higher-order `filter` per row. */
  def removeDuplicateSpans(df: DataFrame, idCol: String, textCol: String,
                           windowWords: Int = 8, minOcc: Long = 2): DataFrame = {
    require(windowWords >= 2, s"windowWords must be >= 2, got $windowWords")
    require(minOcc >= 2, s"minOcc must be >= 2, got $minOcc")
    val w = windowWords
    val base = normWords(df, idCol, textCol)
    val wins = windowHashes(normFrame(df, idCol, textCol), idCol, w)
    val canon = wins.groupBy(col("_h"))
      .agg(count(lit(1)).as("_c"),
        min(struct(col(idCol).as("i"), col("_p").as("p"))).as("_first"))
      .where(col("_c") >= minOcc)
      .select(col("_h"), col("_first"))
    val matched = wins.join(canon, Seq("_h"))
      .where(!(col(idCol) === col("_first.i") && col("_p") === col("_first.p")))
      .select(col(idCol), col("_p"))
    val spans = mergeSpans(matched, idCol, w)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("_spans"))
    base.join(spans, Seq(idCol), "left")
      .select(col(idCol), col("_ws"),
        coalesce(col("_spans"),
          array().cast("array<struct<s:bigint,e:bigint>>")).as("_sp"))
      .select(col(idCol),
        concat_ws(" ", filter(col("_ws"), (x, i) =>
          !exists(col("_sp"), s => i >= s.getField("s") && i < s.getField("e"))))
          .as("text_clean"),
        aggregate(col("_sp"), lit(0L), (acc, s) =>
          acc + s.getField("e") - s.getField("s")).as("n_words_removed"))
  }

  /** Normalized text: `(idCol, _norm)` for every input row. */
  private def normFrame(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      TextAnalysis.normalizeText(coalesce(col(textCol).cast("string"), lit("")))
        .as("_norm"))

  /** Normalized word arrays: `(idCol, _ws)` for every input row. */
  private def normWords(df: DataFrame, idCol: String, textCol: String): DataFrame =
    normFrame(df, idCol, textCol)
      .select(col(idCol), split(col("_norm"), " ").as("_ws"))

  /** Per-position window hashes `(idCol, _p:int, _h:long)` from a
    * `(idCol, _norm)` frame; rows shorter than the window (and empty
    * texts) contribute none. Computed by the native one-pass
    * [[graft.functions.WordWindowHashesExpr]] over the row's normalized
    * text — neither the word array nor any window TEXT is materialized
    * (the hash covers the byte range of words p..p+w-1, byte-identical to
    * the split + concat_ws-of-slice formulation it replaces; asserted in
    * OpsSpec). */
  private def windowHashes(base: DataFrame, idCol: String, w: Int): DataFrame =
    base
      .select(col(idCol),
        posexplode(graft.functions.WordWindowHashesExpr.wordWindowHashes(
          col("_norm"), w)).as(Seq("_p", "_h")))

  /** Gaps-and-islands merge of matched window positions `(idCol, _p)` into
    * maximal spans: a sort-based window (spillable) whose exchange is
    * shared with the per-(id, island) aggregate. */
  private def mergeSpans(matched: DataFrame, idCol: String, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byDoc = Window.partitionBy(col(idCol)).orderBy(col("_p"))
    matched
      .withColumn("_gap", when(col("_p") - lag(col("_p"), 1).over(byDoc) > w, 1)
        .otherwise(0))
      .withColumn("_isl", sum(col("_gap")).over(byDoc))
      .groupBy(col(idCol), col("_isl"))
      .agg(min(col("_p")).cast("long").as("span_start"),
        (max(col("_p")) + w).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
  }
}
