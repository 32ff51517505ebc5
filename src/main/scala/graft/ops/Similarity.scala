package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Baseline: brute-force cosine top-k — `orderBy(desc).limit(k)` compiles to
  * TakeOrderedAndProject: each partition keeps a local k-heap, the driver
  * merges P·k candidates; no full sort, no shuffle of the data.
  *
  * Scale path: random-hyperplane LSH buckets (deterministic, seeded) —
  * signature computed in a projection, candidates restricted to the probe's
  * bucket ring (Hamming ≤ 1 multi-probe), exact cosine only within
  * candidates. At 100 TB the bucketed table is written partitioned by
  * signature so probes prune to a handful of files.
  */
object Similarity {

  /** Cosine similarity between two float-array columns (zip_with dot and
    * rsqrt norms — stays inside codegen; no UDF). Three `aggregate` passes
    * per pair; in a bucket join where one row meets many candidates,
    * pre-project [[l2norm]] per side and use [[cosineWithNorms]] instead. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    dot / (l2norm(a) * l2norm(b))
  }

  /** L2 norm of a float-array column — compute ONCE per side in the
    * projection before a bucket join so each candidate pair pays one
    * zip_with dot instead of three full-vector passes. */
  def l2norm(v: Column): Column =
    sqrt(aggregate(transform(v, x => x * x), lit(0.0d), (acc, x) => acc + x))

  /** Cosine from a pair's vectors plus their pre-projected norms: one
    * vector pass (the dot) per candidate pair. Bitwise-identical to
    * [[cosine]] — same op order, the norms are merely hoisted.
    * Zero-norm vectors yield NULL, not 0/0 = NaN: Spark orders NaN above
    * every real number and evaluates `NaN >= t` as true, so a NaN cosine
    * would rank all-zero embeddings FIRST in every top-k and emit them as
    * near-duplicates of anything sharing a bucket; NULL sorts last under
    * desc and fails threshold filters. */
  def cosineWithNorms(a: Column, b: Column, normA: Column, normB: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)
    when(normA === 0.0d || normB === 0.0d, lit(null).cast("double"))
      .otherwise(dot / (normA * normB))
  }

  /** Dot product with a constant query vector (literal array — broadcast
    * with the plan). */
  def dotWithQuery(v: Column, query: Seq[Float]): Column =
    aggregate(zip_with(v, typedLit(query), (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  def cosineWithQuery(v: Column, query: Seq[Float]): Column = {
    val qn = math.sqrt(query.map(x => x.toDouble * x).sum)
    require(qn > 0.0, "cosineWithQuery: all-zero query vector has no direction")
    val nv = sqrt(aggregate(transform(v, x => x * x), lit(0.0d), (acc, x) => acc + x))
    // zero-norm corpus vectors → NULL (sorts last), never 0/0 = NaN
    // (which Spark ranks above every real cosine) — see cosineWithNorms
    when(nv === 0.0d, lit(null).cast("double"))
      .otherwise(dotWithQuery(v, query) / (nv * qn))
  }

  /** Brute-force cosine top-k: per-partition heap + driver merge
    * (TakeOrderedAndProject). */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
                     query: Seq[Float], k: Int): DataFrame =
    df.select(col(idCol), cosineWithQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)

  /** Embedding-column validation — the constraint model (SURVEY.md §2)
    * extended to the vector modality: per-row dimension, finiteness and
    * L2-norm checks. One codegen'd projection over the scan — no shuffle,
    * no UDF — so it composes with the row validators in a single pass.
    *
    * `has_nonfinite` uses `!(|x| <= Double.MaxValue)`: comparisons with
    * NaN are false, so the negation is true exactly for NaN and ±Inf.
    * The norm is NULL (never NaN) for null/non-finite vectors, keeping
    * the NaN-ordering trap out of downstream filters (see
    * [[cosineWithNorms]]). Returns idCol, dim, is_null, has_nonfinite,
    * norm, dim_ok, norm_ok, pass. */
  def embeddingChecks(df: DataFrame, idCol: String, vecCol: String,
                      expectedDim: Int, minNorm: Double = 0.0,
                      maxNorm: Double = Double.PositiveInfinity): DataFrame = {
    require(expectedDim >= 1, s"expectedDim must be >= 1, got $expectedDim")
    val v = col(vecCol)
    val nonfinite = v.isNotNull &&
      exists(v, x => !(abs(x.cast("double")) <= lit(Double.MaxValue)))
    df.select(col(idCol), size(v).cast("long").as("dim"),
        v.isNull.as("is_null"), nonfinite.as("has_nonfinite"),
        when(v.isNull || nonfinite, lit(null).cast("double"))
          .otherwise(l2norm(v)).as("norm"))
      .withColumn("dim_ok", !col("is_null") && col("dim") === expectedDim)
      .withColumn("norm_ok", col("norm").isNotNull &&
        col("norm") >= minNorm && col("norm") <= maxNorm)
      .withColumn("pass",
        col("dim_ok") && !col("has_nonfinite") && col("norm_ok"))
  }

  /** Deterministic pseudo-random hyperplanes from a seed (driver-side;
    * xorshift64*, no java.util.Random state semantics to worry about). */
  private[ops] def randomPlanes(dim: Int, planes: Int, seed: Long): Seq[Seq[Float]] = {
    var s = seed ^ 0x9E3779B97F4A7C15L
    def next(): Long = {
      s ^= s >>> 12; s ^= s << 25; s ^= s >>> 27
      s * 0x2545F4914F6CDD1DL
    }
    Seq.fill(planes)(Seq.fill(dim) {
      val u = (next() >>> 11).toDouble / (1L << 53).toDouble // [0,1)
      (2.0 * u - 1.0).toFloat
    })
  }

  /** Sign-bit signature of `v` against `planes` seeded hyperplanes → long
    * bucket id in [0, 2^planes). Native single-pass expression
    * ([[graft.functions.HyperplaneSigExpr]]) — one vector scan for ALL
    * planes instead of one interpreted `aggregate` pass per plane. */
  def hyperplaneSignature(v: Column, dim: Int, planes: Int, seed: Long): Column =
    graft.functions.HyperplaneSigExpr.hyperplaneSig(v, randomPlanes(dim, planes, seed))

  /** HOF reference formulation (oracle for the native expression; asserted
    * bit-identical in OpsSpec). */
  def hyperplaneSignatureHof(v: Column, dim: Int, planes: Int, seed: Long): Column = {
    val ps = randomPlanes(dim, planes, seed)
    ps.zipWithIndex.map { case (p, i) =>
      when(dotWithQuery(v, p) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** The query's probe ring: its own signature plus every Hamming-1
    * neighbor (multi-probe). ONE definition shared by the in-memory and
    * persisted-table paths — the sign convention (dot >= 0) and ring width
    * must never desynchronize between how a table is written and how it is
    * probed. */
  private[ops] def queryProbeSigs(query: Seq[Float], planes: Int,
                                  seed: Long): Seq[Long] = {
    val ps = randomPlanes(query.length, planes, seed)
    val querySig = ps.zipWithIndex.map { case (p, i) =>
      val dot = p.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
      if (dot >= 0) 1L << i else 0L
    }.sum
    querySig +: (0 until planes).map(i => querySig ^ (1L << i))
  }

  /** LSH-bucketed ANN: probe the query's bucket plus all Hamming-1
    * neighbor buckets (multi-probe), exact cosine within candidates.
    * Recall/efficiency dial: `planes` (bucket granularity). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
              query: Seq[Float], k: Int, planes: Int = 8, seed: Long = 42): DataFrame = {
    val dim = query.length
    val probeSigs = queryProbeSigs(query, planes, seed)
    df.select(col(idCol), col(vecCol),
        hyperplaneSignature(col(vecCol), dim, planes, seed).as("_sig"))
      .where(col("_sig").isin(probeSigs: _*))
      .select(col(idCol), cosineWithQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** IVF-style coarse quantizer: assign each vector to the nearest of
    * `centroids` (literal list), search = scan only the query's cell ±
    * nprobe cells. Centroid fitting is out of scope (any k-means output
    * plugs in); assignment + pruned search are the Spark-side machinery. */
  def ivfAssign(df: DataFrame, vecCol: String, centroids: Seq[Seq[Float]]): DataFrame = {
    // squared distance in DOUBLE precision end-to-end (float elementwise
    // math would diverge from any external recomputation on near-ties)
    val dists = centroids.zipWithIndex.map { case (c, i) =>
      struct(
        aggregate(zip_with(col(vecCol), typedLit(c),
            (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
          lit(0.0d), (acc, v) => acc + v).as("dist"),
        lit(i).as("cell"))
    }
    // NULL or wrong-dimension vectors get a NULL cell, not cell 0: their
    // per-centroid dist aggregates are NULL, and struct ordering sorts a
    // NULL dist field FIRST, so array_min would silently dump every
    // malformed vector into cell 0's directory (inflating each probe of
    // that cell with rows that are not valid members)
    val valid = col(vecCol).isNotNull &&
      size(col(vecCol)) === centroids.head.size
    df.withColumn("ivf_cell",
      when(valid, array_min(array(dists: _*)).getField("cell"))
        .otherwise(lit(null).cast("int")))
  }

  /** The query's `nprobe` nearest cells (driver-side, double precision). */
  private[ops] def probeCells(centroids: Seq[Seq[Float]], query: Seq[Float],
                              nprobe: Int): Seq[Int] =
    centroids.zipWithIndex.map { case (c, i) =>
      (c.zip(query).map { case (a, b) => (a.toDouble - b.toDouble) * (a.toDouble - b.toDouble) }.sum, i)
    }.sortBy(_._1).take(nprobe).map(_._2)

  def ivfTopK(df: DataFrame, idCol: String, vecCol: String,
              centroids: Seq[Seq[Float]], query: Seq[Float], k: Int,
              nprobe: Int = 2): DataFrame = {
    val qd = probeCells(centroids, query, nprobe)
    ivfAssign(df, vecCol, centroids)
      .where(col("ivf_cell").isin(qd: _*))
      .select(col(idCol), cosineWithQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  // --- persisted bucketed layouts (the 100 TB serving shape) -----------------

  /** Write the IVF layout as a Hive-partitioned parquet table — one
    * directory per cell. At 100 TB this is the serving layout: a probe
    * reads ONLY its nprobe cell directories (PartitionFilters prune at
    * planning time), ~1/cells of the corpus per probed cell, instead of
    * recomputing assignments over a full scan per query. */
  def writeIvfTable(df: DataFrame, idCol: String, vecCol: String,
                    centroids: Seq[Seq[Float]], path: String): Unit =
    ivfAssign(df.select(col(idCol), col(vecCol)), vecCol, centroids)
      .write.mode("overwrite").partitionBy("ivf_cell").parquet(path)

  /** Probe a written IVF table: the `ivf_cell` filter is a PARTITION filter
    * (asserted in PlanSpec), so only the probed cells' files are read. */
  def ivfTopKFromTable(spark: org.apache.spark.sql.SparkSession, path: String,
                       idCol: String, vecCol: String,
                       centroids: Seq[Seq[Float]], query: Seq[Float], k: Int,
                       nprobe: Int = 2): DataFrame = {
    val qd = probeCells(centroids, query, nprobe)
    spark.read.parquet(path)
      .where(col("ivf_cell").isin(qd: _*))
      .select(col(idCol), cosineWithQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Write the hyperplane-LSH layout partitioned by signature — the
    * persisted form of [[lshTopK]]'s projection. */
  def writeLshTable(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                    planes: Int, seed: Long, path: String): Unit =
    df.select(col(idCol), col(vecCol),
        hyperplaneSignature(col(vecCol), dim, planes, seed).as("lsh_sig"))
      .write.mode("overwrite").partitionBy("lsh_sig").parquet(path)

  /** Multi-probe (Hamming ≤ 1) over a written LSH table with partition
    * pruning on the signature directories. */
  def lshTopKFromTable(spark: org.apache.spark.sql.SparkSession, path: String,
                       idCol: String, vecCol: String,
                       query: Seq[Float], k: Int, planes: Int = 8,
                       seed: Long = 42): DataFrame = {
    val probeSigs = queryProbeSigs(query, planes, seed)
    spark.read.parquet(path)
      .where(col("lsh_sig").isin(probeSigs: _*))
      .select(col(idCol), cosineWithQuery(col(vecCol), query).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }
}
