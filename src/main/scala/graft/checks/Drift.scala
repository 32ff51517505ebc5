package graft.checks

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Distribution-drift checks (KL divergence / PSI) against baseline
  * sketches — the north-rule capability with no reference counterpart
  * (the closest machinery is the reference's mergeable frozen-constant
  * model; the sketch here is a mergeable per-partition state, realized as a
  * typed Spark `Aggregator` so Catalyst gives partial+final merge for free).
  */
object Drift {

  /** Fixed-width histogram sketch: mergeable, bounded size, deterministic.
    * Bucket 0 = underflow, bucket n+1 = overflow. */
  final case class Histogram(lo: Double, hi: Double, counts: Array[Long]) {
    def n: Int = counts.length - 2
    def total: Long = counts.sum
    def probs(smooth: Double = 1e-6): Array[Double] = {
      val t = total.toDouble.max(1.0)
      counts.map(c => (c + smooth) / (t + smooth * counts.length))
    }
    def merge(o: Histogram): Histogram = {
      require(o.lo == lo && o.hi == hi && o.counts.length == counts.length)
      val out = new Array[Long](counts.length)
      var i = 0
      while (i < out.length) { out(i) = counts(i) + o.counts(i); i += 1 }
      Histogram(lo, hi, out)
    }
  }

  object Histogram {
    def empty(lo: Double, hi: Double, n: Int): Histogram =
      Histogram(lo, hi, new Array[Long](n + 2))
  }

  /** Typed aggregator building a [[Histogram]] over a Double column.
    * Partial buffers merge associatively per partition → one shuffle of
    * O(buckets) state, never of rows. */
  final class HistogramAgg(lo: Double, hi: Double, n: Int)
      extends Aggregator[Option[Double], Histogram, Histogram] {
    override def zero: Histogram = Histogram.empty(lo, hi, n)
    override def reduce(b: Histogram, x: Option[Double]): Histogram = {
      x.foreach { v =>
        val idx =
          if (v.isNaN) 0
          else if (v < lo) 0
          else if (v >= hi) n + 1
          else 1 + ((v - lo) / (hi - lo) * n).toInt.min(n - 1)
        b.counts(idx) += 1
      }
      b
    }
    override def merge(a: Histogram, b: Histogram): Histogram = a.merge(b)
    override def finish(r: Histogram): Histogram = r
    override def bufferEncoder: Encoder[Histogram] = Encoders.product[Histogram]
    override def outputEncoder: Encoder[Histogram] = Encoders.product[Histogram]
  }

  /** Bucket index expression shared by [[histogramDF]] and [[sketchMany]]:
    * `width_bucket` semantics, except NaN routes to the underflow bucket
    * (matching [[HistogramAgg]]) — Spark's width_bucket returns NULL for
    * NaN, which would surface as an unreadable NULL bucket group. */
  private def bucketExpr(d: Column, lo: Double, hi: Double, n: Int): Column =
    when(isnan(d), lit(0L))
      .otherwise(coalesce(width_bucket(d, lit(lo), lit(hi), lit(n)), lit(0L)))

  /** Column-level histogram via pure built-ins (`width_bucket` + groupBy) —
    * preferred at scale: whole-stage-codegen'd, partial-agg'd, no Encoders.
    * Returns (bucket, cnt) with bucket ∈ [0, n+1]; NaN counts as underflow. */
  def histogramDF(df: DataFrame, c: Column, lo: Double, hi: Double, n: Int): DataFrame = {
    val d = c.cast("double")
    df.where(d.isNotNull)
      .groupBy(bucketExpr(d, lo, hi, n).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Collect a small (n+2)-bucket histogram to the driver as a sketch. */
  def sketch(df: DataFrame, c: Column, lo: Double, hi: Double, n: Int): Histogram = {
    val h = Histogram.empty(lo, hi, n)
    histogramDF(df, c, lo, hi, n).collect().foreach { r =>
      val b = r.getLong(0).toInt.max(0).min(n + 1)
      h.counts(b) += r.getLong(1)
    }
    h
  }

  /** KL(P‖Q) with additive smoothing. */
  def kl(p: Histogram, q: Histogram): Double = {
    val pp = p.probs(); val qq = q.probs()
    pp.zip(qq).map { case (a, b) => if (a <= 0) 0.0 else a * math.log(a / b) }.sum
  }

  /** Population Stability Index: Σ (p−q)·ln(p/q). Conventional alert
    * thresholds: <0.1 stable, 0.1-0.25 moderate, >0.25 drifted. */
  def psi(p: Histogram, q: Histogram): Double = {
    val pp = p.probs(); val qq = q.probs()
    pp.zip(qq).map { case (a, b) => (a - b) * math.log(a / b) }.sum
  }

  final case class DriftVerdict(metric: String, value: Double, threshold: Double) {
    def pass: Boolean = value <= threshold
  }

  /** Verdict from an already-collected sketch (shared by [[check]] and the
    * one-scan [[sketchMany]] orchestration path). */
  def verdictOf(current: Histogram, baseline: Histogram,
                psiThreshold: Double = 0.25): DriftVerdict =
    DriftVerdict("psi", psi(current, baseline), psiThreshold)

  /** Compare a column's current distribution against a baseline sketch. */
  def check(df: DataFrame, c: Column, baseline: Histogram,
            psiThreshold: Double = 0.25): DriftVerdict =
    verdictOf(sketch(df, c, baseline.lo, baseline.hi, baseline.n),
      baseline, psiThreshold)

  /** Two-sample Kolmogorov-Smirnov drift verdict over persisted KLL
    * sketches (the quantile-sketch counterpart of the PSI/KL histogram
    * path: no bucket grid to pick, sensitive to any CDF shift). The
    * threshold is DATA-DEPENDENT — the classical two-sample bound at
    * `pValue` on the sketches' retained sample sizes, widened by both
    * sketches' normalized rank errors — so the verdict carries it instead
    * of a fixed constant. `pass` = no detectable drift.
    *
    * Driver-side form; the frame-side equivalents for per-partition
    * verdicts over a sketch table are `KllSketch.kllKsDelta` /
    * `kllKsThreshold` / `kllKsDrifted`.
    *
    * @throws IllegalArgumentException if either sketch is NULL/empty — a
    *   drift CHECK against a missing baseline is a caller bug, not a pass. */
  def ksCheck(current: Array[Byte], baseline: Array[Byte],
              pValue: Double = 0.05): DriftVerdict = {
    val delta = graft.functions.KllSketch.ksDeltaBoxed(current, baseline)
    val thr = graft.functions.KllSketch.ksThresholdBoxed(current, baseline, pValue)
    require(delta != null && thr != null,
      "ksCheck requires two non-empty KLL sketches")
    DriftVerdict("ks", delta.doubleValue(), thr.doubleValue())
  }

  /** ALL sketches in ONE table scan: per (name, column, lo, hi, n) spec,
    * n+2 conditional-count aggregates (bucket tagging identical to
    * [[histogramDF]]/[[HistogramAgg]], NaN → underflow) in a single
    * global aggregation — one job, map-side partial aggregation, and an
    * O(specs × buckets) result row on the driver. This is the 100 TB
    * shape for multi-column drift: K drift specs must not cost K scans. */
  def sketchMany(df: DataFrame,
                 specs: Seq[(String, Column, Double, Double, Int)])
      : Map[String, Histogram] = {
    if (specs.isEmpty) return Map.empty
    // the Map return would silently drop all but one histogram for a
    // duplicated name (two baselines legally targeting the same COLUMN are
    // fine — give them distinct names, as TableRunner's index keys do)
    require(specs.map(_._1).distinct.size == specs.size,
      s"sketchMany spec names must be distinct, got ${specs.map(_._1)}")
    val aggs = specs.flatMap { case (name, c, lo, hi, n) =>
      val d = c.cast("double")
      val bucket = bucketExpr(d, lo, hi, n)
      (0 to n + 1).map(b =>
        sum(when(d.isNotNull && bucket === b, 1L).otherwise(0L)))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    var off = 0
    specs.map { case (name, _, lo, hi, n) =>
      val h = Histogram.empty(lo, hi, n)
      var b = 0
      while (b <= n + 1) {
        h.counts(b) = if (row.isNullAt(off)) 0L else row.getLong(off)
        b += 1; off += 1
      }
      name -> h
    }.toMap
  }
}
