package graft.run

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.checks.{Drift, TableChecks}
import graft.spec.SchemaSpec

/** Whole-table validation orchestration: one declarative config → one
  * report. This is the "switch from the reference" entry point for a table:
  * the row-level constraint pass (valijson semantics) plus every
  * north-rule table check, each a separate lazily-planned DataFrame so
  * callers pay only for what they materialize — EXCEPT drift verdicts,
  * which collect O(buckets) sketches eagerly; all drift specs share one
  * table scan (Drift.sketchMany).
  */
object TableRunner {

  final case class UniquenessSpec(keys: Seq[String])
  final case class ReferentialSpec(column: String, vocab: Either[Seq[String], (DataFrame, String)])
  final case class DriftSpec(column: String, expr: Option[Column], baseline: Drift.Histogram,
                             psiThreshold: Double = 0.25)

  final case class TableValidationConfig(
      rowSpec: SchemaSpec,
      keyCols: Seq[String],
      uniqueness: Seq[UniquenessSpec] = Nil,
      referential: Seq[ReferentialSpec] = Nil,
      statsCols: Seq[String] = Nil,
      drift: Seq[DriftSpec] = Nil,
      partCol: String = "part_id")

  final case class TableValidationReport(
      flagged: DataFrame,
      violations: DataFrame,
      partitionVerdicts: DataFrame,
      duplicateKeys: Map[String, DataFrame],
      referentialViolations: Map[String, DataFrame],
      stats: Option[DataFrame],
      driftVerdicts: Seq[(String, Drift.DriftVerdict)]) {

    /** Global pass/fail: no failing rows, no duplicate keys, no
      * referential violations, no drifted columns. Materializes
      * everything. */
    def pass(): Boolean = {
      // sum over zero verdict rows is SQL NULL (empty input table) — an
      // empty table has no failing rows, so it passes
      val agg = partitionVerdicts.agg(sum(when(col("pass"), 0).otherwise(1))).head()
      val rowsOk = agg.isNullAt(0) || agg.getLong(0) == 0
      val dupsOk = duplicateKeys.values.forall(_.isEmpty)
      val refOk = referentialViolations.values.forall(_.isEmpty)
      val driftOk = driftVerdicts.forall(_._2.pass)
      rowsOk && dupsOk && refOk && driftOk
    }
  }

  /** Disambiguate report-map keys when two specs legally share one: the
    * duplicates get a `#index` suffix (`"tool"`, `"tool#1"`) instead of
    * silently collapsing in `.toMap` — a collapsed entry's check never ran,
    * so `pass()` could return true over unexamined violations (the exact
    * Map-collision Drift.sketchMany was already hardened against). Suffixed
    * keys are checked against everything already assigned, so a literal
    * spec key like "tool#1" can never collide with a generated suffix. */
  private def keyed[A](specs: Seq[A])(key: A => String): Seq[(String, A)] = {
    val used = scala.collection.mutable.Set[String]()
    specs.zipWithIndex.map { case (s, i) =>
      var k = key(s)
      var j = i
      while (used(k)) { k = s"${key(s)}#$j"; j += 1 }
      used += k
      k -> s
    }
  }

  def run(df: DataFrame, cfg: TableValidationConfig): TableValidationReport = {
    val row = Runner.rowChecks(df, cfg.rowSpec, cfg.keyCols, cfg.partCol)
    val dups = keyed(cfg.uniqueness)(_.keys.mkString(",")).map { case (k, u) =>
      k -> TableChecks.uniqueness(df, u.keys)
    }.toMap
    val refs = keyed(cfg.referential)(_.column).map { case (k, r) =>
      k -> (r.vocab match {
        case Left(values)        => TableChecks.referentialStatic(df, r.column, values)
        case Right((vdf, vcol))  => TableChecks.referential(df, r.column, vdf, vcol)
      })
    }.toMap
    // stats groupBy the partition column, which (like rowChecks) may need
    // deriving — TableChecks.stats on the raw df crashed any statsCols
    // config whose table lacked partCol, the case rowChecks supports.
    // Runner.withPartCol is THE derivation rule, so stats buckets always
    // align with the verdict table's.
    val stats = if (cfg.statsCols.nonEmpty)
      Some(TableChecks.stats(Runner.withPartCol(df, cfg.partCol, cfg.keyCols),
        Seq(cfg.partCol), cfg.statsCols)) else None
    // drift verdicts are the one EAGER element of the report (they collect
    // O(buckets) sketches) — all K drift specs share ONE table scan
    // instead of K (Drift.sketchMany), so adding a drift column does not
    // add a scan
    val driftSketches = Drift.sketchMany(df, cfg.drift.zipWithIndex.map {
      case (d, i) =>
        // index-keyed: two specs may legally target the same column with
        // different baselines/expressions
        (i.toString, d.expr.getOrElse(col(d.column)),
          d.baseline.lo, d.baseline.hi, d.baseline.n)
    })
    val drifts = cfg.drift.zipWithIndex.map { case (d, i) =>
      d.column -> Drift.verdictOf(driftSketches(i.toString), d.baseline, d.psiThreshold)
    }
    TableValidationReport(row.flagged, row.violations, row.partitionVerdicts,
      dups, refs, stats, drifts)
  }
}
