package graft.run

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.{CompileOptions, Compiler}
import graft.spec.SchemaSpec

/** Partition-parallel validation runner.
  *
  * Mirrors the reference benchmark's two-pass shape
  * (`examples/valijson_benchmark.cpp:171-202`): a cheap fail-fast boolean
  * scan over every row, then violation expansion ONLY for failing rows —
  * here expressed as a filter(!pass) *before* the violations projection, so
  * Catalyst evaluates the expensive exhaustive expression solely on the
  * failing slice. Both passes are shuffle-free; only the per-partition
  * verdict aggregation shuffles, and it shuffles O(partitions) rows.
  *
  * Resumability (north rule): a driver-side manifest ledger records each
  * completed `part_id`; `resume` filters already-done partitions out of the
  * scan (partition-pruned when part_id is the storage partition column) —
  * the Hive-partitioned-parquet stand-in for Iceberg snapshot checkpoints
  * (SURVEY.md §1.3).
  */
object Runner {

  final case class RowCheckOutput(flagged: DataFrame, violations: DataFrame,
                                  partitionVerdicts: DataFrame)

  /** Row-level validation: adds `pass`, explodes violations for failing
    * rows, aggregates per-partition verdicts.
    *
    * @param keyCols  identifying columns carried into the violation table
    * @param partCol  partition column for verdicts (derived if absent)
    */
  def rowChecks(df: DataFrame, spec: SchemaSpec, keyCols: Seq[String],
                partCol: String = "part_id",
                opts: CompileOptions = CompileOptions()): RowCheckOutput = {
    val withPart =
      if (df.columns.contains(partCol)) df
      else df.withColumn(partCol, pmod(hash(col(keyCols.head)), lit(64)))
    // Compile against the schema AS GIVEN (pre part_id injection): the
    // bookkeeping column must not become a property of the validated
    // document (it would trip additionalProperties/maxProperties/
    // propertyNames specs on every row).
    val compiled = Compiler.compileRow(spec, df.schema, opts)

    val flagged = withPart.withColumn("pass", compiled.pass)

    // Exhaustive pass only for failing rows; stable order (conv, turn,
    // constraint_seq) comes from posexplode position = parser insertion
    // order (schema_parser.hpp:825-1149).
    val violations = flagged
      .where(!col("pass"))
      .select(keyCols.map(col) :+ col(partCol) :+
        posexplode(compiled.violations).as(Seq("constraint_seq", "__graft_viol")): _*)
      .select(keyCols.map(col) :+ col(partCol) :+ col("constraint_seq") :+
        col("__graft_viol.json_pointer").as("json_pointer") :+
        col("__graft_viol.description").as("description") :+
        col("__graft_viol.kind").as("kind"): _*)

    val verdicts = flagged
      .groupBy(col(partCol))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(col("pass"), 0L).otherwise(1L)).as("fail_rows"))
      .withColumn("pass", col("fail_rows") === 0)

    RowCheckOutput(flagged, violations, verdicts)
  }

  /** Single-scan row-level output: one slim projection
    * `(keyCols…, partCol, pass, violations)` with the violation array
    * evaluated ONLY for failing rows (CaseWhen short-circuit keeps passing
    * rows at fail-fast cost). At scale this is THE row pass: write it once
    * (it carries no payload columns), then derive both the violation table
    * (explode) and per-partition verdicts (aggregate) from the written
    * intermediate without ever re-scanning or re-validating the source. */
  def rowOutput(df: DataFrame, spec: SchemaSpec, keyCols: Seq[String],
                partCol: String = "part_id",
                opts: CompileOptions = CompileOptions()): DataFrame = {
    val withPart =
      if (df.columns.contains(partCol)) df
      else df.withColumn(partCol, pmod(hash(col(keyCols.head)), lit(64)))
    val compiled = Compiler.compileRow(spec, df.schema, opts)
    val empty = array().cast(Compiler.violationArrayType)
    withPart.select(keyCols.map(col) :+ col(partCol) :+
      compiled.pass.as("pass") :+
      when(compiled.pass, empty).otherwise(compiled.violations).as("violations"): _*)
  }

  /** Violation rows from a written/cached [[rowOutput]] frame.
    *
    * @param includeLegacyContext also emit the v1.0 `legacy_context` array
    *        (`<root>`, `["prop"]`, `[0]`, … — validation_results.hpp:167-186)
    *        alongside `json_pointer`, derived in the same projection. Off by
    *        default: it duplicates the pointer's information at ~2x the
    *        bytes per row in the sink. */
  def violationsOf(rowOut: DataFrame, keyCols: Seq[String],
                   partCol: String = "part_id",
                   includeLegacyContext: Boolean = false): DataFrame = {
    val base = rowOut.where(!col("pass"))
      .select(keyCols.map(col) :+ col(partCol) :+
        posexplode(col("violations")).as(Seq("constraint_seq", "__graft_viol")): _*)
      .select(keyCols.map(col) :+ col(partCol) :+ col("constraint_seq") :+
        col("__graft_viol.json_pointer").as("json_pointer") :+
        col("__graft_viol.description").as("description") :+
        col("__graft_viol.kind").as("kind"): _*)
    if (includeLegacyContext)
      base.withColumn("legacy_context", graft.Graft.legacyContext(col("json_pointer")))
    else base
  }

  /** Per-partition verdicts (incl. violation counts) from a [[rowOutput]]
    * frame — one hash aggregate, O(partitions) result rows. */
  def verdictsOf(rowOut: DataFrame, partCol: String = "part_id"): DataFrame =
    rowOut.groupBy(col(partCol))
      .agg(
        count(lit(1)).as("rows"),
        sum(when(col("pass"), 0L).otherwise(1L)).as("fail_rows"),
        sum(size(col("violations")).cast("long")).as("violation_count"))
      .withColumn("pass", col("fail_rows") === 0)

  // -------------------------------------------------------------------------
  // Manifest ledger (Iceberg-snapshot stand-in; SURVEY.md §6 hard part 6)
  // -------------------------------------------------------------------------

  /** Append-only ledger of completed partition ids for a run. */
  final class Manifest(dir: String, runId: String) {
    private val path = Paths.get(dir, s"manifest-$runId.txt")
    Files.createDirectories(Paths.get(dir))

    def completed(): Set[Long] =
      if (!Files.exists(path)) Set.empty
      else Files.readAllLines(path).asScala.filter(_.nonEmpty).map(_.toLong).toSet

    def markDone(partIds: Seq[Long]): Unit = {
      val line = partIds.mkString("", "\n", "\n")
      Files.write(path, line.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Filter out partitions recorded as completed — with a storage-level
    * `part_id` partition column this prunes whole directories at scan time.
    * Rows with a NULL part id can never be marked done (the manifest keys
    * by Long), so they must survive the NOT-IN filter explicitly: under
    * SQL three-valued logic `!isin(...)` is NULL for a NULL part id and
    * the rows would silently vanish from every increment after the first. */
  def resume(df: DataFrame, manifest: Manifest, partCol: String = "part_id"): DataFrame = {
    val done = manifest.completed()
    if (done.isEmpty) df
    else df.where(col(partCol).isNull || !col(partCol).isin(done.toSeq: _*))
  }

  /** Run row checks partition-incrementally: validate the remaining
    * partitions, write violations + verdicts, mark them complete. Returns
    * the verdicts of THIS increment.
    *
    * Delivery is AT-LEAST-ONCE per partition: sinks are parquet appends
    * and the manifest is marked only after both writes succeed, so a crash
    * between append and markDone re-emits that increment's rows on retry.
    * Every sink row carries this invocation's `attempt_id` — consumers
    * needing exactly-once keep the latest attempt per part_id (the same
    * honest contract as StreamingDedup's batch_id). Rows with NULL part
    * ids are validated every increment and never marked done. */
  def runResumable(spark: SparkSession, df: DataFrame, spec: SchemaSpec,
                   keyCols: Seq[String], outDir: String, runId: String,
                   partCol: String = "part_id"): DataFrame = {
    val manifest = new Manifest(outDir, runId)
    val remaining = resume(df, manifest, partCol)
    val attemptId = java.util.UUID.randomUUID().toString
    val t0 = System.nanoTime()
    // ONE scan of the source: the slim row output is persisted, and both
    // sinks (violation rows, per-partition verdicts) derive from it.
    val rowOut = rowOutput(remaining, spec, keyCols, partCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      violationsOf(rowOut, keyCols, partCol)
        .withColumn("attempt_id", lit(attemptId))
        .write.mode("append").partitionBy(partCol)
        .parquet(s"$outDir/violations")
      val verdicts = verdictsOf(rowOut, partCol).cache()
      verdicts.withColumn("attempt_id", lit(attemptId))
        .write.mode("append").parquet(s"$outDir/verdicts")
      val doneIds = verdicts.where(col(partCol).isNotNull)
        .select(col(partCol).cast("long")).collect().map(_.getLong(0)).toSeq
      manifest.markDone(doneIds)
      // per-run lineage + metrics line (north rule: "per-partition lineage
      // and metrics logged"); JSONL, one record per increment
      val agg = verdicts.agg(sum("rows"), sum("fail_rows")).head()
      val rows = if (agg.isNullAt(0)) 0L else agg.getLong(0)
      val failRows = if (agg.isNullAt(1)) 0L else agg.getLong(1)
      val metrics = s"""{"run_id":"$runId","attempt_id":"$attemptId",""" +
        s""""partitions":${doneIds.length},""" +
        s""""rows":$rows,"fail_rows":$failRows,""" +
        s""""wall_sec":${(System.nanoTime() - t0) / 1e9},""" +
        s""""part_ids":[${doneIds.sorted.mkString(",")}]}\n"""
      Files.write(Paths.get(outDir, s"metrics-$runId.jsonl"), metrics.getBytes("UTF-8"),
        StandardOpenOption.CREATE, StandardOpenOption.APPEND)
      verdicts
    } finally rowOut.unpersist() // even when a sink write throws
  }
}
