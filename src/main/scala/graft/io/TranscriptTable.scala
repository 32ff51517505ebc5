package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage facade for the transcript table (SURVEY.md §1.3): Hive-style
  * partitioned/bucketed parquet as the Iceberg stand-in (this image ships
  * no Iceberg jars; the facade keeps call sites format-agnostic so Iceberg
  * slots in unchanged where available).
  *
  * Scale design: bucket by `conv_id`, sort buckets by (conv_id, turn_idx).
  * Every conversation-level operation — per-conversation aggregates,
  * turn-order windows, (conv_id, turn_idx) uniqueness — then reads
  * pre-co-located, pre-sorted buckets and runs WITHOUT a shuffle (no
  * Exchange in the plan; asserted in PlanSpec). At 10^12 turns this
  * removes the single largest data movement of a validation run.
  */
object TranscriptTable {

  /** Write as a bucketed, sorted table registered in the session catalog. */
  def writeBucketed(df: DataFrame, table: String, buckets: Int = 64,
                    partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite")
      .bucketBy(buckets, "conv_id")
      .sortBy("conv_id", "turn_idx")
      .format("parquet")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .saveAsTable(table)
  }

  def read(spark: SparkSession, table: String): DataFrame = spark.table(table)

  /** Per-conversation turn counts over a bucketed table — shuffle-free. */
  def conversationSizes(spark: SparkSession, table: String): DataFrame =
    read(spark, table).groupBy(col("conv_id")).agg(count(lit(1)).as("n_turns"))

  /** (conv_id, turn_idx) duplicate keys over a bucketed table — the
    * uniqueness check with no Exchange (bucket join pruning). */
  def duplicateKeys(spark: SparkSession, table: String): DataFrame =
    read(spark, table).groupBy(col("conv_id"), col("turn_idx"))
      .agg(count(lit(1)).as("cnt")).where(col("cnt") > 1)
}
