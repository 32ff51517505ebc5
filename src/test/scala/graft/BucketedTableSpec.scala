package graft

import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.io.TranscriptTable

/** Bucketed-storage co-location: conversation-level checks must run with
  * NO shuffle when the table is bucketed by conv_id (the 100 TB design:
  * the engine's only big shuffle disappears at the storage layer). */
class BucketedTableSpec extends SparkTestBase {

  test("bucketed table: conversation aggregates and uniqueness run without Exchange") {
    val turns = TranscriptGen.turns(spark, 500, parts = 4, numParts = 8)
    TranscriptTable.writeBucketed(turns, "turns_bucketed", buckets = 8)

    val sizes = TranscriptTable.conversationSizes(spark, "turns_bucketed")
    val sizesPlan = sizes.queryExecution.executedPlan.toString
    sizesPlan should not include "Exchange"
    sizes.count() shouldBe turns.select("conv_id").distinct().count()

    val dups = TranscriptTable.duplicateKeys(spark, "turns_bucketed")
    val dupsPlan = dups.queryExecution.executedPlan.toString
    dupsPlan should not include "Exchange"
    // same answer as the shuffling path on the raw frame
    dups.count() shouldBe graft.checks.TableChecks
      .uniqueness(turns, Seq("conv_id", "turn_idx")).count()

    spark.sql("DROP TABLE turns_bucketed")
  }
}
