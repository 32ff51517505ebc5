package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.ops.Dedup

/** Streaming incremental deduplication — the continuous form of the
  * append-only production shape ([[graft.ops.Dedup.incrementalNearDups]]):
  * each micro-batch of newly-arrived documents is
  *
  *  1. PROBED against the persisted (band, hash-prefix)-partitioned
  *     MinHash-LSH corpus layout (partition-pruned read — the corpus is
  *     never rescanned), emitting verified near-dup pairs
  *     `(id_a = new doc, id_b = corpus doc, batch_id)` to a parquet sink;
  *  2. APPENDED to the layout, so every later batch dedups against this
  *     one — the corpus grows monotonically with no rebuild.
  *
  * `foreachBatch` is the idiomatic Structured Streaming escape hatch for
  * batch-only operations (partitioned-layout joins and appends) while
  * keeping the SOURCE offsets checkpointed: a restart with the same
  * checkpoint resumes at the first unprocessed file — batches already
  * probed+appended are never re-read (asserted in StreamingSpec).
  *
  * Delivery note (honest contract): the parquet sink and layout append are
  * at-least-once on batch RETRY after a mid-batch crash; the emitted
  * `batch_id` column makes downstream dedup of replayed batches trivial,
  * and a transactional table format would make both writes exactly-once
  * without changing this code's shape.
  *
  * Within-batch recall: because a batch is appended only AFTER it is
  * probed, two near-identical documents arriving in the SAME micro-batch
  * would never be compared by the probe alone (bursty arrivals and the
  * first seed batch especially). `withinBatch = true` (the default) closes
  * that gap by also running the verified self-join on each batch before
  * the append — those pairs are emitted `id_a < id_b`, probe pairs stay
  * `(new doc, corpus doc)`. */
object StreamingDedup {

  private def pairsSchema: StructType = StructType(Seq(
    StructField("id_a", LongType), StructField("id_b", LongType),
    StructField("batch_id", LongType)))

  /** Start the incremental-dedup stream over `docs` (a STREAMING frame with
    * `idCol` and `textCol`). Pairs land in `pairsSink` (parquet, appended
    * per batch); the corpus layout at `lshTablePath` is created by the
    * first batch if absent. */
  def start(docs: DataFrame, idCol: String, textCol: String,
            lshTablePath: String, pairsSink: String, checkpoint: String,
            numHashes: Int = 32, bands: Int = 8,
            jaccardThreshold: Double = 0.5, shingleK: Int = 8,
            maxBucketSize: Int = 256, withinBatch: Boolean = true,
            prefixBuckets: Int = 64): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val dbg = sys.env.contains("GRAFT_SDEDUP_TIMING")
        def tm[T](n: String)(f: => T): T =
          if (!dbg) f else {
            val t0 = System.nanoTime(); val r = f
            System.err.println(f"[sdedup] $n ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
          }
        // normalize+minhash the batch ONCE: probe, intra-batch self-join
        // and the layout append all derive from this pinned (id, norm,
        // sig) frame — the dominant per-increment compute is not repeated
        val base = Dedup.minhashBase(batch, idCol, textCol, numHashes, shingleK)
          .localCheckpoint(false)
        try {
          val pairs =
            if (Dedup.lshTableExists(lshTablePath))
              // probe + (fused) intra-batch self-join: one banded frame,
              // one verification pass — the within pairs come out
              // id_a < id_b, probe pairs (new doc, corpus doc)
              Dedup.incrementalNearDupsFromBase(base, lshTablePath,
                  numHashes, bands, jaccardThreshold, shingleK, maxBucketSize,
                  includeWithinIncrement = withinBatch,
                  prefixBuckets = prefixBuckets)
                .select(col("id_a").cast("long"), col("id_b").cast("long"))
                .withColumn("batch_id", lit(batchId))
            else if (withinBatch)
              // first batch: no corpus to probe, but intra-batch near-dups
              // (the seed batch's blind spot) still need the self-join
              Dedup.minhashNearDupsVerifiedFromBase(base,
                  numHashes, bands, jaccardThreshold, shingleK, maxBucketSize)
                .select(col("id_a").cast("long"), col("id_b").cast("long"))
                .withColumn("batch_id", lit(batchId))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row], pairsSchema)
          tm("pairs_write") { pairs.write.mode("append").parquet(pairsSink) }
          tm("append") { Dedup.appendMinhashLshTableFromBase(base, lshTablePath,
            numHashes, bands, prefixBuckets) }
        } finally { base.unpersist(); () }
      }
      .start()
}
