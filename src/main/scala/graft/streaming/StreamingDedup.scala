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
  * without changing this code's shape. A retry that crashed BETWEEN the
  * append and the offset commit re-probes the batch against its own
  * corpus copy: self-pairs (a document colliding with its replayed twin
  * under the same id) are filtered inside the probe
  * ([[graft.ops.Dedup.incrementalNearDupsFromBase]] joins on `id_a =!=
  * id_b`), and the duplicated layout rows cost storage + bucket-cap
  * headroom but never duplicate emitted pairs (candidate pairs are
  * de-duplicated per batch before verification).
  *
  * Within-batch recall: because a batch is appended only AFTER it is
  * probed, two near-identical documents arriving in the SAME micro-batch
  * would never be compared by the probe alone (bursty arrivals and the
  * first seed batch especially). `withinBatch = true` (the default) closes
  * that gap by also running the verified self-join on each batch before
  * the append — those pairs are emitted `id_a < id_b`, probe pairs stay
  * `(new doc, corpus doc)`. */
object StreamingDedup {

  /** Pairs carry the DOCUMENT id type: a blanket cast("long") silently
    * nulled every non-numeric id (string/UUID document keys), filling the
    * sink with (null, null) rows while the query ran green. */
  private def pairsSchema(idType: org.apache.spark.sql.types.DataType): StructType =
    StructType(Seq(
      StructField("id_a", idType), StructField("id_b", idType),
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
        // sig) frame — the dominant per-increment compute is not repeated.
        // persist, NOT localCheckpoint: unpersist() on a checkpointed
        // Dataset is a no-op (the blocks belong to the checkpoint RDD, not
        // the cache manager), so each batch's blocks lingered until driver
        // GC — storage pressure the finally-block was written to prevent.
        val base = Dedup.minhashBase(batch, idCol, textCol, numHashes, shingleK)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
                .select(col("id_a"), col("id_b"))
                .withColumn("batch_id", lit(batchId))
            else if (withinBatch)
              // first batch: no corpus to probe, but intra-batch near-dups
              // (the seed batch's blind spot) still need the self-join
              Dedup.minhashNearDupsVerifiedFromBase(base,
                  numHashes, bands, jaccardThreshold, shingleK, maxBucketSize)
                .select(col("id_a"), col("id_b"))
                .withColumn("batch_id", lit(batchId))
            else spark.createDataFrame(
              spark.sparkContext.emptyRDD[Row],
              pairsSchema(batch.schema(idCol).dataType))
          tm("pairs_write") { pairs.write.mode("append").parquet(pairsSink) }
          tm("append") { Dedup.appendMinhashLshTableFromBase(base, lshTablePath,
            numHashes, bands, prefixBuckets) }
        } finally { base.unpersist(); () }
      }
      .start()
}
