package graft.data

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic transcript table (BASELINE.json input_hint):
  * `(conv_id string, turn_idx int, role string, text string, tool string,
  * ts timestamp)` + derived `part_id`.
  *
  * Fully distributed generation: `spark.range(numConvs)` → per-conversation
  * length → `explode(sequence(...))`; every value is a pure function of
  * (conv seed, turn_idx), so expected verdicts and violation rows are
  * computable without running the engine (FIXTURES.md §4). No wall-clock,
  * no RNG state — reruns are byte-identical at any parallelism.
  *
  * Skew: ~1/997 conversations are ~2000 turns long (hot keys for the
  * skew-handling paths); the rest are 1-8 turns.
  *
  * Injected violations (rate ≈ 0.1% each, index-addressable):
  *  - out-of-vocab role            (hash(c,t,1) % 1000 == 0) → "narrator"
  *  - empty text                   (hash(c,t,2) % 1000 == 0)
  *  - unknown tool                 (hash(c,t,3) % 1000 == 0) → "tool_zz"
  *  - non-monotone ts              (hash(c,t,4) % 1000 == 0) → -7200s
  *  - duplicate (conv_id,turn_idx) (hash(c,t,5) % 2000 == 0) → row emitted twice
  */
object TranscriptGen {

  val roleVocab: Seq[String] = Seq("system", "user", "assistant", "tool")
  val toolVocab: Seq[String] = (0 until 16).map(i => f"tool_$i%02d")
  val baseEpoch: Long = 1600000000L // fixed, deterministic

  /** Bump on ANY change to the generated data (columns, rates, lengths):
    * Bench keys its /dev/shm input cache on this, so a stale table from an
    * older generator can never be silently benchmarked against. */
  val generatorVersion: Int = 1

  def convs(spark: SparkSession, numConvs: Long, parts: Int = 32): DataFrame = {
    val c = spark.range(0, numConvs, 1, parts).toDF("cid")
    c.withColumn("len",
      when(col("cid") % 997 === 0, lit(2000))
        .otherwise(lit(1) + pmod(hash(col("cid")), lit(8))))
  }

  /** Generate ~`numConvs * 5.5` turns across `parts` input partitions. */
  def turns(spark: SparkSession, numConvs: Long, parts: Int = 32,
            numParts: Int = 64): DataFrame = {
    val base = convs(spark, numConvs, parts)
      .select(col("cid"), explode(sequence(lit(0), col("len") - 1)).as("turn_idx"))
    def h(salt: Int) = pmod(hash(col("cid"), col("turn_idx"), lit(salt)), lit(1000))

    val withCols = base
      .withColumn("conv_id", format_string("c%010d", col("cid")))
      .withColumn("role",
        when(h(1) === 0, lit("narrator"))
          .when(col("turn_idx") === 0, lit("system"))
          .otherwise(element_at(
            typedLit(Seq("user", "assistant", "assistant", "tool")),
            (pmod(col("turn_idx"), lit(4)) + 1).cast("int"))))
      .withColumn("text",
        when(h(2) === 0, lit(""))
          .otherwise(concat_ws(" ", transform(
            sequence(lit(1), lit(3) + pmod(hash(col("cid"), col("turn_idx")), lit(18))),
            i => format_string("tok%04d", pmod(hash(col("cid"), col("turn_idx"), i), lit(5000)))))))
      .withColumn("tool",
        when(col("role") === "tool",
          when(h(3) === 0, lit("tool_zz"))
            .otherwise(element_at(typedLit(toolVocab),
              (pmod(hash(col("cid"), col("turn_idx"), lit(7)), lit(16)) + 1).cast("int"))))
          .otherwise(lit(null).cast("string")))
      .withColumn("ts", timestamp_seconds(
        lit(baseEpoch) + col("cid") * 7200 + col("turn_idx") * 30 -
          when(h(4) === 0, lit(7200L)).otherwise(lit(0L))))
      .withColumn("turn_idx", col("turn_idx").cast("int"))

    // duplicate-key injection: re-emit a deterministic subset
    val dups = withCols.where(pmod(hash(col("cid"), col("turn_idx"), lit(5)), lit(2000)) === 0)
    val all = withCols.unionAll(dups)

    all.select(
      col("conv_id"), col("turn_idx"), col("role"), col("text"), col("tool"), col("ts"),
      pmod(hash(col("conv_id")), lit(numParts)).as("part_id"))
  }

  /** The transcript constraint spec (SURVEY.md §7 step 1): role vocab,
    * non-empty text, non-negative turn_idx, tool naming pattern, tool
    * presence tied to role via `dependencies` — the reference's cross-field
    * mechanism recast over columns. */
  val transcriptSchemaJson: String =
    """{
      "type": "object",
      "required": ["conv_id", "turn_idx", "role", "text", "ts"],
      "properties": {
        "conv_id":  {"type": "string", "pattern": "^c[0-9]{10}$"},
        "turn_idx": {"type": "integer", "minimum": 0},
        "role":     {"type": "string", "enum": ["system", "user", "assistant", "tool"]},
        "text":     {"type": "string", "minLength": 1},
        "tool":     {"type": "string", "pattern": "^tool_[0-9]{2}$"}
      },
      "dependencies": {
        "tool": ["role"]
      }
    }"""
}
