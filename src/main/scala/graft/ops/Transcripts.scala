package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Transcript-to-training-data preparation over the engine's own input
  * shape (SURVEY.md §1.3: conv_id, turn_idx, role, text, tool, ts) — the
  * step a corpus pipeline runs AFTER validation: turning multi-turn
  * conversations into flat documents / SFT pairs.
  *
  * Both operators follow the skew discipline the per-conversation checks
  * settled on (checks/TableChecks.scala:88): one hash exchange on the
  * conversation key feeds a spillable window sort, and no aggregation
  * buffer is ever allowed to grow with the conversation — bounds come
  * from `maxTurns` (rows dropped BEFORE the collect) or from the window
  * frame itself. A 10^7-turn hot conversation costs disk spill, never an
  * executor OOM.
  *
  * Turn order everywhere is the TOTAL order (turnCol, roleCol, textCol):
  * stable under duplicate turn indices, so output is deterministic under
  * any partitioning and any Spark task schedule.
  */
object Transcripts {

  /** Isolation boundary against user-column collisions (the Runner
    * `__graft_` convention): AFTER this select the frame holds exactly
    * these four columns, so the internal `_rn`/`_total`/`_ctx` aliases
    * below can never silently replace or shadow a user column named the
    * same way (withColumn REPLACES same-named columns — a user `_rn`
    * turn column would otherwise corrupt the group key, not error). */
  private def canonical(df: DataFrame, convCol: String, turnCol: String,
                        roleCol: String, textCol: String): DataFrame =
    df.select(col(convCol).as("__graft_conv"), col(turnCol).as("__graft_turn"),
      col(roleCol).as("__graft_role"), col(textCol).as("__graft_text"))

  private def renderTurn: Column =
    concat(coalesce(col("__graft_role").cast("string"), lit("")), lit(": "),
      coalesce(col("__graft_text").cast("string"), lit("")))

  /** Render each conversation into ONE flat training document — turns in
    * order as "role: text" lines (null role/text rendered empty), keeping
    * at most `maxTurns` leading turns.
    *
    * Scale shape: a single Exchange on `convCol` (PlanSpec-asserted). The
    * window sort spills (UnsafeExternalSorter); the partition-wide count
    * frame buffers rows in an ExternalAppendOnlyUnsafeRowArray, which
    * ALSO spills; and the `collect_list` runs only over rows already
    * filtered to `_rn <= maxTurns`, so its per-group ArrayBuffer — the
    * one structure here that cannot spill within a group — is bounded by
    * maxTurns regardless of key skew. The groupBy reuses the window's
    * hash partitioning.
    *
    * Returns one row per conversation: convCol, `doc`, `n_turns_total`
    * (pre-truncation), `n_turns_kept`, `truncated`. */
  def renderConversations(df: DataFrame, convCol: String, turnCol: String,
                          roleCol: String, textCol: String,
                          maxTurns: Int = 1024, sep: String = "\n"): DataFrame = {
    require(maxTurns >= 1, s"maxTurns must be >= 1, got $maxTurns")
    val w = Window.partitionBy(col("__graft_conv"))
      .orderBy(col("__graft_turn"), col("__graft_role"), col("__graft_text"))
    canonical(df, convCol, turnCol, roleCol, textCol)
      .withColumn("_rn", row_number().over(w))
      .withColumn("_total",
        count(lit(1)).over(Window.partitionBy(col("__graft_conv"))))
      .where(col("_rn") <= maxTurns)
      .groupBy(col("__graft_conv"))
      .agg(
        concat_ws(sep, transform(
          sort_array(collect_list(struct(col("_rn"), renderTurn.as("_t")))),
          x => x.getField("_t"))).as("doc"),
        max(col("_total")).as("n_turns_total"),
        count(lit(1)).as("n_turns_kept"))
      .withColumn("truncated", col("n_turns_total") > col("n_turns_kept"))
      .withColumnRenamed("__graft_conv", convCol)
  }

  /** Extract SFT (context → response) pairs: one row per turn whose role
    * is `responseRole`, paired with the up-to-`contextTurns` immediately
    * preceding turns rendered as the context document. Response turns with
    * NO preceding context are dropped (nothing to condition on).
    *
    * Scale shape: a single Exchange on `convCol` and a SLIDING window
    * frame (`rowsBetween(-contextTurns, -1)`) — per-row state is bounded
    * by the frame length, so this is skew-safe without any maxTurns cap:
    * the collect never sees more than `contextTurns` rows no matter how
    * long the conversation is. Everything after the window is a codegen'd
    * projection + filter. */
  def contextResponsePairs(df: DataFrame, convCol: String, turnCol: String,
                           roleCol: String, textCol: String,
                           contextTurns: Int = 4,
                           responseRole: String = "assistant",
                           sep: String = "\n"): DataFrame = {
    require(contextTurns >= 1, s"contextTurns must be >= 1, got $contextTurns")
    val frame = Window.partitionBy(col("__graft_conv"))
      .orderBy(col("__graft_turn"), col("__graft_role"), col("__graft_text"))
      .rowsBetween(-contextTurns.toLong, -1L)
    canonical(df, convCol, turnCol, roleCol, textCol)
      .withColumn("_ctx", collect_list(renderTurn).over(frame))
      .where(col("__graft_role") === responseRole && size(col("_ctx")) >= 1)
      .select(col("__graft_conv").as(convCol), col("__graft_turn").as(turnCol),
        concat_ws(sep, col("_ctx")).as("context"),
        coalesce(col("__graft_text").cast("string"), lit("")).as("response"),
        size(col("_ctx")).cast("long").as("n_context_turns"))
  }
}
