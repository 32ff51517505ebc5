package graft

import org.apache.spark.sql.functions._

import graft.ops.Transcripts

/** Transcript-to-training-data operators: conversation rendering and SFT
  * context/response extraction — semantics plus the one-Exchange,
  * bounded-buffer plan shapes that make them skew-safe. */
class TranscriptsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val turns = Seq(
    ("c1", 0, "user", "hi"),
    ("c1", 1, "assistant", "hello"),
    ("c1", 2, "user", null),
    ("c1", 3, "assistant", "bye"),
    ("c2", 0, "user", "solo")
  ).toDF("conv_id", "turn_idx", "role", "text")

  test("renderConversations joins leading turns in order, truncating at maxTurns") {
    val out = Transcripts.renderConversations(turns, "conv_id", "turn_idx",
        "role", "text", maxTurns = 3)
      .orderBy("conv_id").collect()
    out.length shouldBe 2
    val c1 = out(0)
    c1.getString(1) shouldBe "user: hi\nassistant: hello\nuser: " // null text -> empty
    c1.getLong(2) shouldBe 4L // n_turns_total is PRE-truncation
    c1.getLong(3) shouldBe 3L
    c1.getBoolean(4) shouldBe true
    val c2 = out(1)
    c2.getString(1) shouldBe "user: solo"
    c2.getLong(2) shouldBe 1L
    c2.getLong(3) shouldBe 1L
    c2.getBoolean(4) shouldBe false
  }

  test("renderConversations is deterministic under duplicate turn indices") {
    // ties on turn_idx break on (role, text): total order, stable output
    val dup = Seq(("c3", 0, "user", "b"), ("c3", 0, "user", "a"))
      .toDF("conv_id", "turn_idx", "role", "text")
    val doc = Transcripts.renderConversations(dup, "conv_id", "turn_idx",
      "role", "text").collect()(0).getString(1)
    doc shouldBe "user: a\nuser: b"
  }

  test("contextResponsePairs pairs each response with the preceding frame only") {
    val out = Transcripts.contextResponsePairs(turns, "conv_id", "turn_idx",
        "role", "text", contextTurns = 2)
      .orderBy("conv_id", "turn_idx").collect()
    // c1 turn 1: one context turn; c1 turn 3: frame holds turns 1-2;
    // c2 has no assistant turn at all
    out.map(_.getString(0)).toSeq shouldBe Seq("c1", "c1")
    out(0).getString(2) shouldBe "user: hi"
    out(0).getString(3) shouldBe "hello"
    out(0).getLong(4) shouldBe 1L
    out(1).getString(2) shouldBe "assistant: hello\nuser: "
    out(1).getString(3) shouldBe "bye"
    out(1).getLong(4) shouldBe 2L
  }

  test("contextResponsePairs drops responses with no preceding context") {
    val lone = Seq(("c4", 0, "assistant", "unprompted"))
      .toDF("conv_id", "turn_idx", "role", "text")
    Transcripts.contextResponsePairs(lone, "conv_id", "turn_idx",
      "role", "text").count() shouldBe 0L
  }

  test("user columns named like the internal aliases do not collide") {
    // withColumn REPLACES same-named columns: before the __graft_ isolation
    // select, a conv column named _rn silently became the row number (2
    // groups instead of 1) and a role column named _ctx hit an
    // ARRAY<STRING>=STRING analysis error — found by the verify probe
    val t2 = Seq(("c1", 0, "user", "hi"), ("c1", 1, "assistant", "hello"))
      .toDF("_rn", "_total", "_ctx", "doc")
    val r = Transcripts.renderConversations(t2, "_rn", "_total", "_ctx", "doc")
      .collect()
    r.length shouldBe 1
    r(0).getString(1) shouldBe "user: hi\nassistant: hello"
    val p = Transcripts.contextResponsePairs(t2, "_rn", "_total", "_ctx", "doc",
      contextTurns = 2).collect()
    p.length shouldBe 1
    p(0).getString(2) shouldBe "user: hi"
    p(0).getString(3) shouldBe "hello"
  }

  test("both transcript ops are one-Exchange plans") {
    // render: groupBy reuses the window's hash partitioning; pairs: the
    // sliding frame needs no aggregation exchange at all
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange hashpartitioning".r
        .findAllIn(df.queryExecution.executedPlan.toString).length
    exchanges(Transcripts.renderConversations(turns, "conv_id", "turn_idx",
      "role", "text", maxTurns = 3)) shouldBe 1
    exchanges(Transcripts.contextResponsePairs(turns, "conv_id", "turn_idx",
      "role", "text")) shouldBe 1
  }
}
