package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.checks.TableChecks
import graft.data.TranscriptGen
import graft.ops.{Dedup, Similarity, TextAnalysis}

/** Driver contract — one `queries` entry per implemented operator
  * (SURVEY.md §2), with DuckDB-equivalent `oracleSql` where the operator is
  * SQL-expressible. Every query is built through the engine's public APIs
  * (Graft / TableChecks / Dedup / Similarity / TextAnalysis), not ad-hoc
  * DataFrame code, so the oracle verifies the engine itself.
  */
object SparkEntry {

  private def t(dir: String, name: String)(implicit s: SparkSession): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship: full transcript validation (row spec + injected violations)
    * on a synthetic table — driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val turns = TranscriptGen.turns(spark, numConvs = 300, parts = 4, numParts = 8)
    Graft.validate(turns, TranscriptGen.transcriptSchemaJson,
      Seq("conv_id", "turn_idx")).violations
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- constraint validation (§2.1, leaf predicates as Catalyst exprs) ---

    "q_enum_violations" -> ((s, dir) => { implicit val sp = s
      Graft.violations(t(dir, "orders"),
        """{"properties":{"o_orderstatus":{"enum":["O","F"]}}}""",
        Seq("o_orderkey"), kinds = Seq("enum"))
    }),

    "q_range_violations" -> ((s, dir) => { implicit val sp = s
      Graft.violations(t(dir, "lineitem"),
        """{"properties":{"l_quantity":{"minimum":1,"maximum":25}}}""",
        Seq("l_orderkey", "l_linenumber"), kinds = Seq("minimum", "maximum"))
    }),

    "q_const_violations" -> ((s, dir) => { implicit val sp = s
      Graft.violations(t(dir, "lineitem"),
        """{"properties":{"l_linestatus":{"const":"O"}}}""",
        Seq("l_orderkey", "l_linenumber"), kinds = Seq("const"))
    }),

    "q_pattern_violations" -> ((s, dir) => { implicit val sp = s
      Graft.violations(t(dir, "part"),
        """{"properties":{"p_brand":{"pattern":"Brand#1[0-9]"}}}""",
        Seq("p_partkey"), kinds = Seq("pattern"))
    }),

    "q_length_violations" -> ((s, dir) => { implicit val sp = s
      Graft.violations(t(dir, "documents"),
        """{"properties":{"text":{"minLength":150}}}""",
        Seq("doc_id"), kinds = Seq("minLength"))
    }),

    "q_format_date_violations" -> ((s, dir) => { implicit val sp = s
      // derived RFC3339 date strings, some out of Gregorian range — the
      // format machinery (regex + day-range, VV:388-445) does the work
      val df = t(dir, "orders").withColumn("d",
        format_string("%04d-%02d-%02d", lit(2023), month(col("o_orderdate")),
          dayofmonth(col("o_orderdate")) + lit(21)))
      Graft.violations(df, """{"properties":{"d":{"format":"date"}}}""",
        Seq("o_orderkey", "d"), kinds = Seq("format"))
    }),

    // --- cross-field (§2.2 dependencies / §2.4 conditional) ---

    "q_crossfield_violations" -> ((s, dir) => { implicit val sp = s
      Graft.violations(t(dir, "events"),
        """{"if":{"properties":{"event_type":{"const":"purchase"}},"required":["event_type"]},
            "then":{"properties":{"value":{"maximum":300}}}}""",
        Seq("event_id"), kinds = Seq("conditional"))
    }),

    // --- table-level checks (north rule: uniqueness / referential / stats) ---

    "q_json_validate" -> ((s, dir) => { implicit val sp = s
      // fully-dynamic path: events.props validated as arbitrary JSON
      // documents through the VariantType compiler
      val out = Graft.validateJsonColumn(t(dir, "events"), "props",
        """{"type":"object","required":["k"],
            "properties":{"k":{"type":"integer","minimum":0,"maximum":50}}}""")
      // no pass-filter before the explode: predicate pushdown would clone
      // the parse into every CASE branch of the condition; exploding the
      // violations array emits zero rows for passing documents anyway
      out.select(col("event_id"), explode(col("violations")).as("v"))
        .where(col("v.kind") === "maximum")
        .select(col("event_id"), col("v.json_pointer").as("json_pointer"),
          col("v.description").as("description"))
    }),

    "q_uniqueness" -> ((s, dir) => { implicit val sp = s
      TableChecks.uniqueness(t(dir, "orders"), Seq("o_custkey"))
    }),

    "q_referential" -> ((s, dir) => { implicit val sp = s
      // customers with no events — broadcast anti-join against the
      // distinct user vocabulary
      TableChecks.referential(t(dir, "customer").select("c_custkey"),
        "c_custkey", t(dir, "events").select(col("user_id")), "user_id")
    }),

    "q_stats" -> ((s, dir) => { implicit val sp = s
      t(dir, "lineitem").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").isNull, 1L).otherwise(0L)).as("qty_nulls"),
        round(min(col("l_quantity")), 6).as("qty_min"),
        round(max(col("l_quantity")), 6).as("qty_max"),
        round(avg(col("l_quantity")), 6).as("qty_avg"),
        round(sum(col("l_extendedprice")), 2).as("price_sum"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    }),

    "q_group_size" -> ((s, dir) => { implicit val sp = s
      // conversation-size check recast over events/user (minItems at group
      // level): users with more than 72 events
      t(dir, "events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .where(col("n_events") > 72)
    }),

    "q_monotone_value" -> ((s, dir) => { implicit val sp = s
      // per-group ordered-sequence monotonicity (the ts-monotonicity
      // operator shape, applied to events.value ordered by event_id)
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      t(dir, "events").withColumn("_prev", lag(col("value"), 1).over(w))
        .where(col("_prev").isNotNull && col("value") < col("_prev"))
        .select(col("event_id"))
    }),

    "q_window_first" -> ((s, dir) => { implicit val sp = s
      // stable per-group ordering (row_number over (user, ts, id)) — the
      // turn-ordering primitive for transcripts
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(dir, "events").withColumn("rn", row_number().over(w))
        .where(col("rn") === 1).select(col("user_id"), col("event_id"))
    }),

    "q_agg_pushdown" -> ((s, dir) => { implicit val sp = s
      // TPC-H Q1-style hash aggregate (partial+final)
      t(dir, "lineitem").groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base"),
          count(lit(1)).as("cnt"))
    }),

    "q_join_broadcast" -> ((s, dir) => { implicit val sp = s
      // orders ⋈ customer ⋈ nation with small dims broadcast
      t(dir, "orders")
        .join(broadcast(t(dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
    }),

    "q_json_extract" -> ((s, dir) => { implicit val sp = s
      t(dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(avg(col("k")), 6).as("k_avg"))
    }),

    // --- dedup / text analysis / similarity (pipeline ops) ---

    "q_dedup_exact" -> ((s, dir) => { implicit val sp = s
      t(dir, "documents")
        .groupBy(regexp_replace(lower(trim(col("text"))), "\\s+", " ").as("norm"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_count"))
        .select("doc_id", "dup_count")
    }),

    "q_token_counts" -> ((s, dir) => { implicit val sp = s
      t(dir, "documents").select(col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_tokens"))
    }),

    "q_quality" -> ((s, dir) => { implicit val sp = s
      TextAnalysis.qualityFeatures(t(dir, "documents"), "text")
        .select(col("doc_id"), col("q_n_chars").cast("long").as("q_n_chars"),
          col("q_n_words").cast("long").as("q_n_words"),
          round(col("q_mean_word_len"), 6).as("mean_word_len"))
    }),

    "q_langid" -> ((s, dir) => { implicit val sp = s
      // n-gram/stopword language id (no SQL oracle: rows-only check)
      t(dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("pred_lang"))
    }),

    "q_minhash_neardups" -> ((s, dir) => { implicit val sp = s
      // MinHash-LSH near-dup candidates (no SQL oracle: rows-only check)
      Dedup.minhashNearDups(t(dir, "documents"), "doc_id", "text",
        numHashes = 32, bands = 8, jaccardThreshold = 0.5)
    }),

    "q_simhash_neardups" -> ((s, dir) => { implicit val sp = s
      Dedup.simhashNearDups(t(dir, "documents"), "doc_id", "text", maxHamming = 3)
    }),

    "q_ann_topk" -> ((s, dir) => { implicit val sp = s
      val q = t(dir, "embeddings").where(col("vec_id") === 0)
        .head().getSeq[Float](1)
      Similarity.bruteForceTopK(t(dir, "embeddings"), "vec_id", "embedding", q, 10)
        .select("vec_id")
    }),

    "q_transcript_validation" -> ((s, dir) => { implicit val sp = s
      // full engine run over the synthetic transcript table (no SQL oracle:
      // rows-only check; correctness asserted by golden tests in sbt test)
      val turns = TranscriptGen.turns(s, numConvs = 2000, parts = 8, numParts = 16)
      Graft.validate(turns, TranscriptGen.transcriptSchemaJson,
        Seq("conv_id", "turn_idx")).violations
        .select("conv_id", "turn_idx", "json_pointer", "description", "kind")
    })
  )

  /** DuckDB-equivalent SQL per query (driver compares row/schema/hash). */
  def oracleSql: Map[String, String] = Map(
    "q_enum_violations" ->
      """SELECT o_orderkey, '/o_orderstatus' AS json_pointer,
                'Failed to match against any enum values.' AS description
         FROM orders WHERE o_orderstatus NOT IN ('O','F')""",

    "q_range_violations" ->
      """SELECT l_orderkey, l_linenumber, '/l_quantity' AS json_pointer,
                'Expected number less than or equal to 25.000000' AS description
         FROM lineitem WHERE NOT (l_quantity <= 25)
         UNION ALL
         SELECT l_orderkey, l_linenumber, '/l_quantity' AS json_pointer,
                'Expected number greater than or equal to 1.000000' AS description
         FROM lineitem WHERE NOT (l_quantity >= 1)""",

    "q_const_violations" ->
      """SELECT l_orderkey, l_linenumber, '/l_linestatus' AS json_pointer,
                'Failed to match expected value set by ''const'' constraint.' AS description
         FROM lineitem WHERE l_linestatus <> 'O'""",

    "q_pattern_violations" ->
      """SELECT p_partkey, '/p_brand' AS json_pointer,
                'Failed to match regex specified by ''pattern'' constraint.' AS description
         FROM part WHERE NOT regexp_matches(p_brand, 'Brand#1[0-9]')""",

    "q_length_violations" ->
      """SELECT doc_id, '/text' AS json_pointer,
                'String should be no fewer than 150 characters in length.' AS description
         FROM documents WHERE length(text) < 150""",

    "q_format_date_violations" ->
      """SELECT o_orderkey,
                printf('%04d-%02d-%02d', 2023, month(o_orderdate), day(o_orderdate) + 21) AS d,
                '/d' AS json_pointer,
                'String should be a valid date' AS description
         FROM orders
         WHERE try_cast(printf('%04d-%02d-%02d', 2023, month(o_orderdate), day(o_orderdate) + 21) AS DATE) IS NULL""",

    "q_crossfield_violations" ->
      """SELECT event_id, '' AS json_pointer,
                'Failed to validate against a conditional schema set by if-then-else constraints.' AS description
         FROM events WHERE event_type = 'purchase' AND NOT (value <= 300)""",

    "q_json_validate" ->
      """SELECT event_id, '/k' AS json_pointer,
                'Expected number less than or equal to 50.000000' AS description
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50""",

    "q_uniqueness" ->
      """SELECT o_custkey, count(*) AS cnt FROM orders
         GROUP BY o_custkey HAVING count(*) > 1""",

    "q_referential" ->
      """SELECT c_custkey FROM customer
         WHERE c_custkey NOT IN (SELECT user_id FROM events)""",

    "q_stats" ->
      """SELECT count(*) AS n_rows,
                count(*) FILTER (WHERE l_quantity IS NULL) AS qty_nulls,
                round(min(l_quantity), 6) AS qty_min,
                round(max(l_quantity), 6) AS qty_max,
                round(avg(l_quantity), 6) AS qty_avg,
                round(sum(l_extendedprice), 2) AS price_sum,
                count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem""",

    "q_group_size" ->
      """SELECT user_id, count(*) AS n_events FROM events
         GROUP BY user_id HAVING count(*) > 72""",

    "q_monotone_value" ->
      """SELECT event_id FROM (
           SELECT event_id, value,
                  lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
           FROM events) WHERE pv IS NOT NULL AND value < pv""",

    "q_window_first" ->
      """SELECT user_id, event_id FROM (
           SELECT user_id, event_id,
                  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
           FROM events) WHERE rn = 1""",

    "q_agg_pushdown" ->
      """SELECT l_returnflag, l_linestatus,
                round(sum(l_quantity), 2) AS sum_qty,
                round(sum(l_extendedprice), 2) AS sum_base,
                count(*) AS cnt
         FROM lineitem GROUP BY l_returnflag, l_linestatus""",

    "q_join_broadcast" ->
      """SELECT n_name, count(*) AS n_orders, round(sum(o_totalprice), 2) AS revenue
         FROM orders JOIN customer ON o_custkey = c_custkey
                     JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name""",

    "q_json_extract" ->
      """SELECT event_type, count(*) AS n,
                round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 6) AS k_avg
         FROM events GROUP BY event_type""",

    "q_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dup_count FROM documents
         GROUP BY regexp_replace(lower(trim(text)), '\s+', ' ', 'g')""",

    "q_token_counts" ->
      """SELECT doc_id, CASE WHEN trim(text) = '' THEN 0
                ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_tokens
         FROM documents""",

    "q_quality" ->
      """SELECT doc_id,
                length(text) AS q_n_chars,
                CASE WHEN trim(text) = '' THEN 0
                     ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS q_n_words,
                round(length(text)::DOUBLE /
                      len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_word_len
         FROM documents""",

    "q_ann_topk" ->
      """SELECT vec_id FROM (
           SELECT vec_id, list_cosine_similarity(embedding,
                  (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS c
           FROM embeddings ORDER BY c DESC, vec_id LIMIT 10)"""
  )
}
