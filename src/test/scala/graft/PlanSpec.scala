package graft

import org.apache.spark.sql.functions._

import graft.data.TranscriptGen
import graft.ops.Similarity
import graft.run.Runner
import graft.spec.SpecParser

/** Physical-plan quality gates — the 100 TB design assertions, checked on
  * every build (SURVEY.md §4): pushdown, pruning, broadcast, top-k without
  * global sort, shuffle-free row validation, whole-stage codegen. */
class PlanSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  /** Plan AFTER running it: AQE-wrapped plans (anything with an exchange)
    * only expose codegen stage markers and final join strategies once the
    * adaptive plan is finalized by an execution. */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    // keep only the final adaptive plan: the string repeats the whole tree
    // under "== Initial Plan ==", which would double node counts
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("filters and column selection reach the parquet scan") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .where(col("l_quantity") > 40)
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    scan should include("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,40.0)]")
    scan should include("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")
  }

  test("fail-fast row validation pushes the violation filter to the scan and stays shuffle-free") {
    val spec = SpecParser.parse("""{"properties":{"l_quantity":{"maximum":25}}}""")
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = Runner.rowChecks(df, spec, Seq("l_orderkey"))
    val vPlan = plan(out.violations)
    // no shuffle anywhere in the violation scan
    vPlan should not include "Exchange"
    // the !pass conjunct is pushed into the parquet scan as a data filter
    vPlan should include("DataFilters: [isnotnull(l_quantity")
    // only the 2 referenced columns are read
    vPlan should include("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")
    vPlan should include("*(1)") // whole-stage codegen stage marker
  }

  test("small-dimension joins broadcast (no shuffle join)") {
    val q = SparkEntry.queries("q_join_broadcast")
    val p = plan(q(spark, sf))
    p should include("BroadcastHashJoin")
    p should not include "SortMergeJoin"
  }

  test("referential anti-join broadcasts the vocabulary side") {
    val q = SparkEntry.queries("q_referential")
    val p = plan(q(spark, sf))
    p should include("BroadcastHashJoin")
    p should include("LeftAnti")
  }

  test("brute-force top-k compiles to TakeOrderedAndProject (no global sort)") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val q = embs.limit(1).collect()(0).getSeq[Float](1)
    val p = plan(Similarity.bruteForceTopK(embs, "vec_id", "embedding", q, 10))
    p should include("TakeOrderedAndProject")
    p should not include "Exchange rangepartitioning"
  }

  test("vocabulary extraction: partial-agg shuffle + TakeOrderedAndProject, no global sort") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.ops.TextAnalysis.vocabulary(docs, "text", minCount = 5L, topK = 100))
    p should include("partial_count")      // map-side combine before the shuffle
    p should include("TakeOrderedAndProject")
    p should not include "Exchange rangepartitioning"
  }

  test("dynamic JSON validation stays inside whole-stage codegen (ValidateJsonExpr doGenCode)") {
    val q = SparkEntry.queries("q_json_validate")
    val p = finalPlan(q(spark, sf))
    p should include("*(") // whole-stage codegen span covers the validate stage
    // only the single-row-group resplit exchange (round-robin), no keyed
    // shuffle anywhere
    p should include("RoundRobinPartitioning")
    p should not include "Exchange hashpartitioning"
    p should not include "Exchange rangepartitioning"
    // the document walk runs ONCE per row: non-determinism forbids the
    // optimizer from cloning it into a scan-side inferred filter (r6)
    p.sliding("validatejsonexpr".length).count(_ == "validatejsonexpr") shouldBe 1
  }

  test("single-scan row output: slim projection is shuffle-free, pruned, codegen'd") {
    val spec = SpecParser.parse("""{"properties":{"l_quantity":{"maximum":25}}}""")
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
    val out = Runner.rowOutput(df, spec, Seq("l_orderkey"))
    val p = plan(out)
    p should not include "Exchange"
    p should include("*(1)")
    // only the key + referenced constraint column are read from the source
    p should include("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>")
  }

  test("new constraint queries stay shuffle-free and codegen'd") {
    for (q <- Seq("q_multipleof_int", "q_allof", "q_image_meta",
                  "q_video_meta", "q_metaschema")) {
      val p = plan(SparkEntry.queries(q)(spark, sf))
      withClue(q) {
        p should not include "Exchange"
        p should include("*(1)")
      }
    }
    // CPU-heavy queries over the single-row-group fixtures carry exactly
    // ONE round-robin resplit exchange (guide §2.5) and nothing else; the
    // dynamic ones additionally evaluate the document walk ONCE per row
    for (q <- Seq("q_type_violations", "q_items_tuple", "q_propertynames",
                  "q_uniqueitems_row", "q_custom_keyword")) {
      val p = finalPlan(SparkEntry.queries(q)(spark, sf))
      withClue(q) {
        p should include("RoundRobinPartitioning")
        p should not include "Exchange hashpartitioning"
        p should not include "Exchange rangepartitioning"
        p should include("*(")
        if (p.contains("validatejsonexpr"))
          p.sliding("validatejsonexpr".length)
            .count(_ == "validatejsonexpr") shouldBe 1
      }
    }
  }

  test("IVF top-k prunes by cell and avoids a global sort") {
    val p = plan(SparkEntry.queries("q_ann_ivf")(spark, sf))
    p should include("TakeOrderedAndProject")
    p should not include "Exchange rangepartitioning"
    // the optimizer collapses the ivf_cell column into the pruning filter;
    // since the NULL-cell validity guard the cell expression is a CASE
    // WHEN, so the filter reads `... END IN (…)` (was `.cell IN (`)
    p should (include(".cell IN (") or include("END IN ("))
  }

  test("bucketed IVF table probe prunes partitions at the scan (PartitionFilters on ivf_cell)") {
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val cents = embs.where(col("vec_id") < 4).orderBy("vec_id")
      .collect().map(_.getSeq[Float](1).toSeq).toSeq
    val q = embs.where(col("vec_id") === 1).head().getSeq[Float](1)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Similarity.writeIvfTable(embs, "vec_id", "embedding", cents, dir)
    val probe = Similarity.ivfTopKFromTable(spark, dir, "vec_id", "embedding",
      cents, q, 5, nprobe = 2)
    // the cell filter is a PARTITION filter: directory pruning, not row filtering
    val leaves = probe.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    leaves should include("PartitionFilters: ")
    leaves should include("ivf_cell")
    // and the probe result matches the scan-time (non-persisted) IVF path
    val direct = Similarity.ivfTopK(embs, "vec_id", "embedding", cents, q, 5, nprobe = 2)
      .collect().map(_.getLong(0)).toSeq
    probe.collect().map(_.getLong(0)).toSeq shouldBe direct
    // LSH layout: same pruning contract on the signature directories
    val lshDir = java.nio.file.Files.createTempDirectory("graft-lsh").toString
    Similarity.writeLshTable(embs, "vec_id", "embedding", q.length, planes = 6,
      seed = 42, path = lshDir)
    val lshProbe = Similarity.lshTopKFromTable(spark, lshDir, "vec_id", "embedding",
      q, 5, planes = 6, seed = 42)
    val lshLeaves = lshProbe.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    lshLeaves should include("PartitionFilters: ")
    lshLeaves should include("lsh_sig")
    lshProbe.collect().map(_.getLong(0)).toSeq shouldBe
      Similarity.lshTopK(embs, "vec_id", "embedding", q, 5, planes = 6, seed = 42)
        .collect().map(_.getLong(0)).toSeq
  }

  test("incremental dedup probe prunes the persisted LSH layout by (band, bhp) directories") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val dir = java.nio.file.Files.createTempDirectory("graft-inclsh-plan").toString
    graft.ops.Dedup.writeMinhashLshTable(
      docs.where(col("doc_id") % 10 =!= 0), "doc_id", "text", dir)
    val probe = graft.ops.Dedup.incrementalNearDups(
      docs.where(col("doc_id") % 10 === 0), "doc_id", "text", dir)
    val leaves = probe.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    // the (band*64+bhp) IN (...) predicate references only partition columns
    // → planning-time directory pruning, the corpus data files are untouched
    leaves should include("PartitionFilters: ")
    leaves should include("band")
    leaves should include("bhp")
  }

  test("multimodal plumbing query: no cartesian product, bounded shuffles") {
    val p = plan(SparkEntry.queries("q_multimodal")(spark, sf))
    p should not include "CartesianProduct"
    p.sliding("Exchange".length).count(_ == "Exchange") should be <= 4
  }

  test("exactGroups: bounded ids, window + groupBy share one exchange") {
    import spark.implicits._
    val df = (1L to 50L).map(i => (i, if (i <= 40) "same text" else s"uniq $i"))
      .toDF("doc_id", "text")
    val g = graft.ops.Dedup.exactGroups(df, "doc_id", "text", maxIds = 8)
    // the row_number window and the groupBy hash-aggregate both partition
    // on _fp — Catalyst must NOT insert a second shuffle between them
    plan(g).sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    val rows = g.collect()
    rows.length shouldBe 1
    rows.head.getAs[Long]("dup_count") shouldBe 40L     // full multiplicity
    rows.head.getAs[Seq[Long]]("ids") shouldBe (1L to 8L) // capped, smallest-first
  }

  test("duplicateSpans: island window + span groupBy share the doc exchange") {
    import spark.implicits._
    val df = (1L to 40L).map(i => (i, s"shared eight word window text block here now uniq$i"))
      .toDF("doc_id", "text")
    val g = graft.ops.Dedup.duplicateSpans(df, "doc_id", "text")
    val p = plan(g)
    p should not include "CartesianProduct"
    // three shuffles end-to-end: dup-key hash-agg on _h, the mark-join's
    // exchange, and ONE doc-keyed exchange feeding both the islands window
    // sort and the span aggregate (Catalyst must reuse the partitioning)
    p.sliding("Exchange".length).count(_ == "Exchange") should be <= 4
  }

  test("conversationChecks computes all three flags in a single exchange") {
    val turns = TranscriptGen.turns(spark, 100, parts = 2, numParts = 4)
    val p = plan(graft.checks.TableChecks.conversationChecks(turns))
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
  }

  test("q_drift_ks: pairs side broadcasts, no cartesian product") {
    val df = SparkEntry.queries("q_drift_ks")(spark, sf)
    df.collect() // finalize the adaptive plan before asserting its shape
    val p = df.queryExecution.executedPlan.toString
    // the 2-row sketch-pairs side must join by broadcast, never cartesian
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("transcript validation end-to-end plan: one shuffle for verdicts only") {
    val turns = TranscriptGen.turns(spark, 100, parts = 2, numParts = 4)
    val spec = SpecParser.parse(TranscriptGen.transcriptSchemaJson)
    val out = Runner.rowChecks(turns, spec, Seq("conv_id", "turn_idx"))
    // flagged scan is shuffle-free
    plan(out.flagged) should not include "Exchange"
    // verdicts shuffle exactly once (partial -> final hash aggregate)
    val vp = plan(out.partitionVerdicts)
    vp.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    vp should include("HashAggregate")
  }

  test("suggestion enum melt plans as partial-aggregated hash agg, never collect_set") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val p = plan(graft.checks.Suggest.meltValueCounts(docs,
      Seq("lang" -> col("lang"), "source" -> col("source"))))
    // map-side combine before the one exchange: a high-cardinality column
    // yields more small agg rows, never a per-column buffer
    p should include("partial_count")
    p.sliding("Exchange".length).count(_ == "Exchange") shouldBe 1
    p should not include "collect_set"
    p should not include "ObjectHashAggregate"
  }

  test("snapshot-delta validation reads ONLY the added files") {
    val dir = java.nio.file.Files.createTempDirectory("graft-plan-delta").toString
    val log = new graft.io.SnapshotLog(s"$dir/log")
    import spark.implicits._
    (0 until 50).toDF("v").write.parquet(s"$dir/a")
    (50 until 80).toDF("v").write.parquet(s"$dir/b")
    log.commitAppend(Seq(s"$dir/a"))
    log.commitAppend(Seq(s"$dir/b"))
    val spec = SpecParser.parse("""{"properties":{"v":{"maximum":60}}}""")
    val out = Runner.validateDelta(spark, log, 0, 1, spec, Seq("v")).get
    // input-file-level isolation: the v0 slice is never opened
    val files = out.flagged.inputFiles
    files should not be empty
    files.foreach(f => f should include("/b/"))
  }
}
