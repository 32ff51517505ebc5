package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Graft
import graft.checks.TableChecks
import graft.data.TranscriptGen

/** Clean scaling measurement: fresh JVM, one parallelism level, N timed
  * repetitions of the full validation pass over a stored table. */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val path = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // size scan splits so the input stage has >= 2 waves at full cores
      .config("spark.sql.files.maxPartitionBytes", sys.env.getOrElse("GRAFT_MAX_PART", "16m"))
      .config("spark.sql.files.openCostInBytes", "1m")
      // shuffle/spill on tmpfs: /dev/vda writeback storms otherwise inject
      // 30-60s stalls into timed runs on this VM
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def step[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val a = f
      System.err.println(f"[step] $label ${(System.nanoTime() - t0) / 1e9}%.2fs")
      a
    }
    val mode = sys.env.getOrElse("GRAFT_PROBE_MODE", "full")
    val keys = Seq("conv_id", "turn_idx")
    val spec = Graft.parseSchema(TranscriptGen.transcriptSchemaJson)
    val rowOutPath = s"/dev/shm/graft-spark/rowout-$cores"
    def pass(): Long = {
      val turns = spark.read.parquet(path)
      // Row-level outputs from ONE scan of the source: the slim
      // (keys, part_id, pass, violations) projection is written once;
      // verdicts AND the violation table derive from the written
      // intermediate (no payload columns, no re-validation).
      step("rowpass") {
        graft.run.Runner.rowOutput(turns, spec, keys)
          .write.mode("overwrite").parquet(rowOutPath)
      }
      val rowOut = spark.read.parquet(rowOutPath)
      val verdicts = graft.run.Runner.verdictsOf(rowOut)
      val rows = step("verdicts")(verdicts.agg(sum("rows")).head().getLong(0))
      step("violations")(graft.run.Runner.violationsOf(rowOut, keys).count())
      if (mode == "full") {
        step("uniqueness")(TableChecks.uniqueness(turns, Seq("conv_id", "turn_idx")).count())
        step("referential")(TableChecks.referentialStatic(turns, "tool", TranscriptGen.toolVocab).count())
        step("stats")(TableChecks.stats(turns, Seq("part_id"), Seq("role", "text", "turn_idx")).count())
        step("drift")(graft.checks.Drift.histogramDF(turns, length(col("text")).cast("double"), 0, 400, 40).count())
      }
      rows
    }
    var rows = 0L
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      rows = pass()
      val t = (System.nanoTime() - t0) / 1e9
      println(f"[scaling] cores=$cores rep=$i rows=$rows time=$t%.2fs thr=${rows / t}%.0f turns/s")
    }
    spark.stop()
  }
}
