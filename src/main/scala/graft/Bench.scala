package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.data.TranscriptGen

/** Benchmark main.
  *
  * Two parts, one JSON line out:
  *  1. per-query wall times over `SPARK_GRAFT_SF_DIR` at `SPARK_GRAFT_CPUS`
  *  2. the headline validation-throughput metric (BASELINE.md): the full
  *     transcript constraint pass (row checks + uniqueness + referential +
  *     stats) over a deterministic synthetic table, run at TWO parallelism
  *     levels (local[N] and local[4N]) on identical input — the in-sandbox
  *     stand-in for the north rule's N vs 4N executor scaling criterion.
  *     Reports turns/sec at both levels and scaling efficiency
  *     (T_N / T_4N) / 4.
  */
object Bench {

  private def newSession(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // scan-split sizing: keep >=2 waves of input tasks at full cores
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full validation pass over a stored transcript table; returns
    * validated turn count. This is the engine under test: row constraint
    * scan (fail-fast + violations for failures), key uniqueness,
    * tool-vocabulary referential check, per-partition stats — reading from
    * parquet like a real run. */
  private def validationPass(spark: SparkSession, path: String): Long = {
    import graft.checks.TableChecks
    val turns = spark.read.parquet(path)
    val res = Graft.validate(turns, TranscriptGen.transcriptSchemaJson,
      Seq("conv_id", "turn_idx"))
    val rows = res.partitionVerdicts.agg(sum("rows")).head().getLong(0)
    res.violations.count()
    TableChecks.uniqueness(turns, Seq("conv_id", "turn_idx")).count()
    TableChecks.referentialStatic(turns, "tool", TranscriptGen.toolVocab).count()
    TableChecks.stats(turns, Seq("part_id"), Seq("role", "text", "turn_idx")).count()
    rows
  }

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "2000000").toLong

    // --- part 1: per-query times on the sf dir at full parallelism ---------
    val spark = newSession(cpus)
    def runOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Long =
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[bench] QUERY FAILED $name: ${e.getMessage}"); -1L }
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, warm) = time(runOnce(name, fn))
      val (_, t) = time(runOnce(name, fn))
      System.err.println(f"[bench] $name: warm=$warm%.2fs timed=$t%.2fs")
      name -> math.min(warm, t)
    }

    // --- part 2: scaling run (same stored input, N vs 4N cores) ------------
    // materialize the synthetic table once (untimed) — the engine under
    // test reads from parquet, like a real run against the lake
    val benchPath = s"/tmp/graft-bench-turns-$benchConvs"
    if (!new java.io.File(benchPath, "_SUCCESS").exists()) {
      TranscriptGen.turns(spark, benchConvs, parts = cpus * 2, numParts = 64)
        .write.mode("overwrite").parquet(benchPath)
    }
    val warmPath = "/tmp/graft-bench-turns-warm"
    if (!new java.io.File(warmPath, "_SUCCESS").exists()) {
      TranscriptGen.turns(spark, 20000, parts = cpus, numParts = 64)
        .write.mode("overwrite").parquet(warmPath)
    }
    time(validationPass(spark, warmPath)) // warm (JIT/codegen caches)
    // headline throughput at full cores: min of reps (noise-robust)
    val fullRuns = (1 to 2).map { _ => time(validationPass(spark, benchPath)) }
    val rowsHi = fullRuns.head._1
    val tFull = fullRuns.map(_._2).min
    spark.stop()

    // scaling levels: the same job at N and 4N cores. On this VM memory
    // bandwidth saturates around 8 threads, so the CPU-scaling evidence
    // uses N=2 vs 4N=8 by default (driver rule: "N and 4N cores"); each
    // level is min-of-reps to shed scheduler noise.
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "3").toInt
    def levelTime(cores: Int): (Long, Double) = {
      val s = newSession(cores)
      time(validationPass(s, warmPath)) // warm
      val runs = (1 to reps).map(_ => time(validationPass(s, benchPath)))
      s.stop()
      (runs.head._1, runs.map(_._2).min)
    }
    val (rows4n, t4n) = levelTime(scaleN * 4)
    val (rowsLo, tLo) = levelTime(scaleN)
    require(rowsLo == rows4n && rowsLo == rowsHi, s"determinism breach: $rowsLo/$rows4n/$rowsHi")

    val thrHi = rowsHi / t4n
    val thrLo = rowsLo / tLo
    val eff = (tLo / t4n) / 4.0
    val tHi = t4n

    val total = queryTimes.map(_._2).sum + tHi
    val qs = (queryTimes :+ ("validation_pass_4n" -> tHi) :+ ("validation_pass_n" -> tLo)
        :+ ("validation_pass_full" -> tFull))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","turns":$rowsHi,"cores_n":$scaleN,"cores_4n":${scaleN * 4},""" +
      s""""cores_full":$cpus,"turns_per_sec_full":${(rowsHi / tFull).round},""" +
      s""""turns_per_sec_n":${thrLo.round},"turns_per_sec_4n":${thrHi.round},""" +
      s""""scaling_efficiency":${f"$eff%.3f"}}""")
  }
}
