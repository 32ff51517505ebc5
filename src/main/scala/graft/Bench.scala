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
      // shuffle/spill on tmpfs: /dev/vda writeback storms otherwise inject
      // 30-60s stalls into timed runs on this VM
      .config("spark.local.dir", "/dev/shm/graft-spark")
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
    graft.checks.Drift.histogramDF(turns, length(col("text")).cast("double"), 0, 400, 40).count()
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
    val benchPath = s"/dev/shm/graft-bench-turns-$benchConvs"
    if (!new java.io.File(benchPath, "_SUCCESS").exists()) {
      TranscriptGen.turns(spark, benchConvs, parts = cpus * 2, numParts = 64)
        .write.mode("overwrite").parquet(benchPath)
    }
    val warmPath = "/dev/shm/graft-bench-turns-warm"
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

    // scaling levels: the same job at N and 4N CPUs. A "cluster of size N"
    // is a JVM *pinned to N CPUs* (taskset): plain local[N] only limits
    // Spark task threads while GC/JIT/netty still use every core, which
    // flatters the small level and understates true scaling. Each level
    // runs in a fresh pinned child JVM, interleaved 4N/N per pair, with
    // min-of-reps per level (this VM has minute-scale background noise).
    val scaleN = sys.env.getOrElse("SPARK_GRAFT_SCALE_N", "2").toInt
    val pairsN = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val innerReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_INNER", "3").toInt

    def pinnedLevel(cores: Int, path: String): (Long, Seq[Double]) = {
      val java = sys.props("java.home") + "/bin/java"
      val addOpens = Seq(
        "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
        "java.base/java.io", "java.base/java.net", "java.base/java.nio",
        "java.base/java.util", "java.base/java.util.concurrent",
        "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
        "java.base/sun.nio.cs", "java.base/sun.security.action",
        "java.base/sun.util.calendar").flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
      val cmd = Seq("taskset", "-c", s"0-${cores - 1}", java) ++ addOpens ++ Seq(
        "-Xmx12g", "-Dspark.ui.enabled=false", "-Dfile.encoding=UTF-8",
        "-Dspark.sql.session.timeZone=UTC",
        "-cp", sys.props("java.class.path"),
        "graft.tools.ScalingProbe", cores.toString, path, innerReps.toString)
      val pb = new ProcessBuilder(cmd: _*)
      pb.redirectErrorStream(false)
      pb.redirectError(ProcessBuilder.Redirect.INHERIT)
      val proc = pb.start()
      val out = scala.io.Source.fromInputStream(proc.getInputStream).getLines().toList
      proc.waitFor()
      val re = """rows=(\d+) time=([0-9.]+)s""".r.unanchored
      val parsed = out.collect { case re(r, t) => (r.toLong, t.toDouble) }
      require(parsed.nonEmpty, s"pinned level $cores produced no timings:\n${out.mkString("\n")}")
      (parsed.head._1, parsed.map(_._2))
    }

    val pairs = (1 to pairsN).map { _ =>
      (pinnedLevel(scaleN * 4, benchPath), pinnedLevel(scaleN, benchPath))
    }
    val rows4n = pairs.head._1._1
    val rowsLo = pairs.head._2._1
    // drop each child's first (JIT-cold) rep, then min across pairs
    def steady(ts: Seq[Seq[Double]]): Double =
      ts.map(t => (if (t.size > 1) t.drop(1) else t).min).min
    val t4n = steady(pairs.map(_._1._2))
    val tLo = steady(pairs.map(_._2._2))
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
