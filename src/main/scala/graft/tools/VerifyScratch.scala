package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway: end-to-end timing + result check of the two incremental-dedup
  * driver queries after the prefix-bucket fan-out change. */
object VerifyScratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("sdedup-e2e")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "1m")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val dir = "/root/testdata/sf0.1"
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PHASE|$name|${(System.nanoTime() - t0) / 1e9}%.2f"); r
    }
    spark.read.parquet(s"$dir/documents.parquet").count()

    // rep 0 restages (new layout shape), reps 1-2 measure the steady state
    (0 to 2).foreach { rep =>
      val n1 = time(s"q_dedup_incremental_rep$rep") {
        graft.SparkEntry.queries("q_dedup_incremental")(spark, dir).count()
      }
      val n2 = time(s"q_streaming_dedup_rep$rep") {
        graft.SparkEntry.queries("q_streaming_dedup")(spark, dir).count()
      }
      println(s"ROWS|inc=$n1|stream=$n2")
    }
    spark.stop()
  }
}
