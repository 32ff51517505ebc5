package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc performance probe (dev tool). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def time(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    val part = spark.read.parquet(s"$dir/part.parquet")
    time("raw rlike count")(part.where(!col("p_brand").rlike("Brand#1[0-9]")).count())
    time("graft violations (warm1)")(graft.SparkEntry.queries("q_pattern_violations")(spark, dir).count())
    time("graft violations (warm2)")(graft.SparkEntry.queries("q_pattern_violations")(spark, dir).count())
    val q = graft.SparkEntry.queries("q_pattern_violations")(spark, dir)
    q.explain("formatted")
    time("quality warm1")(graft.SparkEntry.queries("q_quality")(spark, dir).count())
    time("quality warm2")(graft.SparkEntry.queries("q_quality")(spark, dir).count())
    graft.SparkEntry.queries("q_quality")(spark, dir).explain("formatted")
    spark.stop()
  }
}
