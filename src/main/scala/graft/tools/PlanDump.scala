package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `.explain("formatted")` for declared queries into
  * `plans/<tag>/<query>_<suffix>.txt` (the optimization-round evidence
  * format). Not part of the bench/verify contract.
  *
  * Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *   sbt "runMain graft.tools.PlanDump r06 before q_xml_ingest,q_dup_spans"
  *
  * Query names may be a comma list or a regex when prefixed with "re:".
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = args(0)
    val suffix = args(1)
    val sel = args(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = ScalingProbe.newBenchSession(cpus, "graft-plandump")
    val names: Seq[String] =
      if (sel.startsWith("re:")) {
        val r = sel.stripPrefix("re:").r
        graft.SparkEntry.queries.keys.toSeq.sorted
          .filter(n => r.findFirstIn(n).isDefined)
      } else sel.split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val dir = java.nio.file.Paths.get("plans", tag)
    java.nio.file.Files.createDirectories(dir)
    names.foreach { n =>
      val fn = graft.SparkEntry.queries.getOrElse(n,
        sys.error(s"unknown query $n"))
      val df = fn(spark, sfDir)
      // queryExecution.explainString gives the same text explain() prints
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(dir.resolve(s"${n}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      System.err.println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
