package graft

import java.nio.file.{Files, Paths}

/** Dump the AQE-final formatted plan of the named queries, one file per
  * query: `ExplainSome <outDir> <suffix> <name>...` → `<outDir>/<name>_<suffix>.txt`.
  * Used by the optimization rounds to commit before/after plan evidence
  * (plans/r18/...). Streaming twins execute end-to-end; the dumped plan is
  * the post-convergence batch frame the entry returns (the stream side's
  * evidence is the per-trigger telemetry in the bench artifacts).
  */
object ExplainSome {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Graft.session()
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        df.queryExecution.toRdd.count() // execute so the plan is AQE-final
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"),
          s"# $name ($suffix) @ $sfDir\n\n" + formatted)
        println(s"[explain] wrote $name")
      } catch { case e: Throwable =>
        println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
