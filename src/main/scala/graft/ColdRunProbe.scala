package graft

/** Cold-vs-warm A/B probe for a single query (VERDICT r11 #1): in a
  * FRESH JVM, touch every corpus table (so the OS page cache is out of
  * the measurement), then time the named query as the very first query
  * this JVM ever executes — the "cold" number, carrying the one-off
  * costs a per-query warm rep cannot expose to the bench artifact:
  * whole-stage/expression codegen compilation for this query's shape,
  * AQE's first runtime re-plan, broadcast builds, JIT of the engine's
  * own hot paths. Then N warm reps of the same query. Printing both
  * pins whether a slow driver-side first observation (the r11 cold
  * txt_tfidf 2.19 s vs builder-warm 0.65 s) is query-specific plan
  * instability or JVM-global warmup shared by every first query —
  * run the probe for the suspect AND for controls, each in its own JVM,
  * and compare ratios.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.ColdRunProbe <query> [warmReps]
  * Output: one JSON line {"query":..,"cold":..,"warm_min":..,"ratio":..,"warms":[..]}
  */
object ColdRunProbe {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ColdRunProbe <query> [warmReps]")
    val q = args(0)
    val warmReps = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    def time(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val cold = time()
    val warms = (1 to warmReps).map(_ => time())
    val wmin = warms.min
    def f(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"query":"$q","cold":${f(cold)},"warm_min":${f(wmin)},"ratio":${f(cold / wmin)},"warms":[${warms.map(f).mkString(",")}],"sf":"$sfDir"}""")
    spark.stop()
  }
}
