package graft
object QuickBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    val names = args.toSeq
    names.foreach { n =>
      def once(): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm
      val t = math.min(once(), once())
      println(f"QB $n%-24s ${t}%.3f s")
    }
    spark.stop()
  }
}
