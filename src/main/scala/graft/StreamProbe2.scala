package graft

import org.apache.spark.sql.functions._

/** One-off probe (optimization r18): where does a streaming micro-batch
  * trigger spend its ~1-1.7 s on tiny data? Prints the FULL
  * StreamingQueryProgress JSON per trigger for a representative
  * complete-mode aggregation (the q_dau_wau_streaming shape) under
  * different state-store configurations, so the per-trigger fixed cost
  * (state commit / planning / WAL) is attributable instead of guessed.
  */
object StreamProbe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(event: QueryStartedEvent): Unit = ()
      override def onQueryProgress(event: QueryProgressEvent): Unit = {
        val p = event.progress
        val commit = p.stateOperators.headOption.map(_.commitTimeMs).getOrElse(-1L)
        val upd = p.stateOperators.headOption.map(_.allUpdatesTimeMs).getOrElse(-1L)
        println(s"PROG name=${p.name} batch=${p.batchId} rows=${p.numInputRows} " +
          s"trigger=${p.durationMs.get("triggerExecution")} addBatch=${p.durationMs.get("addBatch")} " +
          s"plan=${p.durationMs.get("queryPlanning")} commitSum=$commit updSum=$upd")
      }
      override def onQueryTerminated(event: QueryTerminatedEvent): Unit = ()
    })
    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"TIMED $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    val cDec = col("cents").cast("decimal(38,0)")
    def dau(confs: Map[String, String]): Unit = {
      graft.streaming.StreamingQueries.runCompleteAggToMemory(
        spark, sfDir, "events", s"probe_dau_${confs.hashCode.abs}",
        df => df.where(col("user_id").isNotNull)
          .select(col("user_id"), expr("(ts div 1000) div 86400000000").as("day"))
          .groupBy("user_id", "day").agg(count(lit(1)).as("n")),
        confs).write.mode("overwrite").format("noop").save()
    }
    // warm
    timed("warm")(dau(Map.empty))
    timed("base_32parts")(dau(Map.empty))
    timed("parts8")(dau(Map("spark.sql.shuffle.partitions" -> "8")))
    timed("parts8_rep")(dau(Map("spark.sql.shuffle.partitions" -> "8")))
    timed("parts2")(dau(Map("spark.sql.shuffle.partitions" -> "2")))
    timed("rocksdb")(dau(Map("spark.sql.streaming.stateStore.providerClass" ->
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")))
    timed("base_again")(dau(Map.empty))
    spark.stop()
  }
}
