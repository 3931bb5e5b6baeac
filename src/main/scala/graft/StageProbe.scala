package graft
import org.apache.spark.sql.functions._
object StageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    val docs = Graft.documents(spark, sfDir)
    def mkVerified() = {
      val cand = dedup.Dedup.minhashPairs(docs, "doc_id", "text",
        threshold = 0.5, maxBucket = 1000).select("a", "b")
      dedup.Dedup.verifyJaccard(cand, docs, "doc_id", "text")
        .where(col("jaccard") >= 0.5).select("a", "b")
    }
    // warm
    mkVerified().write.mode("overwrite").format("noop").save()
    val t0 = System.nanoTime()
    val v = mkVerified()
    val t1 = System.nanoTime()
    val comp = dedup.Dedup.connectedComponents(v)
    val t2 = System.nanoTime()
    comp.write.mode("overwrite").format("noop").save()
    val t3 = System.nanoTime()
    println(f"SP build_verified  ${(t1-t0)/1e9}%.3f s")
    println(f"SP components_ctor ${(t2-t1)/1e9}%.3f s")
    println(f"SP comp_save       ${(t3-t2)/1e9}%.3f s")
    println("SP n_edges " + v.count())
    spark.stop()
  }
}
