package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r18): phase timing of the dd_lsh_resolve
  * composition — signature persist, banded candidate generation, exact
  * verify, connected components, resolve — so the optimization targets
  * the measured stage, not the guessed one.
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    def timed[A](tag: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"TIMED $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Graft.documents(spark, sfDir)
    (1 to 2).foreach { rep =>
      val sigDir = java.nio.file.Files
        .createTempDirectory("graft-lshprobe").toAbsolutePath.toString
      timed(s"rep$rep sigs_write") {
        Dedup.minhashSigs(docs, "doc_id", "text")
          .write.mode("overwrite").parquet(sigDir)
      }
      val sigs = spark.read.parquet(sigDir)
      val cand = Dedup.minhashPairsFromSigs(sigs, threshold = 0.5, maxBucket = 1000)
        .select("a", "b")
      timed(s"rep$rep cand_only")(noop(cand))
      val verified = Dedup.verifyJaccard(cand, docs, "doc_id", "text")
        .where(col("jaccard") >= 0.5).select("a", "b")
      timed(s"rep$rep cand_verify")(noop(verified))
      timed(s"rep$rep components") {
        noop(Dedup.connectedComponents(verified))
      }
      val vp = spark.createDataFrame(verified.collect().toSeq.asInstanceOf[Seq[org.apache.spark.sql.Row]].map(r => (r.getLong(0), r.getLong(1)))).toDF("a", "b")
      (1 to 5).foreach { k =>
        timed(s"rep$rep cc_maxiter_$k") {
          noop(Dedup.connectedComponents(vp, maxIter = k))
        }
      }
      timed(s"rep$rep full_resolve") {
        noop(Dedup.resolve(docs, verified, "doc_id").select("doc_id", "lang"))
      }
      println("CAND_COUNT " + cand.count())
    }
    spark.stop()
  }
}
