package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r18): phase timing + members-only A/B for
  * the blocked-pair dedup entries (dd_ngram_jaccard / dd_containment).
  * Phases: candidate generation alone (blocked self-join behind the
  * window cap), then the full verify with the corpus-wide gram-set pass
  * (the committed shape), then the verify with the gram-set pass
  * prefiltered to pair MEMBERS (left-semi on the union of pair ids —
  * re-executes the lazy candidate pipeline twice more, which
  * verifyJaccard's scaladoc warns about for EXPENSIVE candidate
  * pipelines; blocked pairs carry no text, so the probe measures whether
  * that warning applies here).
  */
object NgramProbe {
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
    def pairs() = Dedup.blockedPairs(docs, "doc_id",
      Seq("lang" -> col("lang"), "blk" -> (col("n_chars") / lit(32)).cast("int")),
      maxBucket = 1000)
    def fullJac(membersOnly: Boolean) =
      Dedup.verifyJaccard(pairs(), docs, "doc_id", "text", ngram = 3,
          membersOnly = membersOnly)
        .where(col("jaccard") >= 0.3).select("a", "b", "jaccard")
    (1 to 2).foreach { rep =>
      timed(s"rep$rep pairs_only")(noop(pairs()))
      timed(s"rep$rep jac_full")(noop(fullJac(membersOnly = false)))
      timed(s"rep$rep jac_members")(noop(fullJac(membersOnly = true)))
      timed(s"rep$rep cont_full") {
        noop(Dedup.verifyContainment(pairs(), docs, "doc_id", "text", ngram = 3)
          .where(greatest(col("cont_ab"), col("cont_ba")) >= 0.3)
          .select("a", "b", "cont_ab", "cont_ba", "jaccard"))
      }
    }
    println("PAIR_COUNT " + pairs().count())
    spark.stop()
  }
}
