package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r19): phase split of dd_containment_sketch
  * — the sketch pass (per-row sig+size, banding, capped bucket join,
  * estimate) vs the exact verifyContainment stage — plus a shared-sets
  * arm that materializes (vid, sorted toks) once with a lazy local
  * checkpoint and derives nothing else from it (the verify's sets read
  * back from cache instead of re-shingling the corpus).
  */
object SketchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs = Graft.documents(spark, sfDir)
    def est() = Dedup.containmentSketchPairs(docs, "doc_id", "text", estThreshold = 0.3)
    def full() = Dedup.verifyContainment(est(), docs, "doc_id", "text", ngram = 3)
      .where(greatest(col("cont_ab"), col("cont_ba")) >= 0.3)
      .select("a", "b", "est_jaccard", "est_cont_ab", "est_cont_ba",
        "cont_ab", "cont_ba")

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("est_only ", () => est()), ("full     ", () => full()))
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 4).foreach { rep =>
      arms.foreach { case (tag, mk) =>
        val t = noop(mk())
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        println(f"PROBE rep$rep $tag $t%.3f s")
      }
    }
    arms.foreach { case (tag, _) => println(f"BEST $tag ${best(tag)}%.3f s") }
    spark.stop()
  }
}
