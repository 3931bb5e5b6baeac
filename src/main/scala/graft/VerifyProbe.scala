package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r19): same-JVM A/B of the pair-verify
  * intersection kernels — `inter_size` (per-pair copy + sort) vs
  * `inter_size_sorted` over `sort_array`'d sets (sorted once per doc,
  * zero per-pair allocation) — on the dd_ngram_jaccard shape. The
  * unsorted arm replicates the r18 verify inline (the library now
  * dispatches the sorted form).
  */
object VerifyProbe {
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
    def pairs() = Dedup.blockedPairs(docs, "doc_id",
      Seq("lang" -> col("lang"), "blk" -> (col("n_chars") / lit(32)).cast("int")),
      maxBucket = 1000)
    val sets = docs.select(col("doc_id").as("vid"),
      call_function("shingle_hashes", col("text"), lit(3)).as("toks"))

    def jacWith(s2: org.apache.spark.sql.DataFrame,
                inter: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      pairs()
        .join(s2.as("sa"), col("a") === col("sa.vid"))
        .join(s2.as("sb"), col("b") === col("sb.vid"))
        .withColumn("_inter", inter(col("sa.toks"), col("sb.toks")))
        .withColumn("jaccard", round(col("_inter").cast("double") /
          when(col("_inter") < 0, lit(-1))
            .otherwise(size(col("sa.toks")) + size(col("sb.toks")) - col("_inter"))
            .cast("double"), 4))
        .where(col("jaccard") >= 0.3).select("a", "b", "jaccard")

    val unsorted = () => jacWith(sets,
      (a, b) => coalesce(call_function("inter_size", a, b), lit(-1)))
    val sorted = () => jacWith(
      sets.select(col("vid"), sort_array(col("toks")).as("toks")),
      (a, b) => coalesce(call_function("inter_size_sorted", a, b), lit(-1)))
    val lib = () => Dedup.verifyJaccard(pairs(), docs, "doc_id", "text", ngram = 3)
      .where(col("jaccard") >= 0.3).select("a", "b", "jaccard")

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("jac_unsorted", unsorted), ("jac_sorted  ", sorted), ("jac_library ", lib))
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 4).foreach { rep =>
      arms.foreach { case (tag, mk) =>
        val t = noop(mk())
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        println(f"PROBE rep$rep $tag $t%.3f s")
      }
    }
    println("--- best-of-4 ---")
    arms.foreach { case (tag, _) => println(f"BEST $tag ${best(tag)}%.3f s") }
    spark.stop()
  }
}
