package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r19): same-JVM A/B of the MinHash/SimHash
  * signature forms — explode + imperative aggregate (one hash exchange)
  * vs the per-row kernel (zero exchanges) — over the bench corpus, plus
  * the downstream pair stage on each. Alternating reps so JIT warmup
  * lands on both sides.
  */
object MinHashProbe {
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

    val sigsAgg = docs.select(col("doc_id").as("doc"),
        explode(call_function("shingle_hashes", col("text"), lit(3))).as("h"))
      .groupBy("doc").agg(expr("minhash_agg(h, 64)").as("sig"))
    val sigsRow = docs.select(col("doc_id").as("doc"),
      explode(call_function("minhash_sig", col("text"), lit(3), lit(64))).as("sig"))

    val simAgg = docs.select(col("doc_id").as("doc"),
        explode(call_function("token_hashes", col("text"))).as("h"))
      .groupBy("doc").agg(expr("simhash_agg(h)").as("sh"))
    val simRow = docs.select(col("doc_id").as("doc"),
      explode(call_function("simhash_sig", col("text"))).as("sh"))

    def pairs(sigs: org.apache.spark.sql.DataFrame) =
      Dedup.minhashPairsFromSigs(sigs, threshold = 0.5, maxBucket = 1000)

    val arms: Seq[(String, () => Double)] = Seq(
      ("sigs_agg   ", () => noop(sigsAgg)),
      ("sigs_perrow", () => noop(sigsRow)),
      ("pairs_agg   ", () => noop(pairs(sigsAgg))),
      ("pairs_perrow", () => noop(pairs(sigsRow))),
      ("sim_agg   ", () => noop(simAgg)),
      ("sim_perrow", () => noop(simRow)))
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 4).foreach { rep =>
      arms.foreach { case (tag, run) =>
        val t = run()
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        println(f"PROBE rep$rep $tag $t%.3f s")
      }
    }
    println("--- best-of-4 ---")
    arms.foreach { case (tag, _) => println(f"BEST $tag ${best(tag)}%.3f s") }
    spark.stop()
  }
}
