package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r19): same-JVM A/B of editDistancePairs
  * forms — (a) r18 committed: strings carried through the variant
  * self-join, Levenshtein per shared variant, trailing distinct;
  * (b) r19 candidate: slim (vh, doc) join, distinct pairs BEFORE the
  * DP, strings joined back once per pair.
  */
object FuzzyProbe {
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
    val docs = Graft.customer(spark, sfDir)
    val (id, text, maxDist) = ("c_custkey", "c_name", 1)

    def oldForm() = {
      val variantsAll = docs
        .where(col(text).isNotNull)
        .select(col(id).as("doc"), col(text).as("str"),
          explode(Dedup.deletionNeighborhood(col(text), maxDist)).as("v"))
        .select(col("doc"), col("str"), xxhash64(col("v")).as("vh"))
      val variants = Dedup.capBuckets(variantsAll, Seq("vh"), 5000, "probe")
      variants.select(col("vh"), col("doc").as("a"), col("str").as("str_a"))
        .join(variants.select(col("vh"), col("doc").as("b"), col("str").as("str_b")), "vh")
        .where(col("a") < col("b"))
        .select(col("a"), col("b"),
          levenshtein(col("str_a"), col("str_b"), maxDist).as("dist"))
        .where(col("dist").between(0, maxDist))
        .distinct()
    }
    def newForm() = Dedup.editDistancePairs(docs, id, text, maxDist)

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("fuzzy_old", () => oldForm()), ("fuzzy_new", () => newForm()))
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 4).foreach { rep =>
      arms.foreach { case (tag, mk) =>
        val t = noop(mk())
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        println(f"PROBE rep$rep $tag $t%.3f s")
      }
    }
    arms.foreach { case (tag, _) => println(f"BEST $tag ${best(tag)}%.3f s") }
    println("counts old=" + oldForm().count() + " new=" + newForm().count())
    spark.stop()
  }
}
