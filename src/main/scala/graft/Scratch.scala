package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session()
    val docs = Graft.documents(spark, "/root/testdata/sf0.1")
    def time[T](tag: String)(f: => T): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(s"$tag -> $r in ${(System.nanoTime()-t0)/1e9}")
    }
    // warm
    docs.count()
    time("hof_filter_explode")(docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().count())
    time("explode_then_where")(docs.select(explode(split(lower(col("text")), "\\W+")).as("w"))
      .where(length(col("w")) > 0).groupBy("w").count().count())
    time("hof2")(docs.select(explode(TextFunctions.tokens(col("text"))).as("w"))
      .groupBy("w").count().count())
    time("explode2")(docs.select(explode(split(lower(col("text")), "\\W+")).as("w"))
      .where(length(col("w")) > 0).groupBy("w").count().count())
    spark.stop()
  }
}
