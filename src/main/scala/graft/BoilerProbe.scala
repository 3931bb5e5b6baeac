package graft

import graft.dedup.Dedup
import org.apache.spark.sql.functions._

/** One-off probe (optimization r19): phase split + shared-segs A/B for
  * dd_boilerplate. The boilerplate df table and the flag join both
  * consume the tokenize+posexplode `segs` subtree; arm B materializes
  * segs once (lazy local checkpoint) to test whether the second scan is
  * worth removing, arm "df_only" isolates the line-frequency pass.
  */
object BoilerProbe {
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
    def committed() = Dedup.boilerplateRemove(docs, "doc_id", "text")

    def shared() = {
      val (id, text, lineWords, maxDfFrac) = ("doc_id", "text", 2, 0.05)
      val base = docs.where(col(id).isNotNull)
        .select(col(id).as("_doc"), graft.functions.TextFunctions.tokens(col(text)).as("_w"))
        .where(size(col("_w")) > 0)
      val nDocs = docs.where(col(id).isNotNull).agg(count(lit(1)).as("_n"))
      val segArr = transform(
        sequence(lit(0), (ceil(size(col("_w")).cast("double") / lineWords) - 1).cast("int")),
        i => array_join(slice(col("_w"), i * lineWords + 1, lit(lineWords)), " "))
      val segs = base.select(col("_doc"), posexplode(segArr).as(Seq("line_idx", "line")))
        .localCheckpoint(false)
      val boiler = segs.groupBy("line")
        .agg(countDistinct("_doc").as("df"))
        .crossJoin(nDocs)
        .where(col("df") >= greatest(ceil(col("_n") * maxDfFrac), lit(2L)))
        .select(col("line"), lit(true).as("_rm"))
      val flagged = segs.join(boiler, Seq("line"), "left")
        .select(col("_doc"), col("line_idx"), col("line"),
          coalesce(col("_rm"), lit(false)).as("_rm"))
      flagged.groupBy(col("_doc"))
        .agg(count(lit(1)).as("n_lines"),
          sum(when(col("_rm"), lit(1L)).otherwise(lit(0L))).as("n_removed"),
          array_join(transform(array_sort(collect_list(
              when(!col("_rm"), struct(col("line_idx"), col("line"))))),
            s => s.getField("line")), " ").as("text_clean"))
        .select(col("_doc").as(id), col("n_lines"), col("n_removed"), col("text_clean"))
    }

    val arms: Seq[(String, () => org.apache.spark.sql.DataFrame)] = Seq(
      ("boiler_committed", () => committed()),
      ("boiler_shared   ", () => shared()))
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 4).foreach { rep =>
      arms.foreach { case (tag, mk) =>
        val t = noop(mk())
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        println(f"PROBE rep$rep $tag $t%.3f s")
      }
    }
    arms.foreach { case (tag, _) => println(f"BEST $tag ${best(tag)}%.3f s") }
    val a = committed().collect().map(_.toString).sorted
    val b = shared().collect().map(_.toString).sorted
    println("EQUAL " + (a.toSeq == b.toSeq))
    spark.stop()
  }
}
