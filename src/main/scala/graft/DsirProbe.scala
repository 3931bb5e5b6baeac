package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** One-off probe (optimization r19, VERDICT r18 #5): the last untried
  * pp_dsir shape — UNION-WITH-TAG / tagged single scan. The committed
  * two-frame form tokenizes the corpus twice (raw pass + target-slice
  * pass; ReuseExchange covers the raw side's two consumers but cannot
  * span the differently-filtered target frame). Here the target
  * membership rides a per-row flag on ONE gram scan, the per-(doc,
  * bucket) aggregation carries both counts (tf, and tf over target
  * rows), and — because column pruning would otherwise split the two
  * consumers' copies of that aggregation right back into two scans (the
  * r18 flag-form dead end) — the cell frame is materialized once with a
  * lazy local checkpoint. A/B against the committed form, same JVM.
  */
object DsirProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    def noop(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val docs = Graft.documents(spark, sfDir)
    val buckets = 8192

    def committed() = graft.functions.TextFunctions
      .dsirWeights(docs, docs.where(col("lang") === "en"), "doc_id", "text", buckets)
      .orderBy(col("logw_micro").desc, col("doc").asc).limit(100)
      .select(col("doc").as("doc_id"), col("n_grams"), col("logw_micro"))

    def tagged() = {
      def q6(c: Column): Column =
        floor(graft.functions.TextFunctions.detLn(c) * lit(1000000.0)).cast("long")
      val nbi = greatest(size(col("toks")) - lit(1), lit(0))
      val cells = docs.where(col("doc_id").isNotNull)
        .select(col("doc_id").as("doc"), (col("lang") === "en").as("tgt"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        .select(col("doc"), col("tgt"), explode(concat(col("toks"),
          zip_with(slice(col("toks"), lit(1), nbi), slice(col("toks"), lit(2), nbi),
            (a, b) => concat(a, lit(" "), b)))).as("gram"))
        .select(col("doc"), col("tgt"),
          pmod(xxhash64(col("gram")), lit(buckets.toLong)).as("bkt"))
        .where(col("bkt").isNotNull)
        .groupBy("doc", "bkt")
        .agg(count(lit(1)).as("tf"),
          sum(when(col("tgt"), lit(1L)).otherwise(lit(0L))).as("tft"))
        .localCheckpoint(false)
      val byBkt = cells.groupBy("bkt").agg(sum("tf").as("cr"), sum("tft").as("ct"))
      val lam = byBkt.select(col("bkt"),
        (q6(col("ct") + lit(1L)) - q6(col("cr") + lit(1L))).as("lam_micro"))
      val denom = byBkt.agg(sum("cr").as("n_r"), sum("ct").as("n_t"))
        .select((q6(col("n_r") + lit(buckets.toLong)) -
          q6(col("n_t") + lit(buckets.toLong))).as("const_micro"))
      val perDoc = cells.join(broadcast(lam), Seq("bkt"))
        .groupBy("doc")
        .agg(sum("tf").as("n_grams"), sum(col("tf") * col("lam_micro")).as("_s"))
      docs.where(col("doc_id").isNotNull)
        .select(col("doc_id").as("doc"))
        .join(perDoc, Seq("doc"), "left")
        .crossJoin(broadcast(denom))
        .select(col("doc"),
          coalesce(col("n_grams"), lit(0L)).as("n_grams"),
          (coalesce(col("_s"), lit(0L)) +
            coalesce(col("n_grams"), lit(0L)) * col("const_micro")).as("logw_micro"))
        .orderBy(col("logw_micro").desc, col("doc").asc).limit(100)
        .select(col("doc").as("doc_id"), col("n_grams"), col("logw_micro"))
    }

    val arms: Seq[(String, () => DataFrame)] = Seq(
      ("dsir_committed", () => committed()), ("dsir_tagged   ", () => tagged()),
      ("dsir_library  ", () => SparkEntry.queries("pp_dsir")(spark, sfDir)))
    val best = scala.collection.mutable.Map.empty[String, Double]
    (1 to 4).foreach { rep =>
      arms.foreach { case (tag, mk) =>
        val t = noop(mk())
        best(tag) = math.min(best.getOrElse(tag, Double.MaxValue), t)
        println(f"PROBE rep$rep $tag $t%.3f s")
      }
    }
    arms.foreach { case (tag, _) => println(f"BEST $tag ${best(tag)}%.3f s") }
    // value equality witness: same 100 rows
    val a = committed().collect().map(_.toString).sorted
    val b = tagged().collect().map(_.toString).sorted
    println("EQUAL " + (a.toSeq == b.toSeq))
    spark.stop()
  }
}
