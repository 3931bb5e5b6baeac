package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-off timing probe for the anchor-extraction Generate forms (r17):
  * which plan keeps link extraction two-regex-passes-per-document
  * WITHOUT losing raw time at the 2-anchor fixture. Times min-of-3
  * noop-sink runs per form at SPARK_GRAFT_SF_DIR.
  */
object AnchorProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Graft.session()
    val pat = "<a href=\"([^\"]+)\">([^<]*)</a>"
    def pages = graft.queries.PipelineQueries.syntheticHtml(Graft.documents(spark, sfDir))

    // A: the r16 form — re2 re-run per anchor (the weak mark)
    def formA: DataFrame = pages
      .select(col("doc_id"), col("html"),
        posexplode(regexp_extract_all(col("html"), lit(pat), lit(1))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("link_idx"),
        col("col").as("href"),
        element_at(regexp_extract_all(col("html"), lit(pat), lit(2)),
          (col("pos") + 1).cast("int")).as("anchor"))

    // B: the r17 arrays_zip form
    def formB: DataFrame = pages
      .select(col("doc_id"),
        posexplode(arrays_zip(
          regexp_extract_all(col("html"), lit(pat), lit(1)).as("href"),
          regexp_extract_all(col("html"), lit(pat), lit(2)).as("anchor"))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("link_idx"),
        col("col.href").as("href"), col("col.anchor").as("anchor"))

    // C: pre-extract both arrays below the Generate, element_at on the
    // ATTRIBUTE above it (regex twice per doc; array copied per row)
    def formC: DataFrame = pages
      .select(col("doc_id"),
        regexp_extract_all(col("html"), lit(pat), lit(1)).as("hs"),
        regexp_extract_all(col("html"), lit(pat), lit(2)).as("ancs"))
      .select(col("doc_id"), col("ancs"), posexplode(col("hs")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("link_idx"),
        col("col").as("href"),
        element_at(col("ancs"), (col("pos") + 1).cast("int")).as("anchor"))

    def time(f: => DataFrame): Double = {
      val t0 = System.nanoTime()
      f.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    def min3(f: => DataFrame): Double = Seq(time(f), time(f), time(f)).min
    // warmup
    time(formA); time(formB); time(formC)
    println(f"[anchor] A(per-anchor regex)=${min3(formA)}%.3f B(arrays_zip)=${min3(formB)}%.3f C(attr element_at)=${min3(formC)}%.3f")
    spark.stop()
  }
}
