package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted A/B probe for the verifyJaccard join shape (VERDICT r7 #3):
  * "alias" = both join sides alias ONE sets plan (ReuseExchange shares the
  * shingle pass — the shape f9e15df committed); "rename" = the pre-f9e15df
  * control (each side renames first, so the exchanges canonicalize
  * differently and the corpus is shingled twice). Candidates come from the
  * same capped MinHash LSH stage in both arms; the timed pipeline is
  * candidates → verify → noop save (components excluded — common to both
  * arms and measured separately in ScaleCheck).
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.StageProbe [factor]
  * factor > 1 replicates documents xN with disjoint shingle sets (the
  * ScaleCheck device: token-suffix per replica) so the big-data regime —
  * where the corpus side must shuffle instead of broadcast — is measured,
  * not extrapolated.
  */
object StageProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = if (args.nonEmpty) args(0).toInt else 1
    val spark = Graft.session()
    var probeDir: Option[java.nio.file.Path] = None
    // the replicated corpus must not survive a failed probe (disk
    // exhaustion at large factors is precisely when arms throw) — same
    // try/finally contract as ScaleCheck.runFactor
    try {
    Graft.tableNames.foreach { t =>
      try Graft.table(spark, sfDir, t).write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => () }
    }
    val docs: DataFrame =
      if (factor <= 1) Graft.documents(spark, sfDir)
      else {
        // ScaleCheck's replication: suffix every token with the replica id
        // so shingle sets are disjoint across replicas (no artificial
        // cross-replica near-dup pairs); spread before the crossJoin so the
        // expansion parallelizes past the source's 1-2 file partitions
        val off = 1000000000000L
        val outParts = math.max(32, math.min(factor, 256))
        val replicas = broadcast(spark.range(factor).select(col("id").as("_r")))
        val big = Graft.documents(spark, sfDir).repartition(outParts).crossJoin(replicas)
          .select(
            (col("doc_id") + col("_r") * off).as("doc_id"),
            regexp_replace(col("text"), lit("(\\w+)"),
              concat(lit("$1x"), col("_r").cast("string"))).as("text"),
            col("lang"), col("source"), col("n_chars"))
        val p = java.nio.file.Files.createTempDirectory(s"probe-docs$factor")
        probeDir = Some(p)
        val dir = p.toString
        big.write.mode("overwrite").parquet(dir)
        spark.read.parquet(dir)
      }

    def cand() = dedup.Dedup.minhashPairs(docs, "doc_id", "text",
      threshold = 0.5, maxBucket = 1000).select("a", "b")

    def aliasArm() = dedup.Dedup.verifyJaccard(cand(), docs, "doc_id", "text")
      .where(col("jaccard") >= 0.5).select("a", "b")

    // pre-f9e15df control: rename-first join sides (no exchange reuse)
    def renameArm() = {
      val grams =
        if (spark.catalog.functionExists("shingle_hashes"))
          call_function("shingle_hashes", col("text"), lit(1))
        else array_distinct(graft.functions.TextFunctions.tokens(col("text")))
      val sets = docs.select(col("doc_id").as("vid"), grams.as("toks"))
      cand()
        .join(sets.withColumnRenamed("vid", "a").withColumnRenamed("toks", "toks_a"), "a")
        .join(sets.withColumnRenamed("vid", "b").withColumnRenamed("toks", "toks_b"), "b")
        .withColumn("jaccard", round(
          size(array_intersect(col("toks_a"), col("toks_b"))).cast("double") /
            size(array_union(col("toks_a"), col("toks_b"))).cast("double"), 4))
        .where(col("jaccard") >= 0.5).select("a", "b")
    }

    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm both arms once, then alternate timed runs (min-of-2 per arm)
    time(aliasArm); time(renameArm)
    val a1 = time(aliasArm); val r1 = time(renameArm)
    val a2 = time(aliasArm); val r2 = time(renameArm)
    println(f"SP factor=$factor alias  ${math.min(a1, a2)}%.3f s (runs $a1%.3f $a2%.3f)")
    println(f"SP factor=$factor rename ${math.min(r1, r2)}%.3f s (runs $r1%.3f $r2%.3f)")
    println("SP n_edges " + aliasArm().count())
    spark.stop()
    } finally probeDir.foreach(ProbeUtil.deleteRecursively)
  }
}
