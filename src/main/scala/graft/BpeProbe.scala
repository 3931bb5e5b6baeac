package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted A/B for the r11 BPE trie-apply kernel (VERDICT r10 #2):
  * subword counting under frozen merge lists of 64 / 256 / 1024 merges,
  * timed as (a) the Aho–Corasick trie kernel
  * (graft.functions.BpeSubwordCount — cost flat in nMerges) vs (b) the
  * literal replace chain (graft.functions.Bpe.subwordCountChain — cost
  * linear in nMerges), on the SAME replicated corpus from the same
  * parquet. Models train once on the digit-enriched base corpus (the
  * txt_bpe_big device) and are shared by both arms, so the measured
  * curve is pure apply cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.BpeProbe [factor]
  */
object BpeProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = if (args.nonEmpty) args(0).toInt else 20
    val spark = Graft.session()
    var probeDir: Option[java.nio.file.Path] = None
    try {
      val docs0 = Graft.documents(spark, sfDir)
      val enrich = (df: DataFrame) => graft.functions.Bpe.enrichWithIdTokens(df)
      val base = enrich(docs0)
      val models = Seq(64, 256, 1024).map { n =>
        n -> graft.functions.Bpe.train(base, "btext", nMerges = n, vocabCap = 2000)
      }
      models.foreach { case (n, m) => require(m.merges.length == n,
        s"corpus pair capacity exhausted at ${m.merges.length} < $n merges") }

      val dir = java.nio.file.Files.createTempDirectory("graft_bpe_probe")
      probeDir = Some(dir)
      val corpusPath = dir.resolve("corpus").toString
      val off = 1000000000000L
      enrich(docs0.crossJoin(broadcast(spark.range(factor.toLong).select(col("id").as("_r"))))
          .select((col("doc_id") + col("_r") * off).as("doc_id"), col("text")))
        .select("doc_id", "btext")
        .repartition(64)
        .write.mode("overwrite").parquet(corpusPath)
      val corpus = spark.read.parquet(corpusPath)
      println(s"BPEPROBE corpus rows=${corpus.count()} factor=$factor")

      val results = models.flatMap { case (n, m) =>
        val k = ProbeUtil.timeNoop("BPEPROBE", s"kernel_$n")(corpus.select(
          graft.functions.Bpe.subwordCountBpe(col("btext"), m).as("c")))
        val c = ProbeUtil.timeNoop("BPEPROBE", s"chain_$n")(corpus.select(
          graft.functions.Bpe.subwordCountChain(col("btext"), m).as("c")))
        Seq((s"kernel_$n", k), (s"chain_$n", c))
      }.toMap
      // r12: the production 32768-merge model (digit-token capacity
      // corpus — txt_bpe_32k's trainer) applied to the SAME replicated
      // full-text corpus. Kernel arm only: a 32k-deep replace-chain
      // Column would overflow the ColumnNode converter stack; chain
      // linearity is already measured on the 64→1024 arms.
      val m32 = graft.functions.Bpe.train(
        graft.functions.Bpe.digitTokens(docs0, 30), "dtext",
        nMerges = 32768, vocabCap = 50000)
      require(m32.merges.length == 32768, s"capacity ${m32.merges.length} < 32768")
      val k32 = ProbeUtil.timeNoop("BPEPROBE", "kernel_32768")(corpus.select(
        graft.functions.Bpe.subwordCountBpe(col("btext"), m32).as("c")))
      println(f"BPEPROBE kernel flatness 1024/64 = ${results("kernel_1024") / results("kernel_64")}%5.2fx" +
        f" (chain grows ${results("chain_1024") / results("chain_64")}%5.2fx)")
      println(f"BPEPROBE kernel flatness 32768/64 = ${k32 / results("kernel_64")}%5.2fx" +
        f" (512x the merges)")
      println(f"BPEPROBE speedup at 1024 merges = ${results("chain_1024") / results("kernel_1024")}%5.2fx")
      println(f"BPEPROBE chain-extrapolated speedup at 32768 = " +
        f"${results("chain_1024") / results("kernel_1024") * 32 / (k32 / results("kernel_1024"))}%5.0fx")
    } finally {
      probeDir.foreach(ProbeUtil.deleteRecursively)
      spark.stop()
    }
  }
}
