package graft

import graft.ann.{Ann, AnnUdfWitness}
import graft.functions.{IvfNearestLists, IvfPqEncode, PqEncode}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Targeted A/B for the r11 ANN kernel port (VERDICT r10 #1): the PQ /
  * IVFADC encode and IVF assignment scans — the corpus-dominant cost of
  * every quantized ANN path — timed as (a) the codegen'd native kernels
  * (graft.functions.AnnKernels) vs (b) the retired boxed-`Seq[Double]`
  * Scala UDFs (graft.ann.AnnUdfWitness), on the SAME replicated corpus
  * read from the same parquet. Models are trained once on the base table
  * (bounded draw) and shared by both arms, so the measured delta is pure
  * per-row execution: catalyst⇄JVM conversion + boxing vs direct
  * `ArrayData` loops.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> runMain graft.AnnProbe [factor]
  * factor replicates the embeddings table (ids offset per replica;
  * vectors unchanged — encode cost is rows × dims, value-independent).
  */
object AnnProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = if (args.nonEmpty) args(0).toInt else 1000
    val spark = Graft.session()
    var probeDir: Option[java.nio.file.Path] = None
    try {
      val emb0 = Graft.embeddings(spark, sfDir)
      val pq = Ann.trainPq(emb0, "vec_id", "embedding", m = 8, codebookBits = 6)
      val ivfPq = Ann.trainIvfPq(emb0, "vec_id", "embedding",
        nLists = 16, m = 8, codebookBits = 6)
      val ivf = Ann.trainIvf(emb0, "vec_id", "embedding", nLists = 16)

      val dir = java.nio.file.Files.createTempDirectory("graft_ann_probe")
      probeDir = Some(dir)
      val corpusPath = dir.resolve("corpus").toString
      val off = 1000000000000L
      emb0.crossJoin(broadcast(spark.range(factor.toLong).select(col("id").as("_r"))))
        .select((col("vec_id") + col("_r") * off).as("vec_id"), col("embedding"))
        .repartition(64)
        .write.mode("overwrite").parquet(corpusPath)
      val corpus: DataFrame = spark.read.parquet(corpusPath)
      val n = corpus.count()
      println(s"ANNPROBE corpus rows=$n factor=$factor")

      val bcPq = spark.sparkContext.broadcast((pq.books, pq.bounds))
      val bcIvfPq = spark.sparkContext.broadcast((ivfPq.centroids, ivfPq.books, ivfPq.bounds))
      val bcCent = spark.sparkContext.broadcast(
        ivf.centroids.map(c => (c, math.sqrt(c.map(x => x * x).sum))))

      val arms = Seq(
        ("pq_encode_kernel", () => corpus.select(col("vec_id"),
          Ann.kernelCol(PqEncode(_, bcPq), col("embedding")).as("e"))),
        ("pq_encode_udf", () => corpus.select(col("vec_id"),
          AnnUdfWitness.pqEncode(bcPq)(col("embedding").cast("array<double>")).as("e"))),
        ("ivfpq_encode_kernel", () => corpus.select(col("vec_id"),
          Ann.kernelCol(IvfPqEncode(_, bcIvfPq), col("embedding")).as("e"))),
        ("ivfpq_encode_udf", () => corpus.select(col("vec_id"),
          AnnUdfWitness.ivfPqEncode(bcIvfPq)(col("embedding").cast("array<double>")).as("e"))),
        ("ivf_assign_kernel", () => corpus.select(col("vec_id"),
          Ann.kernelCol(IvfNearestLists(_, bcCent, 1), col("embedding")).getItem(0).as("list"))),
        ("ivf_assign_udf", () => corpus.select(col("vec_id"),
          AnnUdfWitness.ivfNearestLists(bcCent, 1)(
            col("embedding").cast("array<double>")).getItem(0).as("list"))))
      val times = arms.map { case (tag, df) => tag -> ProbeUtil.timeNoop("ANNPROBE", tag)(df()) }.toMap
      Seq("pq_encode", "ivfpq_encode", "ivf_assign").foreach { fam =>
        val k = times(s"${fam}_kernel"); val u = times(s"${fam}_udf")
        println(f"ANNPROBE $fam%-14s speedup ${u / k}%5.2fx (udf ${u}%.3f s / kernel ${k}%.3f s)")
      }
    } finally {
      probeDir.foreach(ProbeUtil.deleteRecursively)
      spark.stop()
    }
  }
}
