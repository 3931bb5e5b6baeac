package graft.ann

import graft.functions.BpeModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet persistence for the frozen models (IVF / PQ / IVFADC
  * quantizers, BPE merge lists) — the production seam the
  * freeze-the-model design implies: train once (bounded), SAVE the
  * artifact, and every later ingest/search/tokenize run loads it instead
  * of retraining. Round trips are bit-exact: doubles persist as parquet
  * DOUBLE (no text round-trip), and every load reorders by the explicit
  * index columns, so a loaded model reproduces the original's queries
  * hash-for-hash (ModelIOSpec proves it per model class).
  *
  * Layout: one parquet dir per component under `path/` —
  * `centroids` (idx, vec), `books` (subspace, code, vec),
  * `bounds` (idx, bound), `merges` (rank, a, b). Small artifacts
  * (a few MB at production sizes) written single-file for atomic
  * replace-ability.
  */
object ModelIO {

  private def writeVecs(spark: SparkSession, rows: Seq[(Int, Array[Double])],
                        path: String): Unit = {
    import spark.implicits._
    rows.map { case (i, v) => (i, v.toSeq) }.toDF("idx", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def readVecs(spark: SparkSession, path: String): Array[Array[Double]] =
    spark.read.parquet(path).orderBy("idx")
      .collect().map(_.getSeq[Double](1).toArray)

  private def writeBooks(spark: SparkSession, books: Array[Array[Array[Double]]],
                         path: String): Unit = {
    import spark.implicits._
    val rows = for {
      (book, s) <- books.zipWithIndex
      (ctr, c) <- book.zipWithIndex
    } yield (s, c, ctr.toSeq)
    rows.toSeq.toDF("subspace", "code", "vec")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def readBooks(spark: SparkSession, path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path).orderBy("subspace", "code").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    rows.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (_, g) => g.sortBy(_._2).map(_._3) }.toArray
  }

  private def writeBounds(spark: SparkSession, bounds: Array[Int], path: String): Unit = {
    import spark.implicits._
    bounds.zipWithIndex.map { case (b, i) => (i, b) }.toSeq.toDF("idx", "bound")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  private def readBounds(spark: SparkSession, path: String): Array[Int] =
    spark.read.parquet(path).orderBy("idx").collect().map(_.getInt(1))

  def saveIvf(spark: SparkSession, m: IvfModel, path: String): Unit =
    writeVecs(spark, m.centroids.zipWithIndex.map(_.swap).toSeq, s"$path/centroids")

  def loadIvf(spark: SparkSession, path: String): IvfModel =
    IvfModel(readVecs(spark, s"$path/centroids"))

  def savePq(spark: SparkSession, m: PqModel, path: String): Unit = {
    writeBooks(spark, m.books, s"$path/books")
    writeBounds(spark, m.bounds, s"$path/bounds")
  }

  def loadPq(spark: SparkSession, path: String): PqModel =
    PqModel(readBooks(spark, s"$path/books"), readBounds(spark, s"$path/bounds"))

  def saveIvfPq(spark: SparkSession, m: IvfPqModel, path: String): Unit = {
    writeVecs(spark, m.centroids.zipWithIndex.map(_.swap).toSeq, s"$path/centroids")
    writeBooks(spark, m.books, s"$path/books")
    writeBounds(spark, m.bounds, s"$path/bounds")
  }

  def loadIvfPq(spark: SparkSession, path: String): IvfPqModel =
    IvfPqModel(readVecs(spark, s"$path/centroids"),
      readBooks(spark, s"$path/books"), readBounds(spark, s"$path/bounds"))

  def saveBpe(spark: SparkSession, m: BpeModel, path: String): Unit = {
    import spark.implicits._
    m.merges.zipWithIndex.map { case ((a, b), r) => (r, a, b) }
      .toDF("rank", "a", "b")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/merges")
  }

  def loadBpe(spark: SparkSession, path: String): BpeModel =
    BpeModel(spark.read.parquet(s"$path/merges").orderBy("rank")
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq)
}
