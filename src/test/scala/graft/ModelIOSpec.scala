package graft

import graft.ann.{Ann, ModelIO}
import org.apache.spark.sql.functions._

/** Round-trip proofs for the frozen-model artifacts: a saved+loaded
  * model must be BIT-identical to the trained one (doubles compared by
  * raw bits) and must reproduce the original's query output
  * row-for-row — the property that lets a production deployment train
  * once and ship the artifact.
  */
class ModelIOSpec extends GraftTest {

  private def tmp(tag: String): String = ProbeUtil.scratchDir(s"modelio-$tag")

  private def bits(d: Double): Long = java.lang.Double.doubleToRawLongBits(d)

  private def assertVecsEqual(a: Array[Array[Double]], b: Array[Array[Double]], tag: String): Unit = {
    assert(a.length === b.length, tag)
    a.indices.foreach { i =>
      assert(a(i).length === b(i).length, s"$tag[$i]")
      a(i).indices.foreach(j => assert(bits(a(i)(j)) === bits(b(i)(j)), s"$tag[$i][$j]"))
    }
  }

  test("IVF model round-trips bit-exactly and reproduces the search") {
    val emb = Graft.embeddings(spark, sf)
    val m = Ann.trainIvf(emb, "vec_id", "embedding", nLists = 16)
    val p = tmp("ivf")
    ModelIO.saveIvf(spark, m, p)
    val m2 = ModelIO.loadIvf(spark, p)
    assertVecsEqual(m.centroids, m2.centroids, "centroids")
    val q = emb.where(col("vec_id") < 5)
    val a = Ann.ivfTopK(emb, q, "vec_id", "embedding", k = 5, nProbe = 4, m).collect().toSet
    val b = Ann.ivfTopK(emb, q, "vec_id", "embedding", k = 5, nProbe = 4, m2).collect().toSet
    assert(a === b)
  }

  test("PQ and IVFADC models round-trip bit-exactly and reproduce the search") {
    val emb = Graft.embeddings(spark, sf)
    val pq = Ann.trainPq(emb, "vec_id", "embedding", m = 8, codebookBits = 6)
    val p1 = tmp("pq")
    ModelIO.savePq(spark, pq, p1)
    val pq2 = ModelIO.loadPq(spark, p1)
    assert(pq.bounds.toSeq === pq2.bounds.toSeq)
    pq.books.indices.foreach(s => assertVecsEqual(pq.books(s), pq2.books(s), s"book$s"))
    val q = emb.where(col("vec_id") < 5)
    assert(Ann.pqTopK(emb, q, "vec_id", "embedding", k = 5, refineK = 20, pq).collect().toSet ===
      Ann.pqTopK(emb, q, "vec_id", "embedding", k = 5, refineK = 20, pq2).collect().toSet)

    val ivfpq = Ann.trainIvfPq(emb, "vec_id", "embedding", nLists = 16, m = 8, codebookBits = 6)
    val p2 = tmp("ivfpq")
    ModelIO.saveIvfPq(spark, ivfpq, p2)
    val ivfpq2 = ModelIO.loadIvfPq(spark, p2)
    assertVecsEqual(ivfpq.centroids, ivfpq2.centroids, "centroids")
    assert(ivfpq.bounds.toSeq === ivfpq2.bounds.toSeq)
    ivfpq.books.indices.foreach(s => assertVecsEqual(ivfpq.books(s), ivfpq2.books(s), s"rbook$s"))
    assert(Ann.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5, nProbe = 4, refineK = 20, ivfpq)
      .collect().toSet ===
      Ann.ivfPqTopK(emb, q, "vec_id", "embedding", k = 5, nProbe = 4, refineK = 20, ivfpq2)
        .collect().toSet)
  }

  test("BPE model round-trips exactly (merge order preserved) and reproduces counts") {
    val docs = Graft.documents(spark, sf)
    val m = graft.functions.Bpe.train(docs, "text", nMerges = 64)
    val p = tmp("bpe")
    ModelIO.saveBpe(spark, m, p)
    val m2 = ModelIO.loadBpe(spark, p)
    assert(m.merges === m2.merges)
    val a = docs.select(col("doc_id"),
      graft.functions.Bpe.subwordCountBpe(col("text"), m).as("n")).collect().toSet
    val b = docs.select(col("doc_id"),
      graft.functions.Bpe.subwordCountBpe(col("text"), m2).as("n")).collect().toSet
    assert(a === b)
  }
}
