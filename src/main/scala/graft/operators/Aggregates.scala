package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Typed aggregation surface (SURVEY.md §2.3; reference:
  * src/main/scala/com/github/hosnimed/DSLStatefulTransformation.scala:61-111).
  *
  * A4 `aggregate(initializer)(adder)` is the reference's generic fold —
  * an arbitrary Scala function folded per key. The Spark-native carrier
  * is `Aggregator[IN, BUF, OUT]`: it gives map-side partial aggregation
  * (merge) so the fold combines before the shuffle, unlike a naive
  * groupByKey+mapGroups which would shuffle every raw record.
  */
object Aggregates {

  /** A4: generic fold with explicit init/adder/merger — the adder runs
    * within a partition, `merge` combines partials across partitions
    * (must be associative & commutative for distributed correctness,
    * same contract Kafka Streams imposes on its adder).
    */
  class FoldAggregator[IN, B: Encoder](
      init: B,
      adder: (B, IN) => B,
      merger: (B, B) => B)
    extends Aggregator[IN, B, B] {
    override def zero: B = init
    override def reduce(b: B, a: IN): B = adder(b, a)
    override def merge(b1: B, b2: B): B = merger(b1, b2)
    override def finish(b: B): B = b
    override def bufferEncoder: Encoder[B] = implicitly[Encoder[B]]
    override def outputEncoder: Encoder[B] = implicitly[Encoder[B]]
  }

  /** The reference's exact A4 usage: init 0, adder `agg + value`
    * (DSLStatefulTransformation.scala:70-71), generalized to Double.
    */
  def sumFold[IN](extract: IN => Double): FoldAggregator[IN, Double] = {
    implicit val e: Encoder[Double] = Encoders.scalaDouble
    new FoldAggregator[IN, Double](0.0, (b, a) => b + extract(a), _ + _)
  }

  /** A5: `reduce(adder)` on a grouped stream — typed reduceGroups.
    * The adder must be associative/commutative (Kafka Streams contract);
    * Spark additionally combines partials map-side.
    */
  def reducePerKey[K, V](ds: Dataset[(K, V)], adder: (V, V) => V)(
      implicit ek: Encoder[K], ev: Encoder[V], ekv: Encoder[(K, V)]): Dataset[(K, V)] =
    ds.groupByKey(_._1).mapValues(_._2).reduceGroups(adder)

  /** Two-phase top-k per group, for LOW-CARDINALITY groups at scale: a
    * single `row_number over (partition by group)` funnels the whole
    * frame into |groups| reducer partitions — 5 market segments means 5
    * tasks sorting everything at 100 TB. Phase 1 takes a local top-k
    * within each (group, input-partition) — parallelism stays at the
    * input partition count and each task sorts only its slice; phase 2
    * ranks the surviving ≤ k × nPartitions × |groups| candidate rows,
    * which is tiny by construction. Orderings must be deterministic
    * (include a tie-break column) for a stable result.
    */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String], order: Seq[Column],
                   k: Int, rankCol: String = "rnk"): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"topKPerGroup: output rank column '$rankCol' already exists in the input")
    // scratch column names guaranteed fresh (withColumn would silently
    // OVERWRITE same-named caller columns, and the trailing drop would
    // then delete caller data)
    def fresh(base: String): String =
      Iterator.from(0).map(i => if (i == 0) base else s"$base$i")
        .find(n => !df.columns.contains(n)).get
    val partCol = fresh("_part")
    val localRankCol = fresh("_lr")
    val local = df.withColumn(partCol, spark_partition_id())
    val w1 = Window.partitionBy((groupCols :+ partCol).map(col): _*).orderBy(order: _*)
    val candidates = local.withColumn(localRankCol, row_number().over(w1))
      .where(col(localRankCol) <= k).drop(partCol, localRankCol)
    val w2 = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    candidates.withColumn(rankCol, row_number().over(w2)).where(col(rankCol) <= k)
  }
}
