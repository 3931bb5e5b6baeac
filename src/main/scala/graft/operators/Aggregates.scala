package graft.operators

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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
}
