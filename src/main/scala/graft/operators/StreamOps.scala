package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._

/** KStream-style operator surface, Spark-first.
  *
  * Two layers, mirroring the reference's DSL (SURVEY.md §2.2; reference:
  * src/main/scala/com/github/hosnimed/DSLStatelessTransformation.scala:41-92,
  * WordCountScalaExample.scala:111-173, KStreamTest.scala:35-138):
  *
  *  1. '''Columnar''' ([[KStreamColumnOps]]) — extension methods on a
  *     DataFrame with `key`/`value` columns that compile straight to
  *     `select`/`filter`/`explode` Column expressions. This is the
  *     preferred path: everything stays inside Catalyst, so codegen,
  *     predicate pushdown and column pruning survive — the operators add
  *     zero overhead at 100 TB.
  *  2. '''Typed''' ([[KStream]]) — a thin `Dataset[(K, V)]` wrapper giving
  *     the reference's arbitrary-Scala-lambda ergonomics (`mapValues(f)`,
  *     `flatMap(f)`, …). Used where the contract genuinely demands a
  *     user function; costs one serialization boundary, so columnar wins
  *     for anything expressible as Columns.
  *
  * Partitioning semantics match Kafka Streams': value-only ops (mapValues,
  * flatMapValues, filter, peek) are narrow — Spark preserves partitioning
  * automatically; key-changing ops (map, selectKey, flatMap) don't shuffle
  * by themselves but any downstream `groupBy`/join will (Catalyst's
  * EnsureRequirements inserts the exchange exactly when required —
  * reference comment at DSLStatelessTransformation.scala:77-80).
  */
object StreamOps {

  implicit class KStreamColumnOps(val df: DataFrame) extends AnyVal {

    /** P1 `mapValues` — transform the value, keep key + other columns. */
    def mapValues(f: Column => Column): DataFrame =
      df.withColumn("value", f(col("value")))

    /** P2 `map` — re-key and re-value (downstream aggregation will shuffle). */
    def mapKV(newKey: Column, newValue: Column): DataFrame =
      df.select(newKey.as("key"), newValue.as("value"))

    /** P3 `flatMap` — one record to N, key change allowed. `gen` must be a
      * generator-producing column (e.g. `explode(...)`) of struct(key,value).
      */
    def flatMapKV(gen: Column): DataFrame =
      df.select(gen.as("kv")).select(col("kv.key").as("key"), col("kv.value").as("value"))

    /** P4 `flatMapValues` — one value to N, key preserved. */
    def flatMapValues(gen: Column => Column): DataFrame = {
      val others = df.columns.filter(c => c != "value").map(col).toSeq
      df.select(others :+ gen(col("value")).as("value"): _*)
    }

    /** P5 `filter`. */
    def filterKV(pred: Column): DataFrame = df.filter(pred)

    /** P6 `filterNot`. */
    def filterNot(pred: Column): DataFrame = df.filter(!pred)

    /** P7 `branch` — route each record to the FIRST matching predicate
      * (Kafka Streams first-match semantics: branch i receives records
      * matching p_i and none of p_0..p_{i-1}). Returns one DataFrame per
      * predicate; all are disjoint filters over the same parent, so
      * Catalyst reuses the scan.
      */
    def branch(preds: Column*): Seq[DataFrame] =
      preds.zipWithIndex.map { case (p, i) =>
        df.filter(preds.take(i).foldLeft(p)((acc, prev) => acc && !prev))
      }

    /** P7 variant for single-output pipelines: tag each record with the
      * index of the first matching predicate (records matching none get
      * `defaultTag`). Same semantics, one pass, scale-friendlier than N
      * scans when all branches flow to one sink.
      */
    def branchTag(defaultTag: Int, preds: Column*): DataFrame = {
      val tagged = preds.zipWithIndex.reverse.foldLeft(lit(defaultTag)) {
        case (acc, (p, i)) => when(p, lit(i)).otherwise(acc)
      }
      // reverse fold builds when(p0,0).otherwise(when(p1,1)...) → first match wins
      df.withColumn("branch", tagged)
    }

    /** P8 `selectKey` — re-key, keep value. */
    def selectKey(newKey: Column): DataFrame = df.withColumn("key", newKey)

    /** P9 `peek` — per-record side effect, pass-through. Debug surface only:
      * the row goes through a deserialization boundary, so keep out of hot
      * paths (use `observe()` for production metrics).
      */
    def peek(f: Row => Unit): DataFrame = {
      implicit val enc: Encoder[Row] = Encoders.row(df.schema)
      df.map { r => f(r); r }
    }

    /** P10 `foreach` — terminal per-record side effect (batch form).
      * Streaming form: `writeStream.foreach(ForeachWriter)` — see
      * [[graft.streaming.Sinks]].
      */
    def foreachKV(f: Row => Unit): Unit = df.foreach(f)

    /** S3 `to(path)` — batch sink: write as parquet (the engine's "topic"). */
    def to(path: String): Unit = df.write.mode("overwrite").parquet(path)

    /** P7 + S3 fused: route to branches and write them in ONE pass,
      * partitioned by branch tag — the single-scan alternative to N
      * filtered writes when all branches land in storage anyway.
      */
    def toBranchedSink(path: String, defaultTag: Int, preds: Column*): Unit =
      df.branchTag(defaultTag, preds: _*)
        .write.partitionBy("branch").mode("overwrite").parquet(path)

    /** S6 `print(toSysOut)` — console debug sink. */
    def printToSysOut(label: String, n: Int = 20): DataFrame = {
      println(s"[$label]")
      df.show(n, truncate = false)
      df
    }
  }

  /** Typed KStream[K,V] — reference-parity lambda surface over Dataset[(K,V)]. */
  final case class KStream[K, V](ds: Dataset[(K, V)]) {
    def mapValues[V2](f: V => V2)(implicit e: Encoder[(K, V2)]): KStream[K, V2] =
      KStream(ds.map { case (k, v) => (k, f(v)) })

    def map[K2, V2](f: (K, V) => (K2, V2))(implicit e: Encoder[(K2, V2)]): KStream[K2, V2] =
      KStream(ds.map { case (k, v) => f(k, v) })

    def flatMap[K2, V2](f: (K, V) => IterableOnce[(K2, V2)])(implicit e: Encoder[(K2, V2)]): KStream[K2, V2] =
      KStream(ds.flatMap { case (k, v) => f(k, v) })

    def flatMapValues[V2](f: V => IterableOnce[V2])(implicit e: Encoder[(K, V2)]): KStream[K, V2] =
      KStream(ds.flatMap { case (k, v) => f(v).iterator.map(v2 => (k, v2)) })

    def filter(f: (K, V) => Boolean): KStream[K, V] =
      KStream(ds.filter((kv: (K, V)) => f(kv._1, kv._2)))

    def filterNot(f: (K, V) => Boolean): KStream[K, V] =
      KStream(ds.filter((kv: (K, V)) => !f(kv._1, kv._2)))

    def selectKey[K2](f: (K, V) => K2)(implicit e: Encoder[(K2, V)]): KStream[K2, V] =
      KStream(ds.map { case (k, v) => (f(k, v), v) })

    def peek(f: (K, V) => Unit)(implicit e: Encoder[(K, V)]): KStream[K, V] =
      KStream(ds.map { case (k, v) => f(k, v); (k, v) })

    def branch(preds: ((K, V) => Boolean)*): Seq[KStream[K, V]] =
      preds.zipWithIndex.map { case (p, i) =>
        KStream(ds.filter { (kv: (K, V)) =>
          p(kv._1, kv._2) && !preds.take(i).exists(q => q(kv._1, kv._2))
        })
      }

    def foreach(f: (K, V) => Unit): Unit = ds.foreach((kv: (K, V)) => f(kv._1, kv._2))

    def toDF(): DataFrame = ds.toDF("key", "value")
  }
}
