package graft.plans

import org.apache.spark.sql.DataFrame

/** Raw-API topology surface (SURVEY.md §2.1 S4/S5, §2.7 X7-X9; reference:
  * src/main/scala/com/github/hosnimed/WordCountProcessorExample.scala:79-89,
  * src/main/java/com/github/hosnimed/ConfluentKStreamsDemo.java:28-55).
  *
  * In Spark the "topology" IS the Catalyst logical plan — this builder is
  * a thin named-node veneer that wires DataFrame transformations while
  * keeping the reference's addSource/addProcessor/addSink/describe
  * ergonomics. It adds no execution machinery: `build` hands back the
  * terminal DataFrame whose `queryExecution` is the real, optimized plan.
  */
final class Topology {
  private var nodes = Vector.empty[(String, String, String)] // (name, kind, parent)
  private var current: Option[(String, DataFrame)] = None

  /** S4/X7: named source node. */
  def addSource(name: String, df: DataFrame): Topology = {
    nodes :+= ((name, "source", ""))
    current = Some((name, df))
    this
  }

  /** X7: named processor node — any DataFrame → DataFrame transform
    * (stateless column ops, stateful mapGroups, anything).
    */
  def addProcessor(name: String, f: DataFrame => DataFrame): Topology = {
    val (parent, df) = current.getOrElse(sys.error("addProcessor before addSource"))
    nodes :+= ((name, "processor", parent))
    current = Some((name, f(df)))
    this
  }

  /** S5: named sink node — writes parquet (the engine's "topic") and
    * returns the topology for describe(). Use `build` for the pre-sink
    * DataFrame.
    */
  def addSink(name: String, path: String): Topology = {
    val (parent, df) = current.getOrElse(sys.error("addSink before addSource"))
    nodes :+= ((name, "sink", parent))
    df.write.mode("overwrite").parquet(path)
    this
  }

  /** The terminal DataFrame (its queryExecution is the optimized plan). */
  def build: DataFrame = current.getOrElse(sys.error("empty topology"))._2

  /** The named-DAG half of [[describe]] — a pure function of the builder
    * calls, byte-stable and therefore oracle-stateable where the raw
    * plan TEXT below it is Spark-version-volatile (the r10 x8 ask).
    */
  def dagString: String = nodes.map { case (n, k, p) =>
    if (p.isEmpty) s"$k: $n" else s"$k: $n <- $p"
  }.mkString("\n")

  /** X8: topology description — named DAG plus the Catalyst physical plan
    * (the honest `describe()`: Spark's plan is the real execution graph).
    */
  def describe(): String =
    dagString + "\n--- physical plan ---\n" + build.queryExecution.executedPlan.toString
}
