package graft

/** One-off: print the AQE-final plan of a single query (scratch tool). */
object ExplOne {
  def main(args: Array[String]): Unit = {
    val spark = Graft.session("32")
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.01"))
    df.queryExecution.toRdd.count()
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    spark.stop()
  }
}
