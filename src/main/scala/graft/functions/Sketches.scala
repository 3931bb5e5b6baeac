package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed sketch query shapes shared by the driver queries and the
  * scale audit (one definition, so the audited shape can never drift from
  * the shipped one).
  */
object Sketches {

  /** Count-min sketch of `valueCol` frequencies, queried distributed:
    * build with map-side partial `count_min_sketch` aggregation, broadcast
    * the one-row sketch onto the exact per-key counts, and evaluate
    * `estimateCount` executor-side via [[CmsEstimator]]. Output:
    * (key, exact_cnt, cms_est) — nothing key-cardinality-sized ever
    * reaches the driver. NULL keys are excluded on both sides (the sketch
    * aggregate skips them, so keeping an exact null-key row would break
    * the overestimate-only guarantee the output advertises).
    */
  def cmsEstimate(df: DataFrame, valueCol: String, eps: Double = 0.001,
                  confidence: Double = 0.99, seed: Int = 42): DataFrame = {
    val nonNull = df.where(col(valueCol).isNotNull)
    val sketchRow = nonNull.select(col(valueCol).as("value"))
      .agg(count_min_sketch(col("value"), lit(eps), lit(confidence), lit(seed)).as("_sk"))
    val exact = nonNull.groupBy(col(valueCol).as("key")).agg(count(lit(1)).as("exact_cnt"))
    val est = udf(new CmsEstimator)
    exact.join(broadcast(sketchRow))
      .select(col("key"), col("exact_cnt"), est(col("_sk"), col("key")).as("cms_est"))
  }
}
