package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join story for repeated big⋈big joins.
  * At 100 TB a fact⋈fact join on the same key every day should not
  * re-shuffle both sides every run: write both tables bucketed on the
  * join key once, and every subsequent join is exchange-free (each task
  * reads matching bucket files from both sides). This spec proves the
  * plan property on the real corpus tables: with broadcast disabled, the
  * bucketed join has ZERO Exchange operators and matches the plain
  * join's result.
  */
class BucketedJoinSpec extends GraftTest {

  test("bucketed tables join co-located: zero exchanges, same result") {
    val oi = Graft.orders(spark, sf).select(col("o_orderkey"), col("o_custkey"))
    val li = Graft.lineitem(spark, sf).select(col("l_orderkey"), col("l_quantity"))
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    // force the shuffle-vs-colocated comparison: broadcast would hide it
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      oi.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("b_orders")
      li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("b_lineitem")

      val bucketed = spark.table("b_orders").join(spark.table("b_lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      val p = bucketed.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        "bucketed join must read co-located buckets, never shuffle:\n" + p.take(3000))
      assert(p.contains("SelectedBucketsCount") || p.contains("Bucketed: true"),
        "scan must report bucketed reading:\n" + p.take(3000))

      val plain = oi.join(li, col("o_orderkey") === col("l_orderkey"))
      val pPlain = plain.queryExecution.executedPlan.toString
      assert(pPlain.contains("Exchange hashpartitioning"),
        "control: the unbucketed join DOES shuffle:\n" + pPlain.take(3000))
      assert(bucketed.count() === plain.count(), "bucketing must not change the join result")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
