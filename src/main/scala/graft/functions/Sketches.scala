package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Heavy hitters (frequent items) via the mergeable DataSketches
    * frequent-items aggregate (`approx_top_k`) — the missing member of
    * the sketch family next to CMS point queries and HLL distincts: "which
    * values dominate this column" (stopword discovery, hot-key detection
    * before sizing a shuffle, boilerplate tokens) without a
    * vocabulary-sized structure anywhere. The sketch aggregate combines
    * map-side, ships a fixed ≤ `maxTracked`-entry summary per partition,
    * and at 100 TB is the ONLY part a production probe runs; the exact
    * per-item counts here are the certification side (the [[cmsEstimate]]
    * exact+sketch device), priced at one extra map-combined shuffle.
    *
    * Output: one row per TRUE heavy hitter — exact_cnt · thrDenom ≥ N,
    * the θ = 1/thrDenom frequent-items definition, integer
    * cross-multiplication so the cut is engine-exact — with the sketch's
    * guarantees as oracle-asserted booleans: `surfaced` (an item above
    * θN must be in the summary whenever 3.5/maxTracked < θ — the
    * a-priori error bound; size maxTracked accordingly) and
    * `est_in_bound` (|est − exact| ≤ 3.5·N/maxTracked, again as integer
    * cross-multiplication). The raw sketch estimate is deliberately NOT
    * in the output: merging partial summaries in a different partition
    * order can shift individual estimates within the bound, so only the
    * bound-checked booleans are layout-invariant.
    */
  def heavyHitters(df: DataFrame, value: Column, thrDenom: Long = 200,
                   maxTracked: Int = 1024): DataFrame = {
    // the surfaced/est_in_bound guarantees are only a-priori TRUE when
    // the sketch error 3.5/maxTracked sits below the threshold
    // 1/thrDenom; a mis-sized call must fail here, not as a confusing
    // legitimately-false boolean at oracle-compare time (ADVICE r10)
    require(3.5 * thrDenom < maxTracked,
      s"heavyHitters: guarantees need 3.5*thrDenom < maxTracked " +
        s"(got thrDenom=$thrDenom, maxTracked=$maxTracked) — raise maxTracked")
    val vals = df.select(value.cast("string").as("item")).where(col("item").isNotNull)
    // the one-row summary has exactly ONE consumer (the broadcast), and
    // n_total derives from the already-aggregated exact side — the
    // sketch-for-est + sketch-for-total split evaluated the sketch
    // aggregate twice (3 corpus scans; this shape is 2, the minimum for
    // a certification query that needs both sketch and truth)
    val sk = vals.agg(
      call_function("approx_top_k", col("item"), lit(maxTracked), lit(maxTracked)).as("top"))
    val exact = vals.groupBy("item").agg(count(lit(1)).as("exact_cnt"))
    val totals = exact.agg(sum("exact_cnt").as("n_total"))
    val est = element_at(
      filter(col("top"), e => e.getField("item") === col("item")), 1).getField("count")
    exact.join(broadcast(totals))
      .where(col("exact_cnt") * lit(thrDenom) >= col("n_total"))
      .join(broadcast(sk))
      .select(col("item"), col("exact_cnt"),
        est.isNotNull.as("surfaced"),
        (est.isNotNull &&
          abs(est - col("exact_cnt")) * lit(2L * maxTracked) <= col("n_total") * lit(7L))
          .as("est_in_bound"))
  }

  /** Store-and-merge heavy hitters — the [[hllMergeDistinct]] pattern
    * for frequent items: build ONE ≤ `maxTracked`-entry summary per
    * (stratum, shard) with `approx_top_k_accumulate` (in production
    * persisted next to the raw data), then answer "which values
    * dominate each stratum" by `approx_top_k_combine` over the shard
    * summaries WITHOUT re-reading raw rows — a new day of data
    * re-sketches only that day. Both levels combine map-side; shuffles
    * carry fixed-size summaries.
    *
    * Certification follows [[heavyHitters]] exactly: output one row per
    * TRUE per-stratum heavy hitter (exact_cnt · thrDenom ≥ N_stratum)
    * with the merged sketch's guarantees as oracle-asserted booleans,
    * and the merge-order-dependent raw estimates kept OUT of the
    * output. Output: (stratum, item, exact_cnt, n_shards, surfaced,
    * est_in_bound).
    */
  def heavyHittersMerge(df: DataFrame, stratum: String, shard: Column,
                        value: Column, thrDenom: Long = 200,
                        maxTracked: Int = 1024): DataFrame = {
    // same sizing rule as heavyHitters: fail loudly at construction
    require(3.5 * thrDenom < maxTracked,
      s"heavyHittersMerge: guarantees need 3.5*thrDenom < maxTracked " +
        s"(got thrDenom=$thrDenom, maxTracked=$maxTracked) — raise maxTracked")
    // NULL strata are excluded EXPLICITLY: groupBy would keep a
    // null-keyed group but the downstream equi-joins on "stratum" never
    // match null keys, which would silently drop that group's heavy
    // hitters — the same null-key rule as cmsEstimate, now a documented
    // filter instead of a join artifact
    val vals = df.select(col(stratum).as("stratum"), shard.as("_shard"),
        value.cast("string").as("item"))
      .where(col("item").isNotNull && col("stratum").isNotNull)
    val perShard = vals.groupBy("stratum", "_shard")
      .agg(call_function("approx_top_k_accumulate", col("item"), lit(maxTracked)).as("_sk"))
    // one per-stratum row carrying BOTH the merged summary and the
    // shard count — a single consumer (the broadcast), so the combine
    // aggregate is evaluated once (splitting n_shards and estimates
    // into separate frames re-evaluates it; see heavyHitters)
    val merged = perShard.groupBy("stratum")
      .agg(count(lit(1)).as("n_shards"),
        call_function("approx_top_k_combine", col("_sk"), lit(maxTracked)).as("_skm"))
      .select(col("stratum"), col("n_shards"),
        call_function("approx_top_k_estimate", col("_skm"), lit(maxTracked)).as("_top"))
    val exact = vals.groupBy("stratum", "item").agg(count(lit(1)).as("exact_cnt"))
    val totals = exact.groupBy("stratum").agg(sum("exact_cnt").as("n_total"))
    val est = element_at(
      filter(col("_top"), e => e.getField("item") === col("item")), 1).getField("count")
    exact.join(broadcast(totals), Seq("stratum"))
      .where(col("exact_cnt") * lit(thrDenom) >= col("n_total"))
      .join(broadcast(merged), Seq("stratum"))
      .select(col("stratum"), col("item"), col("exact_cnt"), col("n_shards"),
        est.isNotNull.as("surfaced"),
        (est.isNotNull &&
          abs(est - col("exact_cnt")) * lit(2L * maxTracked) <= col("n_total") * lit(7L))
          .as("est_in_bound"))
  }

  /** Mergeable distinct-count sketches (DataSketches HLL), the
    * store-and-merge pattern a 100 TB pipeline runs on: build ONE small
    * sketch per (stratum, shard) — e.g. per (event_type, day) — which in
    * production is persisted next to the raw data, then answer
    * "distinct values per stratum" by `hll_union_agg` over the shard
    * sketches WITHOUT re-reading the raw rows. Adding a day of data
    * re-sketches only that day; historical shards merge in at a few KB
    * apiece. Both aggregation levels have map-side partials, shuffles
    * carry sketch bytes (≤ ~2^lgK per group), and nothing
    * value-cardinality-sized moves anywhere.
    *
    * Output: (stratum, n_shards, hll_distinct). Merging shard sketches
    * estimates within the sketch's error envelope of a single sketch
    * over all rows (not bit-identical — the union and direct paths cross
    * the sparse→dense transition differently); both that agreement and
    * the error bound vs exact distinct are asserted in FunctionsSpec.
    */
  def hllMergeDistinct(df: DataFrame, stratum: String, shard: Column,
                       valueCol: String, lgK: Int = 12): DataFrame = {
    val perShard = df.where(col(valueCol).isNotNull)
      .groupBy(col(stratum), shard.as("_shard"))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("_sk"))
    perShard.groupBy(col(stratum))
      .agg(count(lit(1)).as("n_shards"),
        hll_sketch_estimate(hll_union_agg(col("_sk"), lit(false))).as("hll_distinct"))
  }
}
