package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling: the summary a pipeline operator needs before it
  * decides how to process a table it has never seen (null rates before
  * imputation, cardinalities before choosing broadcast vs shuffle,
  * value ranges before bucketing).
  */
object Profiling {

  /** One-pass per-column profile: (col_name, n_nonnull, n_distinct,
    * min_s, max_s) for each requested column, plus the table row count on
    * every row. A single `agg` over the scan — Catalyst plans the multiple
    * DISTINCT aggregates with one Expand (rows × |cols| intermediate,
    * map-side partials), then `stack` unpivots the one result row into
    * per-column rows driver-free. min/max compare the STRING form so one
    * schema fits every column type (lexicographic for numerics — a
    * documented profiling convention, identical across engines; exact
    * numeric ranges belong to the typed query that follows profiling).
    *
    * `n_distinct` is exact (a real shuffle per column): profiling runs
    * once per corpus and feeds decisions that want truth. For a
    * cheap-and-frequent variant swap in approx_count_distinct — or
    * [[graft.functions.Sketches.hllMergeDistinct]] when the profile
    * should be incrementally mergeable.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c).cast("string")).as(s"__min_$c"),
        max(col(c).cast("string")).as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stackArgs = cols
      .map(c => s"'$c', __nn_$c, __nd_$c, __min_$c, __max_$c")
      .mkString(", ")
    one.selectExpr(
      "__rows as n_rows",
      s"stack(${cols.size}, $stackArgs) as (col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select("col_name", "n_rows", "n_nonnull", "n_distinct", "min_s", "max_s")
  }

  /** Fixed-width histogram of a numeric column: bin i covers
    * [i·binWidth, (i+1)·binWidth), everything below bin 0 / at-or-above
    * the last edge clamps into the edge bins (so the histogram is total
    * over non-null values). One scan + one tiny aggregation on the bin id
    * — the distribution check that sizes shuffle partitions, picks salt
    * counts, and spots skew before a join goes pathological. Output:
    * (bin, lo, hi, n) for every non-empty bin.
    */
  def histogram(df: DataFrame, valueCol: String, binWidth: Double,
                nBins: Int): DataFrame =
    df.where(col(valueCol).isNotNull)
      .select(least(greatest(floor(col(valueCol) / binWidth), lit(0.0)),
        lit((nBins - 1).toDouble)).cast("long").as("bin"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"))
      .select(col("bin"), (col("bin") * binWidth).as("lo"),
        ((col("bin") + 1) * binWidth).as("hi"), col("n"))
}
