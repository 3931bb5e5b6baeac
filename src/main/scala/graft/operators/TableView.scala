package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** KTable semantics (changelog = latest value per key) in the recompute
  * model (SURVEY.md §1.1, §2.6; reference:
  * src/main/scala/com/github/hosnimed/DSLStatefulTransformation.scala:98-111,
  * StreamToTableJoinExample.scala:59-67).
  *
  * A "table" is the latest-per-key snapshot of a keyed, timestamped stream.
  * Implemented as a single aggregation `groupBy(key).agg(max_by(...))` —
  * one shuffle on the key, map-side partial aggregation, no window
  * function, no global sort, no driver collection. What Spark actually
  * plans: max_by's struct buffer is not hash-aggregable, so this runs as
  * SortAggregate with PER-PARTITION sorts on both sides of the single
  * exchange (no range partitioning — nothing global). That is still the
  * right 100 TB shape: partials fold each key to one struct on the map
  * side before the shuffle, whereas a row_number-over-window would ship
  * EVERY row through the exchange and sort full partitions before
  * discarding all but one row per key.
  */
object TableView {

  /** D2 / S2: latest-per-key view. Ties on `ts` break by `tieBreak`
    * (pass a unique id column for determinism).
    */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], ts: Column, tieBreak: Column): DataFrame = {
    val ord = struct(ts.as("o1"), tieBreak.as("o2"))
    val payload = df.columns.filterNot(keyCols.contains).toSeq
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(payload.map(col): _*), ord).as("latest"))
      .select(keyCols.map(col) ++ payload.map(c => col(s"latest.$c").as(c)): _*)
  }

  /** A6: KGroupedTable.reduce(adder, subtractor) — table re-aggregation
    * with retraction, in the recompute model: Spark recomputes the
    * aggregate from the latest-per-key snapshot, so replaced old values
    * are never counted and no subtractor is needed (same final answers as
    * the reference's incremental adder/subtractor; reference:
    * DSLStatefulTransformation.scala:105-111).
    */
  def regroupAndAgg(latest: DataFrame, newKey: Column, aggs: Seq[Column]): DataFrame =
    latest.groupBy(newKey.as("key")).agg(aggs.head, aggs.tail: _*)
}
