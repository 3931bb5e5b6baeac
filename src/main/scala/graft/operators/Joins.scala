package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** The reference's nine join variants, Spark-first (SURVEY.md §2.5;
  * reference: src/main/scala/com/github/hosnimed/StreamToStreamJoinExample.scala:92-95,
  * StreamToTableJoinExample.scala:107-108, TableToTableJoinExample.scala:115-117).
  *
  * All reference joins are equi-joins on the record key; stream-stream
  * joins additionally bound the match to a ± time window. Scale notes:
  *
  *  - J1-J3 (stream-stream windowed): a naive `a.key = b.key AND b.ts
  *    BETWEEN a.ts - w AND a.ts + w` leaves Spark with `key` as the only
  *    equi-column — every row for a hot key meets every other on one
  *    reducer. The bucketed form here adds the time bucket to the join
  *    key: the left side explodes to the (at most 3) buckets its window
  *    can touch, both sides shuffle on (key, bucket), and the exact range
  *    predicate is verified post-join — bounded state per task at 100 TB.
  *    This mirrors how Kafka Streams scopes its join window store.
  *  - J4-J5 (stream-table): the table side is a latest-per-key snapshot,
  *    usually dimension-sized → `broadcast()` it; the stream never shuffles.
  *  - J6-J8 (table-table): two latest-per-key views joined on key;
  *    broadcast the smaller when it fits.
  */
object Joins {

  /** Map the reference's CLI join-type vocabulary (J9) to Spark's
    * (reference: StreamToStreamJoinExample.scala:17-26).
    */
  def sparkJoinType(t: String): String = t.toLowerCase match {
    case "inner"          => "inner"
    case "left"           => "left_outer"
    case "outer" | "full" => "full_outer"
    case other            => other
  }

  /** J1-J3: stream-stream join: rows match when keys are equal and
    * `|l.ts - r.ts| <= windowUs` (microseconds). Both inputs must carry a
    * unique row id (`idCol`) for exact outer-side recovery. Output columns
    * are the left's prefixed `l_` and the right's prefixed `r_`.
    *
    * Each right row lands in exactly one time bucket; each left row
    * explodes to every bucket its ±window can overlap, so a qualifying
    * pair meets exactly once — no post-dedup.
    */
  def windowedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsUs: String,
      idCol: String,
      windowUs: Long,
      joinType: String): DataFrame = {

    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))

    val lb = l.withColumn(
      "l_bucket",
      explode(sequence(
        floorDiv(s"l_$tsUs - ${windowUs}L", windowUs),
        floorDiv(s"l_$tsUs + ${windowUs}L", windowUs))))
    val rb = r.withColumn("r_bucket", floorDiv(s"r_$tsUs", windowUs))

    val cond =
      col("l_bucket") === col("r_bucket") &&
        col(s"l_$key") === col(s"r_$key") &&
        col(s"r_$tsUs").between(col(s"l_$tsUs") - windowUs, col(s"l_$tsUs") + windowUs)

    val inner = lb.join(rb, cond).drop("l_bucket", "r_bucket")

    def nullPad(base: DataFrame, shape: DataFrame): DataFrame =
      shape.schema.fields.foldLeft(base)((d, f) => d.withColumn(f.name, lit(null).cast(f.dataType)))

    sparkJoinType(joinType) match {
      case "inner" => inner
      case outerKind =>
        // matched ids come from bounded SEMI probes of the same bucketed
        // join, NOT from persisting the inner output: per-(key,bucket)
        // density makes the inner's row count grow QUADRATICALLY (d
        // purchases x d views in a cell all pair up), so caching it
        // spills that whole volume to disk before the padding arms can
        // read it. A left-semi emits each probe row at most once and
        // sort-merge early-outs on the first in-range match, keeping the
        // padding arms linear in the INPUTS at any density; the inner
        // arm streams straight to the consumer unpersisted. (The join
        // runs once per arm — 3x probe work for full outer — but probe
        // work is input-sized while the old cache was output-sized, the
        // term that explodes under density.)
        val matchedL = lb.join(rb, cond, "left_semi")
          .select(col(s"l_$idCol").as("ml")).distinct() // ≤3 bucket copies/row
        val unmatchedL = l.join(matchedL, col(s"l_$idCol") === col("ml"), "left_anti")
        val leftOuter = inner.unionByName(nullPad(unmatchedL, r))
        outerKind match {
          case "left_outer" => leftOuter
          case "full_outer" =>
            val matchedR = rb.join(lb, cond, "left_semi")
              .select(col(s"r_$idCol").as("mr")).distinct()
            val unmatchedR = r.join(matchedR, col(s"r_$idCol") === col("mr"), "left_anti")
            leftOuter.unionByName(nullPad(unmatchedR, l))
          case other => throw new IllegalArgumentException(s"unsupported joinType: $other")
        }
    }
  }

  /** Exact integral bucket index: SQL `div` keeps everything in long
    * arithmetic (no double rounding at bucket edges). Timestamps are
    * positive epoch-micros, so truncation == floor.
    */
  private def floorDiv(sqlExpr: String, d: Long) = expr(s"($sqlExpr) div ${d}L")

  /** J4/J5: stream-table join — enrich each stream record with the current
    * table value for its key. The table side broadcasts when
    * dimension-sized (the common case; pass false for fact-sized tables,
    * where Spark falls back to a shuffled hash join on the key).
    */
  def streamTableJoin(
      stream: DataFrame,
      table: DataFrame,
      streamKey: String,
      tableKey: String,
      joinType: String,
      broadcastTable: Boolean = true): DataFrame = {
    val t = if (broadcastTable) broadcast(table) else table
    stream.join(t, stream(streamKey) === t(tableKey), sparkJoinType(joinType))
  }

  /** J6-J8: table-table join of two latest-per-key views on their key. */
  def tableTableJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      joinType: String): DataFrame =
    left.join(right, left(leftKey) === right(rightKey), sparkJoinType(joinType))

  /** As-of join (beyond the reference; the standard event-enrichment
    * operator): for every left row, attach the LATEST right row with the
    * same key and `r.ts <= l.ts` (`direction = "backward"`, the default),
    * or the EARLIEST right row with `r.ts >= l.ts` (`"forward"` — the
    * next-event enrichment). Spark-first implementation: union both
    * sides tagged, hash-partition by key, sort within the partition by
    * (ts, tag) — ascending for backward, ts-descending for forward —
    * carry the last right payload with a running `last(ignoreNulls)`
    * window, keep left rows. One shuffle, per-key local sort — no range
    * join, no per-row probe; the same shape Spark itself plans for
    * sessionization. `joinType` ∈ inner|left.
    *
    * The right payload travels as ONE struct so legitimately-null right
    * columns don't resurrect older values.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      tsUs: String,
      joinType: String = "left",
      direction: String = "backward"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(direction == "backward" || direction == "forward",
      s"asofJoin direction: $direction")
    val l = left.columns.foldLeft(left)((d, c) => d.withColumnRenamed(c, s"l_$c"))
    val r = right.columns.foldLeft(right)((d, c) => d.withColumnRenamed(c, s"r_$c"))
    val rPayload = struct(r.columns.map(col).toSeq: _*)

    val lTagged = l
      .withColumn("_k", col(s"l_$key")).withColumn("_ts", col(s"l_$tsUs"))
      .withColumn("_tag", lit(1)).withColumn("_rp", lit(null).cast(r.select(rPayload).schema.head.dataType))
    val rTagged = r
      .select(col(s"r_$key").as("_k"), col(s"r_$tsUs").as("_ts"), lit(0).as("_tag"), rPayload.as("_rp"))
    val unioned = lTagged.select(
      (l.columns.map(col) :+ col("_k") :+ col("_ts") :+ col("_tag") :+ col("_rp")).toSeq: _*)
      .unionByName(
        l.columns.foldLeft(rTagged)((d, c) => d.withColumn(c, lit(null).cast(l.schema(c).dataType))),
        allowMissingColumns = false)

    // right rows sort before left at equal ts (tag 0 < 1) → inclusive
    // bound in BOTH directions; _rp (struct of the whole right row)
    // breaks ties among right rows at the same ts deterministically
    // (last = greatest payload). Forward scans in descending ts, so the
    // carried right is the nearest one at-or-after the left row.
    // TIE-BREAK CAVEAT: when several right rows share the qualifying ts,
    // this picks the greatest _rp struct in BOTH directions — a
    // deterministic choice, but engines' native ASOF joins resolve such
    // ties implementation-arbitrarily, so cross-engine comparisons on
    // non-ts right fields are only meaningful when (key, ts) is unique
    // on the right (true for the events table) or when comparing
    // tie-invariant fields like r_ts_us.
    val tsOrder = if (direction == "backward") col("_ts").asc else col("_ts").desc
    val w = Window.partitionBy("_k").orderBy(tsOrder, col("_tag").asc, col("_rp").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned.withColumn("_last_r", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_tag") === 1)
      .drop("_k", "_ts", "_tag", "_rp")
    val expanded = r.columns.foldLeft(carried)((d, c) => d.withColumn(c, col(s"_last_r.$c")))
      .drop("_last_r")
    sparkJoinType(joinType) match {
      case "inner"      => expanded.where(col(s"r_$key").isNotNull)
      case "left_outer" => expanded
      case other        => throw new IllegalArgumentException(s"asofJoin: $other")
    }
  }

  /** Distributed range join (point-in-interval): `points ⋈ intervals ON
    * lo ≤ p < hi`, bucketized. Spark's native plan for a non-equi join is
    * a broadcast nested loop — per-row O(|intervals|) probes, and
    * impossible when the interval side outgrows a broadcast. Bucketizing
    * turns it into an EQUI-join: each interval replicates to the
    * `cellWidth`-wide cells it overlaps, each point probes exactly its
    * own cell, and the exact predicate re-verifies in-cell. Both sides
    * shuffle on the cell id (or the interval side broadcasts when small),
    * so the shape survives arbitrarily large interval tables. Replication
    * factor = interval span / cellWidth — pick cellWidth near the median
    * span. Output: all point columns + all interval columns.
    */
  def rangeJoin(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      loCol: String,
      hiCol: String,
      cellWidth: Double): DataFrame = {
    val cells = intervals.withColumn("_cell",
      explode(sequence(
        floor(col(loCol) / cellWidth).cast("long"),
        // hi is exclusive, but emitting its cell when hi lands exactly on
        // a boundary only adds a candidate the predicate rejects
        floor(col(hiCol) / cellWidth).cast("long"))))
    points.withColumn("_cell", floor(col(pointCol) / cellWidth).cast("long"))
      .join(cells, Seq("_cell"))
      .where(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_cell")
  }

  /** Skew-resistant equi-join: salt the (large, skewed) left side into
    * `salts` sub-keys and replicate each right row across all salts, so a
    * hot key spreads over `salts` reducers instead of one. Deterministic
    * (salt = hash of the left row id). AQE's skew-join handles moderate
    * skew automatically; this is the explicit tool for pathological keys
    * (the web-corpus "empty title" problem at 100 TB).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftId: String,
      salts: Int): DataFrame = {
    val l = left.withColumn("_salt", pmod(xxhash64(col(leftId)), lit(salts)))
    val r = right.withColumn("_salt", explode(sequence(lit(0L), lit(salts - 1L))))
    l.join(r.withColumnRenamed(key, s"_r_$key"),
        col(key) === col(s"_r_$key") && l("_salt") === r("_salt"))
      .drop("_salt", s"_r_$key")
  }
}
