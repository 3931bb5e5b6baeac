package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode}
import org.apache.spark.sql.streaming.ValueState

/** Processor-API equivalents (SURVEY.md §2.7; reference:
  * src/main/scala/com/github/hosnimed/WordCountProcessorExample.scala:23-61).
  *
  * The reference's `Processor[K,V]` + `KeyValueStore` maps to
  * `flatMapGroupsWithState`: `process()` ≈ the per-group function,
  * `context.getStateStore` ≈ `GroupState[S]`, `context.forward` ≈ the
  * returned iterator, punctuation ≈ event-time timeouts. The same code
  * runs in batch (state starts empty, one invocation per key) and
  * streaming (state persists in the checkpointed store across batches) —
  * which is how the batch correctness oracle covers the streaming
  * operator.
  */
object Processors {

  /** X1: word-count as a custom stateful processor over a keyed stream of
    * words. State = running count per word; each invocation folds new
    * occurrences and forwards (word, updated count) — reference
    * WordCountProcessorExample.scala:41-51.
    */
  def wordCount(words: Dataset[String]): Dataset[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.groupByKey(identity)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (word: String, occurrences: Iterator[String], state: GroupState[Long]) =>
          val prior = state.getOption.getOrElse(0L)
          val updated = prior + occurrences.size
          state.update(updated)          // KeyValueStore.put
          Iterator.single((word, updated)) // context.forward
      }
  }

  /** X1 with a PRE-POPULATED store (reference:
    * src/test/java/com/github/hosnimed/ConfluentKStreamsDemoTest.java:50-52
    * seeds the state store before piping records): Spark's analog is the
    * `initialState` overload — counts continue from the seeded values.
    */
  def wordCountSeeded(words: Dataset[String], initial: Dataset[(String, Long)]): Dataset[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    // fold duplicate seed keys first: the initial-state contract is one
    // state row per key (duplicates fail the query at runtime)
    val initialState = initial.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
      .groupByKey(_._1).mapValues(_._2)
    words.groupByKey(identity)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout(), initialState) {
        (word: String, occurrences: Iterator[String], state: GroupState[Long]) =>
          val updated = state.getOption.getOrElse(0L) + occurrences.size
          state.update(updated)
          Iterator.single((word, updated))
      }
  }

  /** X3: multi-forward — the processor emits several records per key
    * (count and sum), like successive `context.forward` calls.
    */
  def countAndSum(pairs: Dataset[(String, Double)]): Dataset[(String, String, Double)] = {
    val spark = pairs.sparkSession
    import spark.implicits._
    pairs.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Double), (String, String, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[(String, Double)], state: GroupState[(Long, Double)]) =>
          val (c0, s0) = state.getOption.getOrElse((0L, 0.0))
          var c = c0; var s = s0
          rows.foreach { r => c += 1; s += r._2 }
          state.update((c, s))
          // HALF_UP on the shortest decimal representation — the same
          // rounding Spark's round() and the SQL oracles use (rint is
          // half-to-even and diverges on exact .5 boundaries)
          val rounded = java.math.BigDecimal.valueOf(s)
            .setScale(2, java.math.RoundingMode.HALF_UP).doubleValue()
          Iterator(
            (key, "cnt", c.toDouble),
            (key, "sum", rounded))
      }
  }

  /** X1/X5 on Spark 4's transformWithState API: the closest structural
    * match to the reference's Processor + named KeyValueStore —
    * `getHandle.getValueState("wordcount-store", ...)` IS the named store
    * attach (X5), `handleInputRows` is `process()`, the returned iterator
    * is `forward`. Requires the RocksDB state-store provider (X6).
    */
  class TwsWordCount extends StatefulProcessor[String, String, (String, Long)] {
    @transient private var countState: ValueState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      countState = getHandle.getValueState[Long]("wordcount-store", Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[String],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[(String, Long)] = {
      val updated = (if (countState.exists()) countState.get() else 0L) + rows.size
      countState.update(updated)
      Iterator.single((key, updated))
    }
  }

  def wordCountTws(words: Dataset[String]): Dataset[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.groupByKey(identity)
      .transformWithState(new TwsWordCount, TimeMode.None(), OutputMode.Update())
  }

  /** A6, incremental form: `KGroupedTable.reduce(adder, subtractor)` with
    * TRUE retraction semantics (reference:
    * src/main/scala/com/github/hosnimed/DSLStatefulTransformation.scala:105-111).
    * The batch queries use the recompute model (same final answers); this
    * processor maintains the changelog incrementally: per table key it
    * remembers the last (groupKey, value) and, on every upsert, emits the
    * subtractor delta `(oldGroupKey, -oldValue)` followed by the adder
    * delta `(newGroupKey, +newValue)`. Summing deltas per groupKey
    * downstream yields the continuously-updated re-keyed aggregate
    * without recomputation — the shape needed when the snapshot is too
    * large to rescan per batch.
    *
    * Input: (tableKey, groupKey, value, ts); rows are applied in ts order
    * within each batch.
    */
  def tableReduceDeltas(rows: Dataset[(String, String, Double, Long)]): Dataset[(String, Double)] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.groupByKey(_._1)
      .flatMapGroupsWithState[(String, Double), (String, Double)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_, it: Iterator[(String, String, Double, Long)], state: GroupState[(String, Double)]) =>
          val sorted = it.toIndexedSeq.sortBy(r => (r._4, r._2, r._3))
          val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
          var cur = state.getOption
          sorted.foreach { case (_, gk, v, _) =>
            cur.foreach { case (ogk, ov) => out += ((ogk, -ov)) } // subtractor
            out += ((gk, v))                                      // adder
            cur = Some((gk, v))
          }
          cur.foreach(state.update)
          out.iterator
      }
  }

  /** X2: stream-time punctuation — an event-time timer that fires once the
    * watermark passes `intervalMs` after the group's last update, emitting
    * the store snapshot for the key (reference's punctuator scans the
    * store and forwards every entry,
    * WordCountProcessorExample.scala:31-36). Streaming-only (timers need
    * a watermark); exercised in the ScalaTest suite.
    */
  def punctuatedCount(words: Dataset[(String, java.sql.Timestamp)], intervalMs: Long): Dataset[(String, Long)] = {
    val spark = words.sparkSession
    import spark.implicits._
    words.withWatermark("_2", "0 seconds")
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (String, Long)](
        OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (word: String, rows: Iterator[(String, java.sql.Timestamp)], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // punctuate: forward the snapshot, re-arm nothing (group is quiesced)
            Iterator.single((word, state.getOption.getOrElse(0L)))
          } else {
            val updated = state.getOption.getOrElse(0L) + rows.size
            state.update(updated)
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + intervalMs)
            Iterator.empty
          }
      }
  }

  /** Ordered-funnel first-timestamp chaining as a per-user stateful
    * processor (r18, VERDICT r17 #2) — q_funnel_steps's chained-min
    * shape maintained incrementally: state = (t1, t2, t3) µs
    * first-timestamps (-1 = unset), each micro-batch advancing the
    * chain view → click-within-`winUs`-of-t1 → purchase-within-`winUs`-
    * of-t2. CONTRACT: micro-batches must arrive in ascending event-time
    * order (the caller stages them with an ascending-ts `batchOf`), so
    * each field is write-once — a later batch can never contain an
    * earlier view/click/purchase — and the converged state equals the
    * batch chain under any within-batch row order (mins are taken over
    * the whole batch against the full eligibility window). Rows buffer
    * per USER per MICRO-BATCH only (the two-pass eligibility needs the
    * batch slice twice) — never the user's history.
    *
    * Input: (user_id, event_type, ts_us). Output (Update mode): the
    * (user, t1, t2, t3) snapshot after each batch that CHANGES the
    * user's state (first appearance included — the state write); fields
    * are monotone unset→set, so the converged table is max-per-field
    * per user, and suppressing unchanged re-emissions (r18 optimization)
    * drops only rows a later snapshot of the same user duplicates —
    * update-mode semantics, and the sink/downstream reduce see fewer
    * rows with an identical converged result.
    */
  def funnelChain(events: Dataset[(Long, String, Long)],
                  winUs: Long): Dataset[(Long, Long, Long, Long)] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_._1)
      .flatMapGroupsWithState[(Long, Long, Long), (Long, Long, Long, Long)](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, Long)],
         state: GroupState[(Long, Long, Long)]) =>
          val batch = rows.toArray // per-user-per-batch slice only
          val prior = state.getOption
          var (t1, t2, t3) = prior.getOrElse((-1L, -1L, -1L))
          if (t1 < 0) {
            val vs = batch.collect { case (_, "view", ts) => ts }
            if (vs.nonEmpty) t1 = vs.min
          }
          if (t1 >= 0 && t2 < 0) {
            val cs = batch.collect {
              case (_, "click", ts) if ts > t1 && ts <= t1 + winUs => ts
            }
            if (cs.nonEmpty) t2 = cs.min
          }
          if (t2 >= 0 && t3 < 0) {
            val ps = batch.collect {
              case (_, "purchase", ts) if ts > t2 && ts <= t2 + winUs => ts
            }
            if (ps.nonEmpty) t3 = ps.min
          }
          state.update((t1, t2, t3))
          if (prior.contains((t1, t2, t3))) Iterator.empty
          else Iterator.single((user, t1, t2, t3))
      }
  }
}
