package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Windowed aggregation (SURVEY.md §2.4; reference:
  * src/main/scala/com/github/hosnimed/DSLStatefulTransformation.scala:79-86,
  * windowed-key flattening at :117-123).
  *
  * Batch forms here; the streaming forms (with `withWatermark` ≡ the
  * reference's grace period) live in [[graft.streaming.StreamingQueries]].
  * Both use Spark's native `window`/`session_window` — a single hash
  * aggregation keyed on (window, key): partial-aggregates map-side, one
  * shuffle, no sort.
  */
object Windows {

  /** Epoch-micros long → TimestampType column (exact: micros is Spark's
    * native timestamp resolution).
    */
  def usToTimestamp(tsUs: Column): Column = timestamp_micros(tsUs)

  /** W1: tumbling window of `width` per extra key, counting records.
    * Output: key cols, `window_start_s` (epoch seconds), `cnt`.
    */
  def tumblingCount(df: DataFrame, tsUs: String, width: String, keys: Column*): DataFrame =
    df.groupBy(window(usToTimestamp(col(tsUs)), width) +: keys: _*)
      .count()
      .select(
        keys :+ unix_timestamp(col("window.start")).as("window_start_s") :+ col("count").as("cnt"): _*)

  /** W2: session windows with inactivity gap `gap` per key.
    * Output: key cols, `session_start_us`, `session_events`.
    * `session_window.end` = last event + gap (Kafka Streams reports last
    * event ts; we expose start + count which both models agree on).
    */
  def sessionCount(df: DataFrame, tsUs: String, gap: String, keys: Column*): DataFrame =
    df.groupBy(session_window(usToTimestamp(col(tsUs)), gap) +: keys: _*)
      .count()
      .select(
        keys :+ unix_micros(col("session_window.start")).as("session_start_us")
             :+ col("count").as("cnt"): _*)

  /** W3: windowed-key flattening — `key@[start : end]` string key, exactly
    * the reference's projection shape (DSLStatefulTransformation.scala:117-123)
    * with epoch seconds for the bounds.
    */
  def flattenWindowedKey(df: DataFrame, tsUs: String, width: String, key: Column): DataFrame =
    df.groupBy(window(usToTimestamp(col(tsUs)), width), key.as("k"))
      .count()
      .select(
        concat(
          col("k"), lit("@["),
          unix_timestamp(col("window.start")).cast("string"), lit(" : "),
          unix_timestamp(col("window.end")).cast("string"), lit("]")).as("key"),
        col("count").as("cnt"))

  /** W4: hopping/sliding window (free in Spark; unused by the reference). */
  def hoppingCount(df: DataFrame, tsUs: String, width: String, slide: String, keys: Column*): DataFrame =
    df.groupBy(window(usToTimestamp(col(tsUs)), width, slide) +: keys: _*)
      .count()
      .select(
        keys :+ unix_timestamp(col("window.start")).as("window_start_s") :+ col("count").as("cnt"): _*)
}
