package graft.functions

import org.apache.spark.util.sketch.CountMinSketch

/** Executor-side count-min-sketch point query.
  *
  * The merged sketch arrives at each task as one broadcast-joined binary
  * column (identical bytes on every row). Deserializing ~100 KB of sketch
  * per row would dominate the estimate itself, so the functor caches the
  * decoded sketch. Cache validity check, cheapest first: reference
  * equality (free), then content equality — Spark's row→UDF conversion
  * copies the binary column into a FRESH array per row, so the reference
  * check alone would never hit; the content memcmp (~10 µs for 100 KB) is
  * still ~100x cheaper than re-parsing the sketch. `@transient` keeps the
  * cache out of the closure that ships to executors; each task
  * deserializes its own functor instance, so the cache is task-local.
  *
  * This keeps the whole CMS query path distributed — build (map-side
  * partial `count_min_sketch` agg), query (this functor over the grouped
  * keys) — with nothing but the one-row sketch ever leaving an executor.
  */
class CmsEstimator extends ((Array[Byte], String) => Long) with Serializable {
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def apply(sketchBytes: Array[Byte], key: String): Long = {
    // null sketch (empty/all-null input frame) or null key (the sketch agg
    // skipped nulls, so it never counted them): estimate is 0, not an NPE
    if (sketchBytes == null || key == null) return 0L
    val hit = cachedSketch != null &&
      ((cachedBytes eq sketchBytes) || java.util.Arrays.equals(cachedBytes, sketchBytes))
    if (!hit) {
      cachedSketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      cachedBytes = sketchBytes
    }
    cachedSketch.estimateCount(key)
  }
}
