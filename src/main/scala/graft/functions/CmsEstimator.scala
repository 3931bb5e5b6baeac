package graft.functions

import org.apache.spark.util.sketch.CountMinSketch

/** Executor-side count-min-sketch point query.
  *
  * The merged sketch arrives at each task as one broadcast-joined binary
  * column (identical bytes on every row). Deserializing ~100 KB of sketch
  * per row would dominate the estimate itself, so the functor caches the
  * decoded sketch keyed by the byte-array *instance*: within a task the
  * broadcast value is the same object on every row, so the sketch is
  * decoded once per task. `@transient` keeps the cache out of the closure
  * that ships to executors.
  *
  * This keeps the whole CMS query path distributed — build (map-side
  * partial `count_min_sketch` agg), query (this functor over the grouped
  * keys) — with nothing but the one-row sketch ever leaving an executor.
  */
class CmsEstimator extends ((Array[Byte], String) => Long) with Serializable {
  @transient private var cachedBytes: Array[Byte] = _
  @transient private var cachedSketch: CountMinSketch = _

  override def apply(sketchBytes: Array[Byte], key: String): Long = {
    if (cachedSketch == null || !(cachedBytes eq sketchBytes)) {
      cachedSketch = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      cachedBytes = sketchBytes
    }
    cachedSketch.estimateCount(key)
  }
}
