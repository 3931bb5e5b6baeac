package graft

import org.apache.spark.sql.DataFrame

/** Shared plumbing for the measurement mains (StageProbe / AnnProbe /
  * BpeProbe): recursive temp-corpus cleanup and the warm + min-of-2
  * noop-sink timer. One copy — a fix to the delete semantics or the
  * warmup policy must not need chasing through per-probe clones.
  */
object ProbeUtil {

  // dirs registered by scratchDir: swept recursively at JVM exit
  // (File.deleteOnExit is an empty-dir-only no-op once parquet lands
  // inside — the r11 review's artifact-leak finding)
  private val tracked = new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  Runtime.getRuntime.addShutdownHook(new Thread(() => {
    tracked.forEach(p => try deleteRecursively(p) catch { case _: Exception => () })
  }))

  /** A temp dir swept RECURSIVELY at JVM exit — for model artifacts and
    * other outputs that fill with files after creation.
    */
  def scratchDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-$tag")
    tracked.add(d)
    d.toAbsolutePath.toString
  }

  /** Recursive delete of a probe's replicated-corpus temp dir — multi-GB
    * at large factors, must not outlive the run (including failed runs).
    */
  def deleteRecursively(dir: java.nio.file.Path): Unit = {
    val walk = java.nio.file.Files.walk(dir)
    try walk.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => java.nio.file.Files.deleteIfExists(f))
    finally walk.close()
  }

  /** Time a DataFrame through the noop sink: one untimed warm pass
    * (codegen/broadcast build), then min of two timed runs. Prints
    * `PREFIX tag   t s` and returns t.
    */
  def timeNoop(prefix: String, tag: String)(df: => DataFrame): Double = {
    def once(): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm
    val t = math.min(once(), once())
    println(f"$prefix $tag%-28s ${t}%8.3f s")
    t
  }
}
