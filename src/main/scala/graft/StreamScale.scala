package graft

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-side scale audit (VERDICT r11 #6): drive the stateful
  * streaming shapes (tumbling window agg, session window agg, interval
  * stream-stream join) through the REAL engine at 1x and Nx and record,
  * from the engine's own progress events, the `stateOperators` metrics —
  * max state rows and state memory across micro-batches — next to wall
  * time. SCALE.md's batch curves certify plan shape under growth; these
  * rows certify STATE-STORE growth, the thing that actually kills a
  * streaming job at 100 TB.
  *
  * Replication models follow the ScaleCheck discipline (match the model
  * to the operator):
  *   - `w1_dense` / `w2_dense`: same keys, timestamps jittered ±30 s —
  *     N× the rows into the SAME key/window space. The certification is
  *     that state rows stay ~flat (state ∝ keys × windows, never rows).
  *   - `w2_disjoint` / `j1_disjoint`: replica-suffixed keys — N× the
  *     key space. State rows should grow ~N× (linear in keys) and time
  *     ~linear; the join uses the disjoint model because densified keys
  *     would grow its OUTPUT quadratically (that measures the data, not
  *     the engine).
  *   - `w2_disjoint_rocksdb`: the same pipeline under the RocksDB
  *     state-store provider — certifies the provider swap holds at the
  *     grown key space.
  *
  * Each arm is staged as a 3-file time-tertile stream directory
  * (maxFilesPerTrigger=1, AvailableNow) so the watermark advances across
  * micro-batches and append-mode eviction actually exercises the store.
  * Results append to SCALE.md.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<dir> [SPARK_GRAFT_STREAM_FACTOR=N] runMain graft.StreamScale
  */
object StreamScale {

  private case class Run(sec: Double, maxStateRows: Long, maxStateMB: Double,
                         batches: Int, finalStateRows: Long = -1L)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_STREAM_FACTOR", "100").toInt
    // engine | store | all — which arm families to run (store = the
    // foreachBatch persisted-store twins, engine = stateOperators arms)
    val caseSel = sys.env.getOrElse("SPARK_GRAFT_STREAM_CASES", "all")
    val spark = Graft.session()
    val staged = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]

    try {
      val off = 1000000000000L
      val ev = Graft.events(spark, sfDir)
        .select(col("event_id"), col("ts_us"), col("user_id"),
          col("event_type"), col("value"))
      // dense replication: ids offset (replica recoverable), ts jittered
      // ±30 s, keys untouched — the ScaleCheck evN model
      def replicas = broadcast(spark.range(factor).select(col("id").as("_r")))
      val evBig = ev.repartition(math.max(32, math.min(factor, 256)))
        .crossJoin(replicas).select(
          (col("event_id") + col("_r") * off).as("event_id"),
          (col("ts_us") + (xxhash64(col("event_id"), col("_r")) % 30000000L)).as("ts_us"),
          col("user_id"), col("event_type"), col("value"))

      /** Stage `src` as a 3-file time-tertile stream dir; returns its path. */
      def stage(src: DataFrame, tag: String): String = {
        val mm = src.agg(min("ts_us"), max("ts_us")).head()
        val (lo, hi) = (mm.getLong(0), mm.getLong(1))
        val dir = Files.createTempDirectory(s"sscale-$tag")
        staged += dir
        val now = System.currentTimeMillis()
        (0 to 2).foreach { i =>
          val slice = src.where(
            least(floor((col("ts_us") - lit(lo)) * 3 / lit(hi - lo + 1)), lit(2)) === i)
          val tmp = Files.createTempDirectory(s"sscale-part-$tag-$i")
          staged += tmp
          slice.write.mode("overwrite").parquet(tmp.toString)
          // move ALL part files of the slice (a 100x tertile in one
          // coalesced file would serialize the write); modification
          // times pin batch order, oldest first
          val l = Files.list(tmp)
          try {
            var j = 0
            l.forEach { p =>
              if (p.toString.endsWith(".parquet")) {
                val t = dir.resolve(f"b$i%d-$j%04d.parquet")
                Files.move(p, t)
                Files.setLastModifiedTime(t,
                  java.nio.file.attribute.FileTime.fromMillis(now - (2 - i) * 120000L))
                j += 1
              }
            }
          } finally l.close()
        }
        dir.toString
      }

      val schema = ev.schema
      def read(dir: String, perTrigger: Int): DataFrame =
        spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", perTrigger).parquet(dir)

      // one staged dir per arm size; per-trigger file count = the number
      // of files a tertile produced, so both arms see exactly 3 batches
      val smallDir = stage(ev, "small")
      val bigDir = stage(evBig, "big")
      def filesPerTertile(dir: String): Int = {
        val l = Files.list(java.nio.file.Paths.get(dir))
        try l.filter(p => p.getFileName.toString.startsWith("b0-")).count().toInt
        finally l.close()
      }
      val smallPer = math.max(1, filesPerTertile(smallDir))
      val bigPer = math.max(1, filesPerTertile(bigDir))

      def timed(out: DataFrame, tag: String): Run = {
        val ckpt = Files.createTempDirectory(s"sscale-ckpt-$tag")
        staged += ckpt
        val t0 = System.nanoTime()
        val q = out.writeStream.format("noop")
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val sec = (System.nanoTime() - t0) / 1e9
        val progs = q.recentProgress
        val withState = progs.filter(_.stateOperators.nonEmpty)
        val rows = withState.map(p => p.stateOperators.map(_.numRowsTotal).sum)
        val mem = withState.map(p => p.stateOperators.map(_.memoryUsedBytes).sum)
        q.stop()
        Run(sec,
          if (rows.isEmpty) 0L else rows.max,
          if (mem.isEmpty) 0.0 else mem.max / 1e6,
          progs.count(_.numInputRows > 0),
          // state rows AFTER the terminal batch's eviction — the number
          // that separates a horizon-bounded store (shrinks back toward
          // the live window) from an unbounded one (max == final,
          // forever); -1 when the query has no state operator
          if (rows.isEmpty) -1L else rows.last)
      }

      def withKey(df: DataFrame, disjoint: Boolean): DataFrame =
        if (disjoint)
          df.withColumn("key",
            concat(expr(s"event_id div ${off}L").cast("string"), lit("_"),
              col("user_id").cast("string")))
        else df.withColumn("key", col("user_id").cast("string"))

      def w1(dir: String, per: Int): DataFrame =
        read(dir, per)
          .withColumn("event_time", timestamp_micros(col("ts_us")))
          .withWatermark("event_time", "3 minutes")
          .groupBy(window(col("event_time"), "5 minutes"), col("event_type")).count()

      def w2(dir: String, per: Int, disjoint: Boolean): DataFrame =
        withKey(read(dir, per), disjoint)
          .withColumn("event_time", timestamp_micros(col("ts_us")))
          .withWatermark("event_time", "3 minutes")
          .groupBy(session_window(col("event_time"), "1 hour"), col("key")).count()

      def j1(dir: String, per: Int): DataFrame = {
        def side(tag: String) = withKey(read(dir, per), disjoint = true)
          .select(col("event_id").as(s"${tag}_event_id"), col("key").as(s"${tag}_key"),
            col("event_type").as(s"${tag}_type"), col("value").as(s"${tag}_amount"),
            timestamp_micros(col("ts_us")).as(s"${tag}_time"))
          .withWatermark(s"${tag}_time", "3 minutes")
        val l = side("l").where(col("l_type") === "purchase")
        val r = side("r").where(col("r_type") === "view")
        l.join(r, expr(
          "l_key = r_key AND r_time BETWEEN l_time - INTERVAL 1 HOUR AND l_time + INTERVAL 1 HOUR"))
          .select(col("l_event_id"), col("r_event_id"), col("l_key"),
            (col("l_amount") + col("r_amount")).as("combined"))
      }

      val rocksConf = "spark.sql.streaming.stateStore.providerClass"
      val rocksVal = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
      def withRocks[A](f: => A): A = {
        spark.conf.set(rocksConf, rocksVal)
        try f finally spark.conf.unset(rocksConf)
      }

      // r15 (verdict ask #6's state story): exact streaming dedup keeps
      // a state row per key FOREVER (the dd_stream_dedup shape — state
      // is O(distinct keys)), while dropDuplicatesWithinWatermark
      // evicts entries one horizon past their first arrival — the
      // bounded-state twin. The disjoint arms grow the key space Nx:
      // the unbounded arm's state must track keys ~Nx and NEVER shrink
      // across batches; the bounded arm's max state stays at the keys
      // live within one horizon of the watermark.
      def ddUnbounded(dir: String, per: Int): DataFrame =
        withKey(read(dir, per), disjoint = true)
          .dropDuplicates("key")
          .select("key")
      def ddWm(dir: String, per: Int): DataFrame =
        withKey(read(dir, per), disjoint = true)
          .withColumn("event_time", timestamp_micros(col("ts_us")))
          .withWatermark("event_time", "1 hour")
          .dropDuplicatesWithinWatermark("key")
          .select("key")

      val cases: Seq[(String, String, () => Run, () => Run)] = Seq(
        ("w1_dense (window agg, same keys)", "hdfs",
          () => timed(w1(smallDir, smallPer), "w1s"),
          () => timed(w1(bigDir, bigPer), "w1b")),
        ("w2_dense (session agg, same keys)", "hdfs",
          () => timed(w2(smallDir, smallPer, disjoint = false), "w2ds"),
          () => timed(w2(bigDir, bigPer, disjoint = false), "w2db")),
        ("w2_disjoint (session agg, Nx keys)", "hdfs",
          () => timed(w2(smallDir, smallPer, disjoint = true), "w2js"),
          () => timed(w2(bigDir, bigPer, disjoint = true), "w2jb")),
        ("w2_disjoint (session agg, Nx keys)", "rocksdb",
          () => withRocks(timed(w2(smallDir, smallPer, disjoint = true), "w2rs")),
          () => withRocks(timed(w2(bigDir, bigPer, disjoint = true), "w2rb"))),
        ("j1_disjoint (interval join, Nx keys)", "hdfs",
          () => timed(j1(smallDir, smallPer), "j1s"),
          () => timed(j1(bigDir, bigPer), "j1b")),
        ("dedup_unbounded (exact dedup, Nx keys)", "hdfs",
          () => timed(ddUnbounded(smallDir, smallPer), "ddus"),
          () => timed(ddUnbounded(bigDir, bigPer), "ddub")),
        ("dedup_wm_disjoint (1h-horizon dedup, Nx keys)", "hdfs",
          () => timed(ddWm(smallDir, smallPer), "ddws"),
          () => timed(ddWm(bigDir, bigPer), "ddwb")),
        ("dedup_wm_disjoint (1h-horizon dedup, Nx keys)", "rocksdb",
          () => withRocks(timed(ddWm(smallDir, smallPer), "ddwrs")),
          () => withRocks(timed(ddWm(bigDir, bigPer), "ddwrb"))))

      // headers/prose emit only WITH their rows — a store-only run must
      // not append an empty engine table to SCALE.md (review r13)
      val sb = new StringBuilder
      if (caseSel != "store") {
        sb.append(s"\n## streaming state growth (factor $factor, real engine, 3 time-tertile micro-batches)\n\n")
        sb.append("Metrics from the engine's own progress events (`stateOperators`):\n")
        sb.append("max state rows / state memory across batches. Dense arms replicate\n")
        sb.append("rows into the same key space (state must stay ~flat); disjoint arms\n")
        sb.append(s"grow the key space ${factor}x (state should track keys, time ~linear).\n\n")
        sb.append("| case | provider | 1x sec | ${f}x sec | time ratio | 1x state rows | ${f}x state rows | rows ratio | 1x state MB | ${f}x state MB |\n"
          .replace("${f}", factor.toString))
        sb.append("|---|---|---|---|---|---|---|---|---|---|\n")
      }
      // SPARK_GRAFT_STREAM_ONLY: comma-separated name prefixes — run a
      // subset of arms without re-measuring the whole family (the mode
      // a round's incremental chain uses; headers still emit so the
      // appended rows stay under a labelled table)
      val onlyArm: String => Boolean =
        sys.env.get("SPARK_GRAFT_STREAM_ONLY")
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq) match {
          case Some(ps) if ps.nonEmpty => name => ps.exists(name.startsWith)
          case _                       => _ => true
        }
      if (caseSel != "store") cases.filter(c => onlyArm(c._1)).foreach { case (name, prov, small, big) =>
        val s = small(); val b = big()
        // state-rows cells show "max (final)": max is the batch peak,
        // final is what remains after the terminal watermark's eviction
        // — for an unbounded store they coincide; for a horizon-bounded
        // store the final shrinks to the keys still live in the window
        def rowsCell(r: Run): String =
          if (r.finalStateRows < 0) s"${r.maxStateRows}"
          else s"${r.maxStateRows} (${r.finalStateRows})"
        val row = f"| $name | $prov | ${s.sec}%.2f | ${b.sec}%.2f | ${b.sec / s.sec}%.1f | " +
          f"${rowsCell(s)} | ${rowsCell(b)} | " +
          f"${if (s.maxStateRows == 0) 0.0 else b.maxStateRows.toDouble / s.maxStateRows}%.1f | " +
          f"${s.maxStateMB}%.1f | ${b.maxStateMB}%.1f |"
        println(s"SS $row")
        sb.append(row).append("\n")
      }
      // ---- store-state arms (VERDICT r12 #5): the two r12 ingest twins
      // whose cross-batch state lives in PERSISTED PER-BATCH PARQUET
      // STORES (the compacted-topic shape), not in the engine's state
      // operators — measured by reading the stores back after the
      // stream drains. Replication models:
      //   - txt_bm25_streaming: doc_ids offset, TEXT UNCHANGED (no dedup
      //     in this path, so disjoint ids alone grow the stats honestly)
      //     → stats-store rows (per-doc lengths + query-term tfs) should
      //     grow ~Nx, time ~linear.
      //   - pp_ingest_media: doc_ids offset → the synthetic-PNG dHash
      //     domain is a function of (id mod small, n_chars mod 13), so
      //     DISTINCT hashes saturate by fixture construction — the
      //     correct reading is the dedup-state law itself: the hash
      //     store grows with DISTINCT CONTENT, never with rows. Both
      //     rows and time are recorded; the saturation is the point.
      case class StoreRun(sec: Double, storeRows: Long, storeMB: Double)
      def timedStore(body: scala.collection.mutable.Buffer[(String, String)] => DataFrame,
                     tag: String): StoreRun = {
        val dirs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        val t0 = System.nanoTime()
        body(dirs).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        var rows = 0L
        var bytes = 0L
        dirs.foreach { case (_, d) =>
          val path = java.nio.file.Paths.get(d)
          if (Files.exists(path)) {
            rows += spark.read.option("recursiveFileLookup", "true").parquet(d).count()
            val walk = Files.walk(path)
            try bytes += walk.filter(p => p.toString.endsWith(".parquet"))
              .mapToLong(p => Files.size(p)).sum()
            finally walk.close()
          }
        }
        StoreRun(sec, rows, bytes / 1e6)
      }

      val docs = Graft.documents(spark, sfDir)
        .select("doc_id", "text", "lang", "n_chars")
      val docsBig = docs.repartition(math.max(32, math.min(factor, 256)))
        .crossJoin(replicas).select(
          (col("doc_id") + col("_r") * off).as("doc_id"),
          col("text"), col("lang"), col("n_chars"))

      def bm25Arm(d: DataFrame, tag: String): StoreRun = timedStore({ dirs =>
        val batchOf = graft.streaming.StreamingQueries
          .harnessBatches(d, "doc_id").getOrElse(lit(0))
        graft.streaming.StreamingQueries.runBm25Stream(
          spark, d, batchOf, Seq("dup", "spark", "merge", "vector"), tag,
          storeDirs = Some(dirs))
      }, tag)

      def mediaArm(d: DataFrame, tag: String): StoreRun = timedStore({ dirs =>
        val batch = d.where(pmod(col("doc_id"), lit(10)) === 0)
        val corpus = d.where(pmod(col("doc_id"), lit(10)) =!= 0)
        val batchOf = graft.streaming.StreamingQueries
          .harnessBatches(batch, "doc_id").getOrElse(lit(0))
        graft.streaming.StreamingQueries.runMediaIngestStream(
          spark, batch, corpus, batchOf, tag, storeDirs = Some(dirs))
      }, tag)

      // r15 (verdict ask #5): the cross-batch CONTENT-HASH state behind
      // pp_ingest_streaming (the per-batch `seen` stores + the one-time
      // corpus hash store). Replication keeps TEXT UNCHANGED (dense), so
      // distinct content saturates: the stores must grow with content
      // diversity, never with row count — the same dedup-state law the
      // media arm certifies, here for the md5 text gate.
      def ingestArm(d: DataFrame, tag: String): StoreRun = timedStore({ dirs =>
        val batch = d.where(pmod(col("doc_id"), lit(10)) === 0)
        val corpus = d.where(pmod(col("doc_id"), lit(10)) =!= 0)
        val batchOf = graft.streaming.StreamingQueries
          .harnessBatches(batch, "doc_id").getOrElse(lit(0))
        graft.streaming.StreamingQueries.runIngestStream(
          spark, batch, corpus, batchOf, jaccardMin = 0.5, tag,
          storeDirs = Some(dirs))
      }, tag)

      val storeCases: Seq[(String, () => StoreRun, () => StoreRun)] = Seq(
        ("txt_bm25_streaming (stats store, Nx docs)",
          () => bm25Arm(docs, "bm25s"), () => bm25Arm(docsBig, "bm25b")),
        ("pp_ingest_media (hash store, Nx assets)",
          () => mediaArm(docs, "media-s"), () => mediaArm(docsBig, "media-b")),
        ("pp_ingest (content-hash stores, Nx docs, text unchanged)",
          () => ingestArm(docs, "ing-s"), () => ingestArm(docsBig, "ing-b")))

      if (caseSel != "engine") {
        sb.append(s"\n### persisted-store state growth (factor $factor, foreachBatch parquet stores)\n\n")
        sb.append("| case | 1x sec | ${f}x sec | time ratio | 1x store rows | ${f}x store rows | rows ratio | 1x store MB | ${f}x store MB |\n"
          .replace("${f}", factor.toString))
        sb.append("|---|---|---|---|---|---|---|---|---|\n")
        storeCases.filter(c => onlyArm(c._1)).foreach { case (name, small, big) =>
          val s = small(); val b = big()
          val row = f"| $name | ${s.sec}%.2f | ${b.sec}%.2f | ${b.sec / s.sec}%.1f | " +
            f"${s.storeRows}%d | ${b.storeRows}%d | " +
            f"${if (s.storeRows == 0) 0.0 else b.storeRows.toDouble / s.storeRows}%.1f | " +
            f"${s.storeMB}%.1f | ${b.storeMB}%.1f |"
          println(s"SS $row")
          sb.append(row).append("\n")
        }
        sb.append(
          "\nReading: bm25's stats store (per-doc lengths + query-term tfs) tracks\n" +
          "docs ~linearly — the additive-statistics design. The media hash store\n" +
          "grows with DISTINCT content, not rows: the synthetic dHash domain is\n" +
          "finite, so replicas collide into it and the store saturates — exactly\n" +
          "the dedup-state law that makes the gate viable at 100 TB (state is\n" +
          "bounded by content diversity, 16 bytes per distinct image).\n")
      }

      val p = java.nio.file.Paths.get("SCALE.md")
      if (Files.exists(p)) Files.writeString(p, Files.readString(p) + sb.toString)
      else Files.writeString(p, sb.toString)
      println("appended SCALE.md")
    } finally {
      staged.foreach(p => try ProbeUtil.deleteRecursively(p) catch { case _: Exception => () })
      spark.stop()
    }
  }
}
