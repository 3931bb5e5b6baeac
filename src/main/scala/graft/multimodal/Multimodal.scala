package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media payloads travel as opaque `binary`
  * columns with typed metadata; decode/feature-extract runs partition-
  * parallel over the binary batches. The actual codec is STUBBED
  * (container ships no image/audio libs — see [[DecoderStub]]); the
  * Spark-side contract — schema, partitioning, batch iteration — is real
  * and tested, so swapping in a real decoder is a one-function change.
  */
object Multimodal {

  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Wrap a text corpus as binary assets (UTF-8 payload + metadata) — the
    * ingestion shape a real pipeline would produce from object storage.
    */
  def toAssets(docs: DataFrame, id: String, text: String): DataFrame =
    docs.select(
      col(id).as("asset_id"),
      encode(col(text), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"),
        octet_length(encode(col(text), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** STUB decoder: a real implementation would decode image/audio bytes
    * (e.g. JPEG → HxWxC tensor) here. The stub derives deterministic
    * pseudo-features from the bytes so the pipeline shape (schema,
    * batching, partition parallelism) is fully exercised and testable.
    */
  object DecoderStub {
    final case class Features(asset_id: Long, n_bytes: Long, head_byte: Int, byte_sum: Long)
    def decode(assetId: Long, payload: Array[Byte]): Features = {
      // ??? <- real codec goes here; deterministic fake below
      val head = if (payload.nonEmpty) payload(0) & 0xff else -1
      var s = 0L
      var i = 0
      while (i < payload.length) { s += (payload(i) & 0xff); i += 1 }
      Features(assetId, payload.length.toLong, head, s)
    }
  }

  /** Frame sampling for video-shaped assets: treat the payload as a
    * sequence of fixed-size frames (a real pipeline would parse container
    * metadata — stubbed as fixed stride) and emit every `everyNth` frame
    * as its own row `(asset_id, frame_idx, frame binary)`. Pure column
    * expressions: the explode happens in the scan partition, frames
    * slice with binary substr — no UDF, no driver involvement.
    */
  def sampleFrames(assets: DataFrame, frameBytes: Int, everyNth: Int): DataFrame = {
    val nFrames = (octet_length(col("payload")) / frameBytes).cast("int")
    assets.select(col("asset_id"), col("payload"),
        explode(when(nFrames > 0, sequence(lit(0), nFrames - 1, lit(everyNth)))
          .otherwise(array().cast("array<int>"))).as("frame_idx"))
      .select(col("asset_id"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }

  /** Sliding windows for audio-shaped assets: overlapping `winBytes`
    * windows advancing by `hopBytes` (the 25 ms-window / 10 ms-hop shape
    * every audio featurizer consumes; a real pipeline would derive the
    * byte widths from the sample rate in `meta`). Only complete windows
    * emit; payloads shorter than one window yield nothing. Same scale
    * shape as [[sampleFrames]]: explode + binary substr inside the scan
    * partition, no UDF, no shuffle.
    */
  def slidingWindows(assets: DataFrame, winBytes: Int, hopBytes: Int): DataFrame = {
    val len = octet_length(col("payload"))
    val lastIdx = ((len - winBytes) / hopBytes).cast("int")
    assets.select(col("asset_id"), col("payload"),
        explode(when(len >= winBytes, sequence(lit(0), lastIdx))
          .otherwise(array().cast("array<int>"))).as("win_idx"))
      .select(col("asset_id"), col("win_idx"),
        col("payload").substr(col("win_idx") * hopBytes + 1, lit(winBytes)).as("win"))
  }

  /** 2D stride subsampling for image-shaped assets — the
    * nearest-neighbor-downsample plumbing: the payload is a raster of
    * `rowWidth` bytes per row (a real pipeline reads W from container
    * meta), and every `stride`-th row and column survives. The kept
    * positions enumerate as a nested sequence inside the scan partition
    * and join into one output value with a single-pass `concat_ws` — no
    * UDF, no shuffle, no quadratic fold. Row count AND extraction both
    * operate in BYTES: positions index the binary payload directly, so a
    * payload whose string form is multi-byte UTF-8 subsamples its raw
    * bytes instead of silently shifting — pixel rasters are bytes, not
    * characters. Output stays BINARY: each kept byte renders to its
    * 2-char hex form (total, not per-element, buffer growth — linear),
    * the hex strings join with one `concat_ws` pass, and `unhex` folds
    * the result back to bytes. A lossy route through a string cast
    * (1-byte binary → UTF-8) would collapse every continuation byte
    * 0x80–0xFF to U+FFFD; hex round-trips all 256 byte values exactly.
    * (A real decoder would emit a tensor — see [[DecoderStub]].)
    */
  def resize2d(assets: DataFrame, rowWidth: Int, stride: Int): DataFrame = {
    val nRows = (octet_length(col("payload")) / rowWidth).cast("int")
    val kept = flatten(transform(
      when(nRows > 0, sequence(lit(0), nRows - 1, lit(stride)))
        .otherwise(array().cast("array<int>")),
      r => transform(sequence(lit(0), lit(rowWidth - 1), lit(stride)),
        c => r * rowWidth + c)))
    assets.select(col("asset_id"),
      unhex(concat_ws("", transform(kept,
        i => hex(col("payload").substr(i + 1, lit(1)))))).as("resized"))
  }

  /** Partition-parallel feature extraction over the binary column.
    * `mapPartitions` (not per-row UDF) so a real decoder can amortize
    * codec/model init per partition — the same batch shape
    * `mapInPandas`/`mapInArrow` gives a Python decoder.
    */
  def extractFeatures(assets: DataFrame): DataFrame = {
    import org.apache.spark.sql.Encoder
    implicit val enc: Encoder[DecoderStub.Features] = Encoders.product[DecoderStub.Features]
    assets.select("asset_id", "payload").mapPartitions { rows =>
      // per-partition init of a real codec would happen here
      rows.map { r: Row => DecoderStub.decode(r.getLong(0), r.getAs[Array[Byte]](1)) }
    }.toDF()
  }
}
