package graft

import graft.multimodal.{Avi, Jpeg}
import org.scalatest.funsuite.AnyFunSuite

/** The MJPEG-AVI container codec: (1) spec pins — hand-computed offsets
  * of the RIFF tree ('RIFF'/'AVI ', avih geometry dwords, 'vids'/'MJPG'
  * fourccs, BITMAPINFOHEADER compression) asserted on built bytes; (2)
  * exact round-trips incl. odd-length frame payloads (the RIFF
  * word-alignment path); (3) the full video pipeline — container walk +
  * per-frame JPEG decode — on fixture-shaped assets; (4) corruption
  * pins: truncation at every prefix, missing movi/avih, lying sizes →
  * None, never a throw. (The JPEG payloads themselves are
  * cross-validated against ImageIO in JpegSpec.)
  */
class AviSpec extends AnyFunSuite {

  private val q8: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 1 + (i % 15))

  private def flatJpeg(v: Int): Array[Byte] = {
    val blk = new Array[Int](64)
    blk(0) = (v % 256) - 128
    Jpeg.encode(8, 8, Array(q8), Array(Array(blk)), 0)
  }

  test("spec pin: RIFF tree offsets of built bytes") {
    val b = Avi.encode(320, 240, 25, Seq(flatJpeg(10), flatJpeg(20)))
    def fcc(p: Int) = new String(b, p, 4, "US-ASCII")
    def rd32(p: Int) = (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) | ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
    assert(fcc(0) === "RIFF" && fcc(8) === "AVI ")
    assert(rd32(4) === b.length - 8, "RIFF size covers the rest of the file")
    assert(fcc(12) === "LIST" && fcc(20) === "hdrl")
    assert(fcc(24) === "avih" && rd32(28) === 56)
    assert(rd32(32) === 40000, "dwMicroSecPerFrame at 25 fps")
    assert(rd32(32 + 16) === 2, "dwTotalFrames")
    assert(rd32(32 + 24) === 1, "dwStreams")
    assert(rd32(32 + 32) === 320 && rd32(32 + 36) === 240, "avih dims")
    // strl: strh fccType/fccHandler; strf biCompression
    val strhData = 24 + 8 + 56 + 12 // after avih chunk + LIST strl header
    assert(fcc(strhData) === "strh" && fcc(strhData + 8) === "vids" && fcc(strhData + 12) === "MJPG")
    val strfData = strhData + 8 + 56
    assert(fcc(strfData) === "strf")
    assert(rd32(strfData + 8 + 4) === 320 && rd32(strfData + 8 + 8) === 240, "strf dims")
    assert(fcc(strfData + 8 + 16) === "MJPG", "biCompression")
  }

  test("round-trip: frame payloads byte-identical, incl. odd-length word alignment") {
    // odd-length frames force the RIFF padding path
    val odd = Array.tabulate(333)(i => (i * 7).toByte)
    val even = Array.tabulate(100)(i => (i * 3).toByte)
    val b = Avi.encode(8, 8, 30, Seq(odd, even, odd))
    val (info, frames) = Avi.decode(b).getOrElse(fail("decode failed"))
    assert(info.width === 8 && info.height === 8 && info.nFrames === 3)
    assert(info.microSecPerFrame === 1000000 / 30)
    assert(frames.length === 3)
    assert(frames(0).toSeq === odd.toSeq && frames(1).toSeq === even.toSeq
      && frames(2).toSeq === odd.toSeq)
  }

  test("full pipeline: container walk + JPEG decode of every frame") {
    val vals = Seq(17, 200, 99, 3)
    val b = Avi.encode(8, 8, 25, vals.map(flatJpeg))
    val (info, frames) = Avi.decode(b).get
    assert(info.nFrames === 4)
    for ((v, f) <- vals.zipWithIndex) {
      val img = Jpeg.decode(frames(f)).getOrElse(fail(s"frame $f jpeg"))
      assert(img.width === 8 && img.height === 8)
      assert(img.planes(0).forall(_ == v % 256), s"frame $f flat value")
    }
  }

  test("fixture shape: every-2nd sampling indices and formula values (id = 7)") {
    // replicate syntheticMjpegAviAssets for id = 7 (3 frames) sans Spark
    val id = 7L
    val nFrames = 1 + (id % 5).toInt
    val frames = (0 until nFrames).map(f => flatJpeg(((id * 7 + f * 19) % 256).toInt))
    val b = Avi.encode(8, 8, 25, frames)
    val (info, got) = Avi.decode(b).get
    assert(info.nFrames === 3 && got.length === 3)
    val sampled = (0 until got.length by 2).map { f =>
      f -> Jpeg.decode(got(f)).get.planes(0)(0)
    }
    assert(sampled === Seq(0 -> ((id * 7) % 256).toInt, 2 -> ((id * 7 + 38) % 256).toInt))
  }

  test("corruption: truncations, bad magic, missing parts → None, never throw") {
    val good = Avi.encode(8, 8, 25, Seq(flatJpeg(1), flatJpeg(2)))
    for (n <- 0 until good.length by 11)
      assert(Avi.decode(java.util.Arrays.copyOf(good, n)).isEmpty, s"truncated to $n")
    val badMagic = good.clone(); badMagic(9) = 'X'
    assert(Avi.decode(badMagic).isEmpty)
    assert(Avi.decode(null).isEmpty)
    assert(Avi.decode(Array.emptyByteArray).isEmpty)
    // a WAV is RIFF but not AVI
    val wav = graft.multimodal.Multimodal.Codec.wav(8000, 1, 16, new Array[Byte](16))
    assert(Avi.decode(wav).isEmpty)
    // a lying inner chunk size must not escape the RIFF bound
    val lying = good.clone()
    // corrupt the avih chunk size field to a huge value
    lying(28) = 0xff.toByte; lying(29) = 0xff.toByte; lying(30) = 0x7f.toByte
    assert(Avi.decode(lying).isEmpty)
  }
}
