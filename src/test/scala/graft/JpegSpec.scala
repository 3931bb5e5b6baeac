package graft

import graft.multimodal.Jpeg
import org.scalatest.funsuite.AnyFunSuite

/** The baseline-JPEG codec, certified three ways no two of which can be
  * wrong together: (1) spec pins — the canonical Huffman codes of the
  * Annex K tables and the zigzag walk are asserted against hand-known
  * values from T.81 itself; (2) exact round-trips through our own
  * encoder/decoder for both the lossless entropy layer (arbitrary
  * coefficients) and the lossy pixel path (DC-only blocks are bit-exact
  * by construction); (3) cross-validation against the JDK's own ImageIO
  * JPEG codec — our bytes decoded by a codec we didn't write, and its
  * bytes decoded by ours.
  */
class JpegSpec extends AnyFunSuite {

  private def flatGray(wb: Int, hb: Int, v: (Int, Int) => Int): Array[Array[Int]] =
    Array.tabulate(wb * hb) { bi =>
      val c = new Array[Int](64)
      c(0) = v(bi % wb, bi / wb) - 128 // q00 = 8 makes DC exact: 8(v-128)/8
      c
    }

  private val q8: Array[Int] = Array.tabulate(64)(i => if (i == 0) 8 else 1 + (i % 15))

  test("spec pin: canonical codes of the Annex K DC luminance table") {
    // T.81 Table K.3 expands to these canonical codes (category -> code/len)
    val t = Jpeg.DcLum
    val expected = Seq(
      0 -> ("00", 2), 1 -> ("010", 3), 2 -> ("011", 3), 3 -> ("100", 3),
      4 -> ("101", 3), 5 -> ("110", 3), 6 -> ("1110", 4), 7 -> ("11110", 5),
      8 -> ("111110", 6), 9 -> ("1111110", 7), 10 -> ("11111110", 8),
      11 -> ("111111110", 9))
    for ((cat, (bits, len)) <- expected) {
      assert(t.sizeOf(cat) === len, s"cat $cat length")
      assert(t.codeOf(cat) === Integer.parseInt(bits, 2), s"cat $cat code")
    }
  }

  test("spec pin: AC luminance EOB and ZRL codes; zigzag walk") {
    val t = Jpeg.AcLum
    assert(t.sizeOf(0x00) === 4 && t.codeOf(0x00) === Integer.parseInt("1010", 2), "EOB")
    assert(t.sizeOf(0xf0) === 11 && t.codeOf(0xf0) === Integer.parseInt("11111111001", 2), "ZRL")
    assert(t.sizeOf(0x01) === 2 && t.codeOf(0x01) === Integer.parseInt("00", 2), "(0,1)")
    // zigzag: first row of T.81 Figure A.6 plus involution property
    assert(Jpeg.Zigzag.take(8).toSeq === Seq(0, 1, 8, 16, 9, 2, 3, 10))
    assert(Jpeg.Zigzag(63) === 63)
    assert(Jpeg.Zigzag.toSet.size === 64)
    (0 until 64).foreach(i => assert(Jpeg.ZigzagInv(Jpeg.Zigzag(i)) === i))
  }

  test("spec pin: magnitude category and EXTEND invert each other") {
    for (v <- -2047 to 2047 if v != 0) {
      val t = Jpeg.category(v)
      val bits = if (v >= 0) v else v + (1 << t) - 1
      assert(Jpeg.extend(bits, t) === v, s"v=$v")
    }
    assert(Jpeg.category(0) === 0)
    assert(Jpeg.category(1) === 1 && Jpeg.category(-1) === 1)
    assert(Jpeg.category(1024) === 11)
  }

  test("flat DC-only grayscale round-trips bit-exactly through the full pixel path") {
    for (wb <- 1 to 3; hb <- 1 to 2) {
      val v = (bx: Int, by: Int) => (37 * bx + 91 * by + 5) % 256
      val bytes = Jpeg.encode(8 * wb, 8 * hb, Array(q8), Array(flatGray(wb, hb, v)))
      val img = Jpeg.decode(bytes).getOrElse(fail(s"decode failed ${wb}x$hb"))
      assert(img.width === 8 * wb && img.height === 8 * hb && img.nComp === 1)
      for (y <- 0 until img.height; x <- 0 until img.width)
        assert(img.planes(0)(y * img.width + x) === v(x / 8, y / 8), s"($x,$y)")
    }
  }

  test("non-multiple-of-8 dimensions decode with edge crop") {
    // 20x11: 3x2 block grid cropped to the declared frame
    val bytes = Jpeg.encode(20, 11, Array(q8), Array(flatGray(3, 2, (bx, by) => 10 + 40 * bx + 100 * by)))
    val img = Jpeg.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.width === 20 && img.height === 11)
    assert(img.planes(0).length === 20 * 11)
    assert(img.planes(0)(0) === 10)
    assert(img.planes(0)(10 * 20 + 19) === 10 + 40 * 2 + 100 * 1) // bottom-right crop block
  }

  test("entropy layer is exact for arbitrary coefficients (3 components, ZRL, long runs)") {
    val rnd = new scala.util.Random(42)
    val quant = Array.tabulate(3)(c => Array.tabulate(64)(i => 1 + ((i + c * 3) % 20)))
    val planes = Array.tabulate(3) { c =>
      Array.tabulate(6) { bi =>
        val blk = new Array[Int](64)
        blk(0) = rnd.nextInt(401) - 200
        // a few scattered ACs incl. position 63 to force >15-zero runs (ZRL)
        blk(Jpeg.Zigzag(1 + rnd.nextInt(10))) = rnd.nextInt(19) - 9 match { case 0 => 7; case x => x }
        blk(Jpeg.Zigzag(35 + rnd.nextInt(20))) = 1 + rnd.nextInt(5)
        blk(Jpeg.Zigzag(63)) = -1 - rnd.nextInt(3)
        blk
      }
    }
    val bytes = Jpeg.encode(24, 16, quant, planes)
    val cf = Jpeg.decodeCoefficients(bytes).getOrElse(fail("decode failed"))
    assert(cf.nComp === 3 && cf.wBlocks === 3 && cf.hBlocks === 2)
    for (c <- 0 until 3) {
      assert(cf.quant(c).toSeq === quant(c).toSeq, s"quant table $c survives DQT round-trip")
      for (bi <- 0 until 6)
        assert(cf.planes(c)(bi).toSeq === planes(c)(bi).toSeq, s"comp $c block $bi")
    }
  }

  test("restart markers: RSTn cycle in the byte stream, predictors reset, coefficients exact") {
    val planes = Array.tabulate(1) { _ =>
      Array.tabulate(12) { bi =>
        val blk = new Array[Int](64)
        blk(0) = 100 * (bi % 5) - 200 // large DC swings across restart boundaries
        blk
      }
    }
    val bytes = Jpeg.encode(32, 24, Array(q8), planes, restartInterval = 2)
    // RST0..RST5 must appear in cycling order in the entropy stream
    val markers = bytes.sliding(2).collect {
      case Array(a, b) if (a & 0xff) == 0xff && (b & 0xff) >= 0xd0 && (b & 0xff) <= 0xd7 =>
        (b & 0xff) - 0xd0
    }.toSeq
    assert(markers === Seq(0, 1, 2, 3, 4), s"expected 5 cycling RSTn, got $markers")
    val cf = Jpeg.decodeCoefficients(bytes).getOrElse(fail("decode failed"))
    for (bi <- 0 until 12) assert(cf.planes(0)(bi)(0) === 100 * (bi % 5) - 200, s"block $bi DC")
  }

  test("forward DCT round-trip on a smooth gradient stays within quantization error") {
    val quant = Array.fill(64)(1)
    val samples = Array.tabulate(64)(i => 60 + (i % 8) * 10 + (i / 8) * 5)
    val coefs = Jpeg.fdctQuantBlock(samples, quant)
    val bytes = Jpeg.encode(8, 8, Array(quant), Array(Array(coefs)))
    val img = Jpeg.decode(bytes).getOrElse(fail("decode failed"))
    for (i <- 0 until 64)
      assert(math.abs(img.planes(0)(i) - samples(i)) <= 2, s"pixel $i: ${img.planes(0)(i)} vs ${samples(i)}")
  }

  test("cross-validation: JDK ImageIO decodes our bytes to the exact flat values") {
    val v = (bx: Int, by: Int) => (23 + 50 * bx + 17 * by) % 256
    val bytes = Jpeg.encode(24, 16, Array(q8), Array(flatGray(3, 2, v)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our stream")
    assert(img.getWidth === 24 && img.getHeight === 16)
    val raster = img.getRaster
    for (y <- 0 until 16; x <- 0 until 24)
      assert(raster.getSample(x, y, 0) === v(x / 8, y / 8), s"ImageIO pixel ($x,$y)")
  }

  test("cross-validation: our decoder reads JDK ImageIO's own JPEG output") {
    // a gently varying grayscale image keeps JPEG loss small and local
    val w = 32; val h = 24
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, 80 + x + 2 * y)
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(src, "jpg", bos), "ImageIO has no jpg writer?")
    val bytes = bos.toByteArray
    val ours = Jpeg.decode(bytes).getOrElse(fail("our decoder rejected an ImageIO baseline JPEG"))
    assert(ours.width === w && ours.height === h && ours.nComp === 1)
    // two independent IDCTs of the same coefficients: allow the standard
    // ±1 conformance slack on top of the (small) quantization loss
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs(ours.planes(0)(y * w + x) - theirs.getRaster.getSample(x, y, 0))
      assert(d <= 2, s"($x,$y): ours=${ours.planes(0)(y * w + x)} imageio=${theirs.getRaster.getSample(x, y, 0)}")
    }
  }

  test("malformed and out-of-scope inputs surface as None, never throw") {
    val good = Jpeg.encode(8, 8, Array(q8), Array(flatGray(1, 1, (_, _) => 100)))
    assert(Jpeg.decode(good).isDefined)
    assert(Jpeg.decode(null) === None)
    assert(Jpeg.decode(Array[Byte]()) === None)
    assert(Jpeg.decode("not a jpeg at all".getBytes) === None)
    assert(Jpeg.decode(good.take(20)) === None, "truncated header")
    assert(Jpeg.decode(good.dropRight(2)) === None, "missing EOI")
    assert(Jpeg.decode(good.take(good.length - 12)) === None, "truncated entropy data")
    // flip SOF0 to SOF2 (progressive) -> honestly rejected
    val prog = good.clone
    val sofAt = prog.indices.find(i => (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decode(prog) === None, "progressive must be rejected, not mis-decoded")
    // zero quant value -> rejected (would divide information away silently)
    val zq = good.clone
    val dqtAt = zq.indices.find(i => (zq(i) & 0xff) == 0xff && (zq(i + 1) & 0xff) == 0xdb).get
    zq(dqtAt + 5) = 0 // first quant entry
    assert(Jpeg.decode(zq) === None, "zero quant entry must be rejected")
    // corrupt a byte mid-entropy-stream: either still decodes (Huffman may
    // resync) or None - must never throw
    val corrupt = good.clone
    corrupt(good.length - 8) = 0x55
    Jpeg.decode(corrupt) // no exception = pass
    // a crafted 65535x65535 SOF must fail fast at the header, before any
    // frame-sized allocation (width*height would overflow Int)
    val huge = good.clone
    val sof0 = huge.indices.find(i => (huge(i) & 0xff) == 0xff && (huge(i + 1) & 0xff) == 0xc0).get
    huge(sof0 + 5) = 0xff.toByte; huge(sof0 + 6) = 0xff.toByte // height
    huge(sof0 + 7) = 0xff.toByte; huge(sof0 + 8) = 0xff.toByte // width
    assert(Jpeg.decodeHeader(huge) === None, "oversized frame must be rejected at the header")
    assert(Jpeg.decode(huge) === None)
  }

  test("4:2:0 entropy layer exact: per-component grids, interleaved MCU order, restarts") {
    // 32x32 frame, luma 2x2, chroma 1x1: mcus 2x2, luma grid 4x4 (16
    // blocks), chroma grids 2x2 (4 blocks each)
    val samp = Array((2, 2), (1, 1), (1, 1))
    val quant = Array.tabulate(3)(c => Array.tabulate(64)(i => 1 + ((i + 5 * c) % 18)))
    val grids = Seq((4, 4), (2, 2), (2, 2))
    val planes = Array.tabulate(3) { c =>
      val (gw, gh) = grids(c)
      Array.tabulate(gw * gh) { bi =>
        val blk = new Array[Int](64)
        blk(0) = 10 * c + bi - 20
        blk(Jpeg.Zigzag(1 + (bi + c) % 10)) = 1 + c + bi % 3
        blk
      }
    }
    val bytes = Jpeg.encode(32, 32, quant, planes, restartInterval = 1, sampling = samp)
    val cf = Jpeg.decodeCoefficients(bytes).getOrElse(fail("4:2:0 decode failed"))
    assert(cf.sampH.toSeq === Seq(2, 1, 1) && cf.sampV.toSeq === Seq(2, 1, 1))
    assert(cf.bw.toSeq === Seq(4, 2, 2) && cf.bh.toSeq === Seq(4, 2, 2))
    for (c <- 0 until 3; bi <- planes(c).indices)
      assert(cf.planes(c)(bi).toSeq === planes(c)(bi).toSeq, s"comp $c block $bi")
    // restart markers really present (4 MCUs, ri=1 -> 3 markers)
    val rst = bytes.sliding(2).count(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(rst === 3, s"expected 3 RSTn, got $rst")
  }

  test("4:2:0 pixel decode: native-resolution planes, flat blocks exact, odd dims crop") {
    // 20x11: mcus (2,1); luma grid 4x2 cropped to 20x11; chroma grids
    // 2x1 cropped to 10x6
    val samp = Array((2, 2), (1, 1), (1, 1))
    val q8 = Array.tabulate(64)(i => if (i == 0) 8 else 2 + (i % 9))
    def flat(gw: Int, gh: Int, v: (Int, Int) => Int) = Array.tabulate(gw * gh) { bi =>
      val c = new Array[Int](64); c(0) = v(bi % gw, bi / gw) - 128; c
    }
    val planes = Array(
      flat(4, 2, (bx, by) => 40 + 30 * bx + 20 * by),
      flat(2, 1, (bx, _) => 100 + 50 * bx),
      flat(2, 1, (bx, _) => 90 - 40 * bx))
    val bytes = Jpeg.encode(20, 11, Array(q8, q8, q8), planes, sampling = samp)
    val img = Jpeg.decode(bytes).getOrElse(fail("decode failed"))
    assert(img.compW.toSeq === Seq(20, 10, 10) && img.compH.toSeq === Seq(11, 6, 6))
    for (y <- 0 until 11; x <- 0 until 20)
      assert(img.planes(0)(y * 20 + x) === 40 + 30 * (x / 8) + 20 * (y / 8), s"luma ($x,$y)")
    for (y <- 0 until 6; x <- 0 until 10) {
      assert(img.planes(1)(y * 10 + x) === 100 + 50 * (x / 8), s"cb ($x,$y)")
      assert(img.planes(2)(y * 10 + x) === 90 - 40 * (x / 8), s"cr ($x,$y)")
    }
  }

  test("cross-validation: our decoder reads ImageIO's COLOR (4:2:0) JPEG output") {
    // a flat mid-gray color image: JPEG loss is minimal and the JFIF
    // luma of (R,G,B) is arithmetic we can check against
    val w = 48; val h = 32
    val src = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g = src.createGraphics()
    g.setColor(new java.awt.Color(120, 160, 80)); g.fillRect(0, 0, w, h); g.dispose()
    val bos = new java.io.ByteArrayOutputStream
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val bytes = bos.toByteArray
    val hdr = Jpeg.decodeHeader(bytes)
    assert(hdr === Some((w, h, 3)), s"header: $hdr")
    val img = Jpeg.decode(bytes).getOrElse(fail("our decoder rejected ImageIO's color JPEG"))
    assert(img.nComp === 3)
    // ImageIO writes 4:2:0 by default; whatever it chose, the luma
    // plane is full-res and must sit near the JFIF luma of the color
    assert(img.compW(0) === w && img.compH(0) === h)
    val expY = math.round(0.299 * 120 + 0.587 * 160 + 0.114 * 80).toInt
    for (y <- 2 until h - 2; x <- 2 until w - 2) // edges can ring slightly
      assert(math.abs(img.planes(0)(y * img.compW(0) + x) - expY) <= 3,
        s"flat-color luma ($x,$y): ${img.planes(0)(y * img.compW(0) + x)} vs $expY")
    // chroma planes exist at their native (subsampled or not) resolution
    assert(img.planes(1).length === img.compW(1) * img.compH(1))
    assert(img.compW(1) == w || img.compW(1) == w / 2, s"chroma width ${img.compW(1)}")
  }

  test("toRgb matches ImageIO's color conversion within the integer-approximation band") {
    // our own 4:2:0 color bytes, decoded by BOTH stacks: our
    // decode+toRgb vs ImageIO's full pipeline. The JFIF matrix is
    // float here and libjpeg-style fixed-point there, so allow ±2.
    val samp = Array((2, 2), (1, 1), (1, 1))
    val q8 = Array.tabulate(64)(i => if (i == 0) 8 else 1 + (i % 15))
    def flat(gw: Int, gh: Int, v: (Int, Int) => Int) = Array.tabulate(gw * gh) { bi =>
      val c = new Array[Int](64); c(0) = v(bi % gw, bi / gw) - 128; c
    }
    val planes = Array(
      flat(4, 4, (bx, by) => (60 + 30 * bx + 25 * by) % 256),
      flat(2, 2, (cx, cy) => (110 + 20 * cx + 15 * cy) % 256),
      flat(2, 2, (cx, cy) => (140 - 10 * cx + 25 * cy) % 256))
    val bytes = Jpeg.encode(32, 32, Array(q8, q8, q8), planes, sampling = samp)
    val ours = Jpeg.decode(bytes).flatMap(Jpeg.toRgb).getOrElse(fail("toRgb failed"))
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(theirs != null && theirs.getWidth === 32 && theirs.getHeight === 32)
    // compare chroma-block INTERIOR pixels only: ImageIO upsamples
    // chroma with triangular interpolation (libjpeg "fancy"), which
    // blends ACROSS chroma-block boundaries where our replication holds
    // the block value — interiors are constant under both schemes
    def interior(v: Int): Boolean = { val m = v % 16; m >= 2 && m <= 13 }
    var compared = 0
    for (y <- 0 until 32 if interior(y); x <- 0 until 32 if interior(x)) {
      val rgb = theirs.getRGB(x, y)
      val i = y * 32 + x
      assert(math.abs(ours._1(i) - ((rgb >> 16) & 0xff)) <= 2, s"R ($x,$y)")
      assert(math.abs(ours._2(i) - ((rgb >> 8) & 0xff)) <= 2, s"G ($x,$y)")
      assert(math.abs(ours._3(i) - (rgb & 0xff)) <= 2, s"B ($x,$y)")
      compared += 1
    }
    assert(compared === 24 * 24, "interior coverage")
    assert(Jpeg.toRgb(Jpeg.decode(
      Jpeg.encode(8, 8, Array(q8), Array(flat(1, 1, (_, _) => 99)))).get) === None,
      "grayscale has no RGB conversion")
  }

  test("fuzz: random corruption and truncation never throw out of the decoder") {
    val rnd = new scala.util.Random(7)
    val quant = Array.tabulate(3)(c => Array.tabulate(64)(i => 1 + ((i + c) % 17)))
    val planes = Array.tabulate(3) { c =>
      Array.tabulate(6) { bi =>
        val blk = new Array[Int](64)
        blk(0) = 50 * c - bi
        blk(Jpeg.Zigzag(1 + bi)) = c + 1
        blk
      }
    }
    val good = Jpeg.encode(24, 16, quant, planes, restartInterval = 2)
    // single-byte corruption at every position (headers, tables, entropy)
    var pos = 0
    while (pos < good.length) {
      val mut = good.clone
      mut(pos) = (mut(pos) ^ (1 + rnd.nextInt(255))).toByte
      Jpeg.decode(mut)             // Option or bust — must never throw
      Jpeg.decodeCoefficients(mut)
      pos += 1
    }
    // every truncation length
    var len = 0
    while (len < good.length) {
      Jpeg.decode(good.take(len))
      len += 1
    }
    // random garbage of random lengths
    for (_ <- 1 to 200) {
      val b = new Array[Byte](rnd.nextInt(400))
      rnd.nextBytes(b)
      Jpeg.decode(b)
      // garbage dressed in valid SOI so the marker walk engages
      if (b.length >= 2) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte; Jpeg.decode(b) }
    }
  }

  test("decodeHeader: cheap SOF probe without entropy decode") {
    val bytes = Jpeg.encode(40, 16, Array(q8, q8, q8),
      Array.fill(3)(flatGray(5, 2, (bx, by) => 10 + bx + by)))
    assert(Jpeg.decodeHeader(bytes) === Some((40, 16, 3)))
    assert(Jpeg.decodeHeader("BM not jpeg".getBytes) === None)
  }
}

/** The two driver-certified JPEG queries end-to-end on the test SF:
  * every asset must decode (no -1 sentinel rows), and the unified
  * decodeMedia seam must dispatch JPEG payloads alongside BMP/WAV.
  */
class JpegQuerySpec extends GraftTest {
  import org.apache.spark.sql.functions._

  test("mm_decode_jpeg: every asset decodes, pixels are block-flat") {
    val out = queries.PipelineQueries.all("mm_decode_jpeg")(spark, sf).cache()
    assert(out.where(col("width") === -1).count() === 0, "no decode failures")
    assert(out.where(col("px_min") =!= col("px_max")).count() === 0, "flat blocks")
    assert(out.count() > 0)
    out.unpersist()
  }

  test("certified fixtures really carry RSTn restart markers (review r12)") {
    import spark.implicits._
    def hasRst(b: Array[Byte]): Boolean =
      b.sliding(2).exists(p => (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    val docs = Graft.documents(spark, sf).limit(60)
    val gray = multimodal.Multimodal.syntheticJpegAssets(docs)
      .as[(Long, Array[Byte])].collect()
    val grayRst = gray.filter(a => hasRst(a._2)).map(_._1)
    assert(grayRst.nonEmpty, "grayscale fixture must emit restart markers")
    assert(grayRst.forall(_ % 3 == 1), "exactly the id%3==1 docs carry RSTn")
    assert(gray.filter(_._1 % 3 == 1).forall(a => hasRst(a._2)),
      "EVERY id%3==1 doc must carry RSTn (multi-MCU geometry guaranteed)")
    val coefs = multimodal.Multimodal.syntheticJpegCoefAssets(docs)
      .as[(Long, Array[Byte])].collect()
    assert(coefs.filter(_._1 % 2 == 1).forall(a => hasRst(a._2)),
      "every odd-id coef fixture must carry RSTn")
  }

  test("mm_jpeg_coefs: every block carries exactly the 3 planted ACs") {
    val out = queries.PipelineQueries.all("mm_jpeg_coefs")(spark, sf).cache()
    assert(out.where(col("comp") === -1).count() === 0, "no decode failures")
    assert(out.where(col("n_ac") =!= 3).count() === 0)
    // zigzag positions 1-10 + 30-49 + 63 bound the position sum
    assert(out.where(col("ac_pos_sum") < 94 || col("ac_pos_sum") > 122).count() === 0)
    out.unpersist()
  }

  test("decodeMedia dispatches jpeg payloads next to bmp/wav") {
    val docs = Graft.documents(spark, sf).limit(8)
    val jpegs = multimodal.Multimodal.syntheticJpegAssets(docs)
    val out = multimodal.Multimodal.decodeMedia(jpegs).cache()
    assert(out.where(col("kind") === "jpeg" && col("ok")).count() === 8)
    assert(out.where(col("channels") === 1 && col("bits") === 8).count() === 8)
    out.unpersist()
  }
}
