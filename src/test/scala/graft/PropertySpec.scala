package graft

import graft.dedup.Dedup
import graft.functions.{CmsEstimator, TextFunctions}
import java.util.regex.Pattern
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Generator-driven property tests (SURVEY §5: the reference has none —
  * this layer is one of the things we add). These exercise the pure-JVM
  * contracts of the engine's building blocks across generated inputs;
  * the Spark-evaluated counterparts live in the other suites.
  */
class PropertySpec extends AnyFunSuite {

  private def checkProp(p: Prop, tests: Int = 200): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(tests), p)
    assert(r.passed, r.status.toString)
  }

  // ---- CMS overestimate-only guarantee ------------------------------------

  test("property: CMS estimates never undercount, and CmsEstimator agrees with the sketch") {
    val genWords = Gen.nonEmptyListOf(Gen.chooseNum(0, 50).map(i => s"w$i"))
    checkProp(Prop.forAll(genWords) { words =>
      val sk = org.apache.spark.util.sketch.CountMinSketch.create(0.01, 0.95, 7)
      words.foreach(sk.add)
      val bos = new java.io.ByteArrayOutputStream()
      sk.writeTo(bos)
      val bytes = bos.toByteArray
      val est = new CmsEstimator
      val exact = words.groupBy(identity).view.mapValues(_.size.toLong)
      exact.forall { case (w, n) =>
        val e = est(bytes.clone(), w)
        e >= n && e == sk.estimateCount(w)
      }
    })
  }

  // ---- PII regex contracts ------------------------------------------------

  private val local = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)
  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)

  test("property: every generated email/IPv4 is matched; plain words never are") {
    val genEmail = for {
      l <- local; d <- word; tld <- Gen.oneOf("com", "org", "net", "io")
    } yield s"$l@$d.$tld"
    val genIp = for {
      a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
      c <- Gen.chooseNum(0, 255); d <- Gen.chooseNum(0, 255)
    } yield s"$a.$b.$c.$d"
    val email = Pattern.compile(TextFunctions.emailPattern)
    val ip = Pattern.compile(TextFunctions.ipv4Pattern)
    val phone = Pattern.compile(TextFunctions.phonePattern)
    checkProp(Prop.forAll(genEmail) { e => email.matcher(s"x $e y").find() })
    checkProp(Prop.forAll(genIp) { i => ip.matcher(s"x $i y").find() })
    checkProp(Prop.forAll(Gen.nonEmptyListOf(word).map(_.mkString(" "))) { t =>
      !email.matcher(t).find() && !ip.matcher(t).find() && !phone.matcher(t).find()
    })
    // long digit runs (card/order ids, >= 14 digits) must NOT phone-match:
    // the anchored pattern may not nibble their trailing digits
    checkProp(Prop.forAll(Gen.chooseNum(14, 24), Gen.chooseNum(1, 9)) { (len, d) =>
      val run = d.toString * len
      !phone.matcher(s"id $run end").find()
    })
  }

  test("property: US-shaped phone numbers match with or without country code and separators") {
    val genPhone = for {
      cc <- Gen.oneOf("", "+1 ", "1-")
      sep <- Gen.oneOf("-", ".", " ")
      paren <- Gen.oneOf(true, false)
      a <- Gen.chooseNum(200, 999); b <- Gen.chooseNum(200, 999); c <- Gen.chooseNum(1000, 9999)
    } yield if (paren) s"$cc($a) $b$sep$c" else s"$cc$a$sep$b$sep$c"
    val phone = Pattern.compile(TextFunctions.phonePattern)
    checkProp(Prop.forAll(genPhone) { p => phone.matcher(s"call $p now").find() })
  }

  // ---- MinHash permutation preconditions ----------------------------------

  test("property: minhash permutation multipliers are odd (bijective mod 2^64) and stable") {
    checkProp(Prop.forAll(Gen.chooseNum(1, 256)) { n =>
      val c = Dedup.minhashCoeffs(n)
      c.length == n && c.forall { case (a, _) => (a & 1L) == 1L } &&
        c == Dedup.minhashCoeffs(n) // same seed → same permutations, every call
    }, tests = 50)
  }

  // ---- native text kernels vs regex references ----------------------------
  // The byte-scan kernels' exactness contract lives at run boundaries,
  // case folding, and 4dp rounding — generated mixed text hits all of it.

  private val genText: Gen[String] = Gen.listOf(Gen.frequency(
    6 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('_', '!', '.', ',', '?', '@', '#', '-', '\''),
    2 -> Gen.oneOf(' ', '\t', '\n'),
    1 -> Gen.oneOf("the", "and", "la", "und", "is", "est").map(_.head) // bias letters
  )).map(_.mkString)

  private def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def refTokens(text: String): Seq[String] =
    text.toLowerCase.split("\\W+").toSeq.filter(_.nonEmpty)

  test("property: text_stats kernel matches the regex reference on generated text") {
    checkProp(Prop.forAll(genText) { text =>
      val row = graft.functions.TextStats.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val toks = refTokens(text)
      val wsToks = text.split("\\s+").count(_.nonEmpty)
      val punct = text.replaceAll("[\\w\\s]", "").length
      val stops = toks.count(TextFunctions.stopwords.contains)
      val meanLen = round4(toks.map(_.length).sum.toDouble / math.max(toks.size, 1).toDouble)
      val punctRatio = round4(punct.toDouble / math.max(text.length, 1).toDouble)
      row.getInt(0) == wsToks &&
        row.getInt(1) == toks.size + punct &&
        row.getDouble(2) == punctRatio &&
        row.getDouble(3) == round4(stops.toDouble / math.max(toks.size, 1).toDouble) &&
        row.getDouble(4) == meanLen &&
        row.getBoolean(5) == (text.length >= 20 && wsToks >= 5 &&
          punctRatio < 0.3 && meanLen >= 2.0 && meanLen <= 12.0)
    })
  }

  test("property: nfkc_casefold is idempotent, matches the JDK chain, and fast-paths ASCII-lower") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.NfkcCasefold
    // unicode-heavy generator: ASCII text salted with compatibility
    // forms, combining marks, case, and fullwidth/superscript chars
    val genUni: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      2 -> Gen.oneOf(' ', '_', '.', '-'),
      1 -> Gen.oneOf('ﬁ', 'Ａ', 'ａ', '²', '⁵', '½'),
      1 -> Gen.oneOf('é', '́', '̈', 'É', 'ß', 'Σ', 'σ', 'ς'),
      1 -> Gen.alphaUpperChar
    )).map(_.mkString)
    def k(s: String): String = NfkcCasefold.compute(UTF8String.fromString(s)).toString
    def ref(s: String): String = {
      val n = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFKC)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i < n.length) {
        val cp = n.codePointAt(i)
        sb.appendCodePoint(Character.toLowerCase(Character.toUpperCase(cp)))
        i += Character.charCount(cp)
      }
      val f = sb.toString
      if (java.text.Normalizer.isNormalized(f, java.text.Normalizer.Form.NFKC)) f
      else java.text.Normalizer.normalize(f, java.text.Normalizer.Form.NFKC)
    }
    checkProp(Prop.forAll(genUni) { s =>
      val once = k(s)
      once == ref(s) && k(once) == once // reference equality + idempotence
    })
    // fast path: ASCII with no uppercase must return the SAME buffer
    val genAsciiLower: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaLowerChar, 2 -> Gen.numChar,
      1 -> Gen.oneOf(' ', '_', '.', '-', '!'))).map(_.mkString)
    checkProp(Prop.forAll(genAsciiLower) { s =>
      val u = UTF8String.fromString(s)
      NfkcCasefold.compute(u) eq u
    })
  }

  test("property: cross_modal_score kernel == the reference towers on generated pairs") {
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.{CrossModalScore, ShingleHashes}
    val dim = 8
    val buckets = 1 << 20
    def wT(x: Long) = (x * 2654435761L + 104729L) % 2001L - 1000L
    val gen = for {
      text <- genText
      hi <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
      lo <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    } yield (text, hi, lo)
    checkProp(Prop.forAll(gen) { case (text, hi, lo) =>
      val row = CrossModalScore.compute(UTF8String.fromString(text), hi, lo, buckets, dim)
      // reference: tokenHashArray (the shared tokenizer) + naive towers
      val hs = ShingleHashes.tokenHashArray(UTF8String.fromString(text))
      val tv = Array.tabulate(dim) { dd =>
        hs.map(h => wT((((h % buckets) + buckets) % buckets) * dim + dd)).sum
      }
      val iv = Array.tabulate(dim) { dd =>
        (0 until 64).map { b =>
          val bit = if (b < 32) (lo >>> b) & 1L else (hi >>> (b - 32)) & 1L
          bit * CrossModalScore.imageWeight(b.toLong * dim + dd)
        }.sum
      }
      val score = (0 until dim).map(dd => tv(dd) * iv(dd)).sum
      row.getInt(0) == hs.length && row.getLong(1) == score
    })
  }

  test("property: repetition_stats kernel matches the string-based reference") {
    checkProp(Prop.forAll(genText) { text =>
      val row = graft.functions.RepetitionStats.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val toks = refTokens(text)
      def dup(k: Int): Double = {
        val grams = if (toks.size >= k) toks.sliding(k).map(_.mkString(" ")).toSeq else toks
        round4(1.0 - grams.distinct.size.toDouble / math.max(grams.size, 1).toDouble)
      }
      val topOk =
        if (toks.isEmpty) row.getInt(3) == 0
        else row.getDouble(2) == round4(
          toks.groupBy(identity).values.map(_.size).max.toDouble / toks.size.toDouble)
      row.getDouble(0) == dup(2) && row.getDouble(1) == dup(3) &&
        row.getInt(3) == toks.size && topOk
    })
  }

  test("property: lang_scores kernel matches the reference marker argmax") {
    val genMarked = for {
      base <- genText
      markers <- Gen.listOf(Gen.oneOf(TextFunctions.langMarkers.values.flatten.toSeq))
    } yield (base.split(" ").toSeq ++ markers).mkString(" ")
    checkProp(Prop.forAll(genMarked) { text =>
      val row = graft.functions.LangScores.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text))
      val toks = refTokens(text)
      val langs = TextFunctions.langMarkers.keys.toSeq.sorted
      val scores = langs.map(l => toks.count(TextFunctions.langMarkers(l).contains))
      val pred =
        if (scores.forall(_ <= 0)) "und"
        else langs(scores.indexOf(scores.max)) // first alphabetical strict max
      langs.indices.forall(i => row.getInt(i) == scores(i)) &&
        row.getUTF8String(5).toString == pred
    })
  }

  // ---- canonical_url kernel == regex chain --------------------------------

  /** The Column chain's exact semantics in plain Java regex (Spark's
    * regexp_replace/regexp_extract ARE java.util.regex), as the fuzz
    * reference for the single-pass kernel.
    */
  private def canonicalChainRef(u: String): String = {
    import java.util.Locale
    def extract(p: String, s: String): String = {
      val m = Pattern.compile(p).matcher(s)
      if (m.find()) Option(m.group(1)).getOrElse("") else ""
    }
    val noFrag = u.replaceAll("#.*", "")
    val scheme = extract("^([A-Za-z][A-Za-z0-9+.-]*)://", noFrag).toLowerCase(Locale.ROOT)
    val hostport = extract("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", noFrag).toLowerCase(Locale.ROOT)
    val host =
      if (scheme == "https") hostport.replaceAll(":443$", "")
      else if (scheme == "http") hostport.replaceAll(":80$", "")
      else hostport
    val rest0 = extract("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$", noFrag)
    val rest = rest0.replaceAll("([?&])utm_[A-Za-z_]+=[^&]*", "$1")
      .replaceAll("&&+", "&").replaceAll("\\?&", "?").replaceAll("[?&]+$", "")
      .replaceAll("/\\?", "?").replaceAll("/$", "")
    scheme + "://" + host + rest
  }

  test("property: canonical_url kernel matches the regex chain on URL-shaped and random input") {
    val genScheme = Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp", "a+b-c", "s3")
    val genHost = for {
      name <- Gen.oneOf("Example.COM", "h.io", "X", "a-b.c.d", "")
      port <- Gen.oneOf("", ":443", ":80", ":8080", ":443:443")
    } yield name + port
    val genParam = Gen.oneOf("utm_source=x", "utm_a=1", "utm_=bad", "utm_b2=z",
      "id=7", "q=a/b", "utm_campaign=", "z=")
    val genUrl = for {
      sch <- genScheme
      sep <- Gen.oneOf("://", ":/", "")
      host <- genHost
      path <- Gen.oneOf("", "/", "/P/q", "/a/", "//")
      ps <- Gen.listOf(genParam)
      qm <- Gen.oneOf("", "?", "?&")
      frag <- Gen.oneOf("", "#f", "#a#b")
    } yield sch + sep + host + path + qm + ps.mkString("&") + frag
    val genRandom = Gen.listOf(
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(':', '/', '?', '&', '=', '#', '.', '_', '-')))
      .map(_.mkString)
    checkProp(Prop.forAll(Gen.oneOf(genUrl, genRandom)) { u =>
      val native = graft.functions.CanonicalUrl.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(u)).toString
      native == canonicalChainRef(u)
    }, tests = 500)
  }

  // ---- ANN kernel selection order vs the Scala sortBy it replaced ---------

  test("property: AnnKernels.topIdx == indices.sortBy((neg(i), i)).take(n), incl ±0.0/NaN/dups") {
    // the kernels replay the retired UDFs' `sortBy { case (s,i) => (-s,i) }`
    // selection; the comparator must match Scala's total Double order on
    // the NEGATED key exactly — ±0.0 asymmetry and NaN placement included
    val genVal = Gen.frequency(
      (8, Gen.chooseNum(-10.0, 10.0)),
      (1, Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity)),
      (2, Gen.chooseNum(-3, 3).map(_.toDouble))) // dups force index ties
    val gen = for {
      xs <- Gen.listOf(genVal)
      n <- Gen.chooseNum(1, 20)
    } yield (xs.toArray, n)
    checkProp(Prop.forAll(gen) { case (neg, n) =>
      val expected = neg.indices.sortBy(i => (neg(i), i)).take(n)
      val got = graft.functions.AnnKernels.topIdx(neg, n).toSeq
      got == expected
    }, tests = 500)
  }

  // ---- JPEG entropy layer: lossless round-trip on ARBITRARY planes ------

  test("property: JPEG entropy layer round-trips arbitrary coefficient planes") {
    // generator-driven twin of JpegSpec's fixed cases: random frame
    // geometry, sampling layout, quant tables, restart intervals, and
    // sparse random coefficients must survive encode -> decodeCoefficients
    // bit-exactly — the entropy layer is lossless BY CONTRACT for every
    // conformant input, not just the certified fixtures
    import graft.multimodal.Jpeg
    val genCase = for {
      nComp <- Gen.chooseNum(1, 3)
      samp0 <- if (nComp == 1) Gen.const((1, 1))
               else Gen.oneOf((1, 1), (2, 1), (1, 2), (2, 2))
      mcusX <- Gen.chooseNum(1, 3)
      mcusY <- Gen.chooseNum(1, 2)
      ri <- Gen.chooseNum(0, 3)
      qSeed <- Gen.chooseNum(1, 200)
      coefSeed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (nComp, samp0, mcusX, mcusY, ri, qSeed, coefSeed)
    checkProp(Prop.forAll(genCase) { case (nComp, samp0, mcusX, mcusY, ri, qSeed, coefSeed) =>
      val samp = Array.tabulate(nComp)(c => if (c == 0) samp0 else (1, 1))
      val hMax = samp.map(_._1).max
      val vMax = samp.map(_._2).max
      val width = 8 * hMax * mcusX
      val height = 8 * vMax * mcusY
      val quant = Array.tabulate(nComp)(c =>
        Array.tabulate(64)(i => 1 + ((i * 7 + qSeed + c) % 255)))
      val rnd = new scala.util.Random(coefSeed)
      val planes = Array.tabulate(nComp) { c =>
        Array.tabulate(samp(c)._1 * mcusX * samp(c)._2 * mcusY) { _ =>
          val blk = new Array[Int](64)
          blk(0) = rnd.nextInt(1801) - 900
          (0 until rnd.nextInt(6)).foreach { _ =>
            blk(Jpeg.Zigzag(1 + rnd.nextInt(63))) = rnd.nextInt(1001) - 500
          }
          blk
        }
      }
      val bytes = Jpeg.encode(width, height, quant, planes, ri, samp)
      Jpeg.decodeCoefficients(bytes) match {
        case Some(cf) =>
          cf.width == width && cf.height == height && cf.nComp == nComp &&
            (0 until nComp).forall { c =>
              cf.quant(c).sameElements(quant(c)) &&
                cf.planes(c).length == planes(c).length &&
                cf.planes(c).indices.forall(bi => cf.planes(c)(bi).sameElements(planes(c)(bi)))
            }
        case None => false
      }
    }, tests = 200)
  }

  // ---- BM25 integer-rational algebra == the float Okapi formula ---------

  test("property: the exact-integer BM25 saturation term equals the float Okapi form") {
    // the certified query computes tf(k1+1)/(tf + k1(1-b) + k1·b·dl/avgdl)
    // as 22·tot·tf / (10·tot·tf + 3·tot + 9·dl·N) with k1=6/5, b=3/4,
    // avgdl=tot/N — the algebra must agree with the textbook float form
    // to within float error for any positive inputs
    val gen = for {
      tf <- Gen.chooseNum(1L, 1000L)
      dl <- Gen.chooseNum(1L, 100000L)
      n <- Gen.chooseNum(1L, 1000000L)
      avg <- Gen.chooseNum(1L, 10000L)
    } yield (tf, dl, n, n * avg) // tot = n · avgdl keeps inputs consistent
    checkProp(Prop.forAll(gen) { case (tf, dl, n, tot) =>
      val rational = (22.0 * tot * tf) / (10.0 * tot * tf + 3.0 * tot + 9.0 * dl * n)
      val avgdl = tot.toDouble / n
      val okapi = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
      math.abs(rational - okapi) <= 1e-9 * math.max(rational.abs, okapi.abs)
    }, tests = 500)
  }

  // ---- PNG filter + DEFLATE layer round-trips any raster -----------------

  test("property: PNG round-trips arbitrary rasters across filters, splits, color types") {
    // generator-driven twin of PngSpec's fixed cases: random geometry,
    // channel count, per-scanline filter assignment, and IDAT split must
    // survive encode -> decode byte-exactly — PNG is lossless BY
    // CONTRACT for every conformant input, not just the fixtures
    import graft.multimodal.Png
    val genCase = for {
      w <- Gen.chooseNum(1, 24)
      h <- Gen.chooseNum(1, 24)
      ch <- Gen.oneOf(1, 3)
      split <- Gen.chooseNum(1, 4)
      filtSeed <- Gen.chooseNum(0, 1000)
      pxSeed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (w, h, ch, split, filtSeed, pxSeed)
    checkProp(Prop.forAll(genCase) { case (w, h, ch, split, filtSeed, pxSeed) =>
      val rnd = new scala.util.Random(pxSeed)
      val px = Array.fill(w * h * ch)(rnd.nextInt(256).toByte)
      val bytes = Png.encode(w, h, ch, px,
        filterFor = y => (filtSeed + y * 7) % 5, idatSplit = split)
      Png.decode(bytes) match {
        case Some(img) =>
          img.width == w && img.height == h && img.channels == ch &&
            java.util.Arrays.equals(img.pixels, px) &&
            Png.decodeHeader(bytes).contains((w, h, ch))
        case None => false
      }
    }, tests = 300)
  }

  // ---- AVI container round-trips arbitrary frame payloads ----------------

  test("property: MJPEG-AVI round-trips arbitrary frame payloads and geometry") {
    // the container is payload-agnostic BY CONTRACT: any byte sequence
    // (odd/even lengths — both word-alignment paths), any frame count,
    // any declared geometry must survive encode -> decode byte-exactly
    import graft.multimodal.Avi
    val genCase = for {
      w <- Gen.chooseNum(1, 4096)
      h <- Gen.chooseNum(1, 4096)
      fps <- Gen.chooseNum(1, 120)
      nFrames <- Gen.chooseNum(1, 12)
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (w, h, fps, nFrames, seed)
    checkProp(Prop.forAll(genCase) { case (w, h, fps, nFrames, seed) =>
      val rnd = new scala.util.Random(seed)
      val frames = Seq.fill(nFrames)(Array.fill(rnd.nextInt(600) + 1)(rnd.nextInt(256).toByte))
      Avi.decode(Avi.encode(w, h, fps, frames)) match {
        case Some((info, got)) =>
          info.width == w && info.height == h && info.nFrames == nFrames &&
            info.microSecPerFrame == 1000000 / fps &&
            got.length == nFrames &&
            got.zip(frames).forall { case (a, b) => java.util.Arrays.equals(a, b) }
        case None => false
      }
    }, tests = 300)
  }

  // ---- FFT kernel == naive DFT on arbitrary signals ----------------------

  test("property: FFT matches the naive DFT and satisfies Parseval on random signals") {
    import graft.multimodal.Dsp
    val genCase = for {
      logN <- Gen.chooseNum(1, 8) // n = 2..256
      seed <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (1 << logN, seed)
    checkProp(Prop.forAll(genCase) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val re = x.clone(); val im = new Array[Double](n)
      Dsp.fft(re, im)
      // naive DFT
      var ok = true
      var k = 0
      while (ok && k < n) {
        var er = 0.0; var ei = 0.0
        var t = 0
        while (t < n) {
          val ang = -2.0 * math.Pi * k * t / n
          er += x(t) * math.cos(ang); ei += x(t) * math.sin(ang)
          t += 1
        }
        ok = math.abs(re(k) - er) < 1e-8 && math.abs(im(k) - ei) < 1e-8
        k += 1
      }
      val lhs = n * x.map(v => v * v).sum
      val rhs = (0 until n).map(i => re(i) * re(i) + im(i) * im(i)).sum
      ok && math.abs(lhs - rhs) <= 1e-9 * math.max(lhs, 1.0)
    }, tests = 200)
  }

}
