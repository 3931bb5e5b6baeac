package graft

import graft.multimodal.{Dsp, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The FFT kernel and the audio spectral path, certified without Spark:
  * (1) the kernel against a naive O(n²) DFT on deterministic pseudo-
  * random inputs; (2) mathematical identities — Parseval, linearity —
  * and closed forms (impulse → flat spectrum, constant → DC-only,
  * integer-bin cosine → two conjugate spikes); (3) exact dominant-bin
  * recovery for EVERY bin the fixture can emit, at int16 quantization;
  * (4) the WAV→samples→frames end-to-end path on fixture-shaped bytes.
  */
class DspSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n)
    val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  // deterministic pseudo-random doubles (no Math.random in tests either)
  private def prng(seed: Long, n: Int): Array[Double] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      (s >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
    }
  }

  test("kernel vs naive DFT: max abs error < 1e-9 across sizes") {
    for (n <- Seq(2, 4, 8, 64, 256); seed <- Seq(1L, 42L)) {
      val x = prng(seed * n, n)
      val (er, ei) = naiveDft(x)
      val re = x.clone()
      val im = new Array[Double](n)
      Dsp.fft(re, im)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-9, s"re n=$n k=$k")
        assert(math.abs(im(k) - ei(k)) < 1e-9, s"im n=$n k=$k")
      }
    }
  }

  test("closed forms: impulse is flat, constant is DC-only, cosine is two spikes") {
    val n = 64
    // delta at t=0 → X_k = 1 for all k
    val re1 = new Array[Double](n); re1(0) = 1.0
    val im1 = new Array[Double](n)
    Dsp.fft(re1, im1)
    for (k <- 0 until n) {
      assert(math.abs(re1(k) - 1.0) < 1e-12 && math.abs(im1(k)) < 1e-12, s"impulse k=$k")
    }
    // constant c → X_0 = n·c, rest 0
    val re2 = Array.fill(n)(3.5); val im2 = new Array[Double](n)
    Dsp.fft(re2, im2)
    assert(math.abs(re2(0) - 3.5 * n) < 1e-9)
    for (k <- 1 until n) assert(re2(k) * re2(k) + im2(k) * im2(k) < 1e-18, s"const k=$k")
    // cos(2π·5t/n) → re spikes n/2 at k=5 and k=n-5
    val re3 = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * 5 * t / n))
    val im3 = new Array[Double](n)
    Dsp.fft(re3, im3)
    assert(math.abs(re3(5) - n / 2.0) < 1e-9 && math.abs(re3(n - 5) - n / 2.0) < 1e-9)
    for (k <- 0 until n if k != 5 && k != n - 5)
      assert(re3(k) * re3(k) + im3(k) * im3(k) < 1e-16, s"cos k=$k")
  }

  test("Parseval: n·Σ|x|² == Σ|X|²; linearity") {
    val n = 128
    val x = prng(7L, n)
    val y = prng(13L, n)
    val (xr, xi) = (x.clone(), new Array[Double](n))
    Dsp.fft(xr, xi)
    val lhs = n * x.map(v => v * v).sum
    val rhs = (0 until n).map(k => xr(k) * xr(k) + xi(k) * xi(k)).sum
    assert(math.abs(lhs - rhs) / lhs < 1e-12, "Parseval")
    // F(2x + 3y) == 2F(x) + 3F(y)
    val (yr, yi) = (y.clone(), new Array[Double](n))
    Dsp.fft(yr, yi)
    val zr = Array.tabulate(n)(t => 2 * x(t) + 3 * y(t))
    val zi = new Array[Double](n)
    Dsp.fft(zr, zi)
    for (k <- 0 until n) {
      assert(math.abs(zr(k) - (2 * xr(k) + 3 * yr(k))) < 1e-9, s"lin re k=$k")
      assert(math.abs(zi(k) - (2 * xi(k) + 3 * yi(k))) < 1e-9, s"lin im k=$k")
    }
  }

  test("dominant bin: exact recovery for every fixture bin at int16 quantization") {
    for (k <- 1 to 31) {
      val frame = Array.tabulate(64)(t =>
        math.round(12000.0 * math.sin(2.0 * math.Pi * k * t / 64.0)).toDouble)
      val (bin, pure) = Dsp.dominantBin(frame)
      assert(bin === k, s"k=$k")
      assert(pure, s"k=$k purity")
    }
    // two equal tones → NOT pure (and ties break low)
    val mixed = Array.tabulate(64)(t =>
      1000.0 * math.sin(2.0 * math.Pi * 3 * t / 64.0) +
      1000.0 * math.sin(2.0 * math.Pi * 11 * t / 64.0))
    val (_, pure) = Dsp.dominantBin(mixed)
    assert(!pure, "two equal tones must not flag as pure")
  }

  test("size stress: 4096-point FFT matches the closed-form tone exactly") {
    val n = 4096
    val k = 137
    val re = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * k * t / n))
    val im = new Array[Double](n)
    val t0 = System.nanoTime()
    Dsp.fft(re, im)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(math.abs(re(k) - n / 2.0) < 1e-6 && math.abs(re(n - k) - n / 2.0) < 1e-6)
    for (j <- 0 until n if j != k && j != n - k)
      assert(re(j) * re(j) + im(j) * im(j) < 1e-12, s"leakage at $j")
    assert(ms < 1000, s"4096-point FFT took ${ms}ms")
  }

  test("fft input contract: non-power-of-2 and length mismatch throw") {
    intercept[IllegalArgumentException](Dsp.fft(new Array[Double](6), new Array[Double](6)))
    intercept[IllegalArgumentException](Dsp.fft(new Array[Double](8), new Array[Double](4)))
  }

  test("melCenters64 re-derives from the HTK mel formula (constants cannot drift)") {
    // mel(f) = 2595·log10(1 + f/700); 8 mel-equidistant points over
    // 0..8000 Hz, each snapped to the nearest 250 Hz FFT bin (64-sample
    // frames at 16 kHz)
    def mel(f: Double) = 2595.0 * math.log10(1.0 + f / 700.0)
    def imel(m: Double) = 700.0 * (math.pow(10.0, m / 2595.0) - 1.0)
    val derived = (0 to 7).map { i =>
      math.round(imel(mel(0.0) + i * (mel(8000.0) - mel(0.0)) / 7.0) / 250.0).toInt
    }
    assert(derived === Multimodal.melCenters64.toSeq, s"derived=$derived")
    // strictly increasing (the filterbank's structural precondition)
    assert(Multimodal.melCenters64.sliding(2).forall(p => p(1) > p(0)))
  }

  test("melBandMilli: pure integer-bin tones report exactly the triangular weights") {
    val cs = Multimodal.melCenters64
    // exact rational replay, the oracle's arithmetic: (2000p + q) / (2q)
    def expected(k: Int): Seq[Long] = (1 to cs.length - 2).map { m =>
      val a = cs(m - 1); val c = cs(m); val b = cs(m + 1)
      if (k > a && k <= c) (2000L * (k - a) + (c - a)) / (2L * (c - a))
      else if (k > c && k < b) (2000L * (b - k) + (b - c)) / (2L * (b - c))
      else 0L
    }
    for (k <- 1 to 31) {
      val frame = Array.tabulate(64)(t =>
        math.round(12000.0 * math.sin(2.0 * math.Pi * k * t / 64.0)).toDouble)
      val got = Dsp.melBandMilli(frame, cs).toSeq
      assert(got === expected(k), s"k=$k")
    }
  }

  test("melBandMilli vs naive DFT filterbank on pseudo-random frames") {
    val cs = Multimodal.melCenters64
    for (seed <- Seq(3L, 99L)) {
      val x = prng(seed, 64).map(v => math.round(v * 12000.0).toDouble)
      val (er, ei) = naiveDft(x)
      val pow = (0 until 32).map(k => er(k) * er(k) + ei(k) * ei(k))
      val eTot = (1 to 31).map(pow).sum
      val want = (1 to cs.length - 2).map { m =>
        val a = cs(m - 1); val c = cs(m); val b = cs(m + 1)
        val e = (math.max(1, a + 1) to c).map(k => pow(k) * (k - a).toDouble / (c - a)).sum +
          (math.max(1, c + 1) until b).filter(_ < 32).map(k => pow(k) * (b - k).toDouble / (b - c)).sum
        math.floor(1000.0 * e / eTot + 0.5).toLong
      }
      assert(Dsp.melBandMilli(x, cs).toSeq === want, s"seed=$seed")
    }
  }

  test("melBandMilli contract: silent frame is all zeros; bad centers throw") {
    assert(Dsp.melBandMilli(new Array[Double](64), Multimodal.melCenters64).forall(_ == 0L))
    intercept[IllegalArgumentException](
      Dsp.melBandMilli(new Array[Double](64), Array(0, 5, 3))) // not increasing
    intercept[IllegalArgumentException](
      Dsp.melBandMilli(new Array[Double](64), Array(0, 16, 40))) // beyond Nyquist
    intercept[IllegalArgumentException](
      Dsp.melBandMilli(new Array[Double](64), Array(0, 32))) // no filter
  }

  test("decimation aliasing law: k<16 stays, k>16 folds to 32-k, k=16 is EXACT silence") {
    for (k <- 1 to 31) {
      val frame = Array.tabulate(64)(t =>
        math.round(12000.0 * math.sin(2.0 * math.Pi * k * t / 64.0)).toDouble)
      val dec = Array.tabulate(32)(t => frame(2 * t))
      if (k == 16) {
        // sin(πt) rounds to a HARD integer zero at every sample — the
        // silence flag has no float surface
        assert(dec.forall(_ == 0.0), "k=16 must decimate to exact zeros")
        val (bin, pure) = Dsp.dominantBin(dec)
        assert(bin === 1 && pure, "all-zero argmax must be deterministic (first index)")
      } else {
        val expect = if (k < 16) k else 32 - k
        val (bin, pure) = Dsp.dominantBin(dec)
        assert(bin === expect, s"k=$k must land at $expect")
        assert(pure, s"k=$k stays a pure tone after decimation")
      }
    }
  }

  test("end to end on fixture-shaped WAV bytes: frames, bins, purity") {
    // replicate syntheticToneWavAssets for id = 6 (3 frames) without Spark
    val id = 6L
    val nFrames = 1 + (id % 4).toInt
    val data = new Array[Byte](nFrames * 64 * 2)
    for (f <- 0 until nFrames; t <- 0 until 64) {
      val k = 1 + ((id + 3 * f) % 31).toInt
      val v = math.round(12000.0 * math.sin(2.0 * math.Pi * k * t / 64.0)).toInt
      data((f * 64 + t) * 2) = (v & 0xff).toByte
      data((f * 64 + t) * 2 + 1) = ((v >> 8) & 0xff).toByte
    }
    val wav = Multimodal.Codec.wav(16000, 1, 16, data)
    val (info, pcm) = Multimodal.Codec.decodeWavData(wav).get
    assert(info.channels === 1 && info.bitsPerSample === 16 && info.nSamples === nFrames * 64L)
    val samples = Dsp.pcm16Samples(pcm)
    assert(samples.length === nFrames * 64)
    // negative samples must read back sign-correct (little-endian int16)
    assert(samples.exists(_ < 0), "sine must produce negative samples")
    for (f <- 0 until nFrames) {
      val frame = java.util.Arrays.copyOfRange(samples, f * 64, (f + 1) * 64)
      val (bin, pure) = Dsp.dominantBin(frame)
      assert(bin === 1 + ((id + 3 * f) % 31).toInt, s"frame $f")
      assert(pure, s"frame $f purity")
    }
  }
}
