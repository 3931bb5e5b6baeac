package graft.multimodal

/** Pure-JVM DSP kernels for the audio feature-extraction seam: an
  * in-place iterative radix-2 Cooley–Tukey FFT plus the frame-level
  * spectral features a training-data pipeline derives from audio
  * (dominant frequency bin, tonal-purity flag). Zero dependencies —
  * `java.lang.Math` only.
  *
  * Certification story: the `mm_audio_fft` fixture writes real PCM WAVs
  * whose frames are pure sinusoids at INTEGER bins (frequency = k
  * cycles per frame, k from an integer formula over doc_id), so the
  * frame's DFT concentrates at bin k exactly and `argmax |X|²` over the
  * positive-frequency bins recovers k with a 4-orders-of-magnitude
  * margin over the int16 quantization noise floor — the oracle replays
  * k arithmetically and states the purity flag as literal TRUE, with no
  * cross-engine floating-point surface at all. DspSpec certifies the
  * kernel itself against a naive O(n²) DFT, Parseval's identity, known
  * closed forms (impulse, constant, single tone), and exact bin
  * recovery for every k.
  *
  * Reference context: the reference repo has no DSP surface
  * (kafka-streams-demo processes text topics only); this is
  * beyond-reference pipeline capability, the audio sibling of the
  * JPEG/PNG image codecs.
  */
object Dsp {

  /** In-place iterative radix-2 FFT (decimation-in-time, negative-
    * exponent convention). `re.length` must be a power of two.
    */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"fft length must be a power of 2: $n")
    // bit-reversal permutation
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    // butterfly passes
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cr = 1.0
        var ci = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val xr = re(base + k + half); val xi = im(base + k + half)
          val vr = xr * cr - xi * ci
          val vi = xr * ci + xi * cr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr
          cr = ncr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Dominant positive-frequency bin of one real frame: argmax of |X_k|²
    * over k = 1 .. n/2 - 1 (DC and Nyquist excluded — a pipeline flags
    * DC offset and foldover separately), plus a purity flag: the peak
    * carries > `purityFactor`× the energy of the runner-up bin. Ties
    * break to the LOWEST bin so the result is deterministic.
    */
  def dominantBin(frame: Array[Double], purityFactor: Double = 16.0): (Int, Boolean) = {
    val n = frame.length
    // below 4 samples the k = 1 .. n/2-1 scan range is empty — the
    // "dominant bin" would be reported without ever being measured
    require(n >= 4, s"dominantBin needs at least 4 samples: $n")
    val re = java.util.Arrays.copyOf(frame, n)
    val im = new Array[Double](n)
    fft(re, im)
    var best = 1
    var bestM = -1.0
    var second = -1.0
    var k = 1
    while (k < n / 2) {
      val m = re(k) * re(k) + im(k) * im(k)
      if (m > bestM) { second = bestM; bestM = m; best = k }
      else if (m > second) second = m
      k += 1
    }
    (best, second <= 0.0 || bestM > purityFactor * second)
  }

  /** Triangular-filterbank band energies of one real frame, reported as
    * integer MILLI-fractions of the total positive-frequency power:
    * `out(m-1) = round(1000 · E_m / E_tot)` where
    * `E_m = Σ_k w_m(k)·|X_k|²` over bins k = 1 .. n/2-1 (DC and Nyquist
    * excluded, matching [[dominantBin]]'s convention) and `E_tot` is the
    * unweighted sum over the same bins. `centers` are the filterbank's
    * integer FFT-bin edges/peaks (HTK convention: filter m rises over
    * (centers(m-1), centers(m)] and falls over (centers(m), centers(m+1)),
    * so M = centers.length - 2 filters). Integer bin centers are exactly
    * what HTK-style mel implementations use (mel-spaced frequencies
    * rounded to the FFT grid); keeping them integral makes every
    * triangular weight a small rational, so a pure integer-bin tone
    * yields band fractions the oracle replays in exact integer
    * arithmetic ((2000p + q) div 2q). round = floor(x + 1/2): the noise
    * floor (int16 rounding, ~1e-10 relative) sits 6 orders of magnitude
    * inside the nearest quantization boundary, so the milli values are
    * hash-stable. A silent frame (E_tot = 0) reports all-zero bands.
    */
  def melBandMilli(frame: Array[Double], centers: Array[Int]): Array[Long] = {
    val n = frame.length
    require(centers.length >= 3, "need at least one filter (3 edge points)")
    var ci = 1
    while (ci < centers.length) {
      require(centers(ci) > centers(ci - 1), s"centers must strictly increase: ${centers.mkString(",")}")
      ci += 1
    }
    require(centers(0) >= 0 && centers.last <= n / 2,
      s"centers must lie in [0, n/2]: ${centers.mkString(",")} vs n=$n")
    val re = java.util.Arrays.copyOf(frame, n)
    val im = new Array[Double](n)
    fft(re, im)
    val pow = new Array[Double](n / 2)
    var eTot = 0.0
    var k = 1
    while (k < n / 2) {
      pow(k) = re(k) * re(k) + im(k) * im(k)
      eTot += pow(k)
      k += 1
    }
    val nFilters = centers.length - 2
    val out = new Array[Long](nFilters)
    var m = 1
    while (m <= nFilters) {
      val a = centers(m - 1); val c = centers(m); val b = centers(m + 1)
      var e = 0.0
      var kk = math.max(1, a + 1)
      while (kk <= c && kk < n / 2) { e += pow(kk) * (kk - a).toDouble / (c - a); kk += 1 }
      kk = math.max(1, c + 1)
      while (kk < b && kk < n / 2) { e += pow(kk) * (b - kk).toDouble / (b - c); kk += 1 }
      out(m - 1) = if (eTot <= 0.0) 0L else math.floor(1000.0 * e / eTot + 0.5).toLong
      m += 1
    }
    out
  }

  /** Little-endian int16 samples of a PCM data chunk (mono layout —
    * callers pass the data of a 1-channel WAV).
    */
  def pcm16Samples(data: Array[Byte]): Array[Double] = {
    val n = data.length / 2
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      out(i) = ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toDouble
      i += 1
    }
    out
  }
}
