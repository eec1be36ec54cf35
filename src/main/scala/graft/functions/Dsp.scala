package graft.functions

/** Minimal real DSP kernel: an iterative in-place radix-2 Cooley–Tukey
  * FFT (the textbook public algorithm). Pure JVM, allocation-light —
  * the per-window kernel behind x61's spectral band energies, the
  * audio analogue of the PPM/WAV codecs: real math, not a stub.
  *
  * Contract is pinned by `DspSpec`: agreement with a naive O(n²) DFT,
  * Parseval's theorem against time-domain energy, impulse → flat
  * spectrum, constant → DC-only.
  */
object Dsp {

  /** In-place FFT of the complex signal (re, im). Length must be a
    * power of two. Forward transform, no normalization (X_k =
    * Σ x_n e^{-2πikn/N}). */
  def fft(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n == im.length, "re/im length mismatch")
    require(n > 0 && (n & (n - 1)) == 0, s"FFT length must be a power of two, got $n")

    // bit-reversal permutation
    var i = 1; var j = 0
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

    // butterflies. StrictMath twiddles: Math.cos/sin may use platform
    // intrinsics with platform-dependent low bits, StrictMath is
    // bit-identical everywhere — so a spectrum computed on one executor
    // architecture equals the same window computed on another.
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = StrictMath.cos(ang); val wi = StrictMath.sin(ang)
      var blk = 0
      while (blk < n) {
        var cr = 1.0; var ci = 0.0
        var k = 0
        while (k < len / 2) {
          val a = blk + k; val b = blk + k + len / 2
          val xr = re(b) * cr - im(b) * ci
          val xi = re(b) * ci + im(b) * cr
          re(b) = re(a) - xr; im(b) = im(a) - xi
          re(a) += xr;        im(a) += xi
          val ncr = cr * wr - ci * wi
          ci = cr * wi + ci * wr; cr = ncr
          k += 1
        }
        blk += len
      }
      len <<= 1
    }
  }

  /** One-sided power spectrum of a real signal: |X_k|² for
    * k = 0 .. n/2 (inclusive — DC through Nyquist). */
  def powerSpectrum(signal: Array[Double]): Array[Double] = {
    val n = signal.length
    val re = signal.clone(); val im = new Array[Double](n)
    fft(re, im)
    Array.tabulate(n / 2 + 1)(k => re(k) * re(k) + im(k) * im(k))
  }
}
