package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The FFT kernel's mathematical contract — these are the invariants
  * that make x61's band energies trustworthy without a SQL oracle
  * (no engine on the oracle side can run an FFT). */
class DspSpec extends AnyFunSuite {

  private def naiveDft(x: Array[Double]): (Array[Double], Array[Double]) = {
    val n = x.length
    val re = new Array[Double](n); val im = new Array[Double](n)
    for (k <- 0 until n; t <- 0 until n) {
      val ang = -2.0 * math.Pi * k * t / n
      re(k) += x(t) * math.cos(ang)
      im(k) += x(t) * math.sin(ang)
    }
    (re, im)
  }

  test("fft agrees with the naive DFT on random signals") {
    val rnd = new scala.util.Random(17)
    Seq(2, 8, 64, 256).foreach { n =>
      val x = Array.fill(n)(rnd.nextDouble() * 2 - 1)
      val (er, ei) = naiveDft(x)
      val re = x.clone(); val im = new Array[Double](n)
      Dsp.fft(re, im)
      for (k <- 0 until n) {
        assert(math.abs(re(k) - er(k)) < 1e-8, s"n=$n re[$k]")
        assert(math.abs(im(k) - ei(k)) < 1e-8, s"n=$n im[$k]")
      }
    }
  }

  test("Parseval: spectrum power equals n times time-domain energy") {
    val rnd = new scala.util.Random(23)
    val n = 128
    val x = Array.fill(n)(rnd.nextDouble() * 200 - 100)
    val re = x.clone(); val im = new Array[Double](n)
    Dsp.fft(re, im)
    val spec = (0 until n).map(k => re(k) * re(k) + im(k) * im(k)).sum
    val time = x.map(v => v * v).sum
    assert(math.abs(spec - n * time) / (n * time) < 1e-12)
  }

  test("impulse is flat; constant is DC-only; non-power-of-two rejected") {
    val n = 64
    val impulse = new Array[Double](n); impulse(0) = 1.0
    val ps = Dsp.powerSpectrum(impulse)
    assert(ps.length == n / 2 + 1)
    ps.foreach(p => assert(math.abs(p - 1.0) < 1e-12, "impulse spectrum must be flat"))

    val const = Array.fill(n)(3.0)
    val pc = Dsp.powerSpectrum(const)
    assert(math.abs(pc(0) - (3.0 * n) * (3.0 * n)) < 1e-9)
    pc.drop(1).foreach(p => assert(math.abs(p) < 1e-9, "constant signal has no AC power"))

    intercept[IllegalArgumentException] {
      Dsp.fft(new Array[Double](12), new Array[Double](12))
    }
  }

  test("x61 entry: 4 bands per full window, values match an independent recomputation") {
    val spark = graft.TestSpark.spark
    val out = graft.queries.ExtendedQueries
      .audioSpectrum(spark, graft.TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    assert(out.nonEmpty)
    // every (asset, window) carries exactly 4 bands
    val byWin = out.keys.groupBy { case (a, w, _) => (a, w) }
    byWin.foreach { case (k, bands) =>
      assert(bands.map(_._3).toSet == Set(0L, 1L, 2L, 3L), s"bands missing for $k")
    }
    // independent recomputation for asset 0 window 0: the fixture's
    // closed-form samples through the kernel directly
    val samples = Array.tabulate(64) { i =>
      (((0L * 31 + i.toLong * i * 7) % 65536).toInt - 32768).toDouble
    }
    val ps = Dsp.powerSpectrum(samples)
    (0 until 4).foreach { b =>
      val hi = if (b == 3) ps.length else (b + 1) * 8
      val e = math.rint((b * 8 until hi).map(ps).sum)
      assert(out((0L, 0L, b.toLong)) == e, s"band $b mismatch")
    }
  }

  test("x121 dB twin: same grain as x61, values agree through the dB map") {
    val spark = graft.TestSpark.spark
    val raw = graft.queries.ExtendedQueries
      .audioSpectrum(spark, graft.TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    val db = graft.queries.ExtendedQueries
      .audioSpectrumDb(spark, graft.TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    // identical (asset, window, band) grain — the twin is the same
    // pipeline, not a re-derivation
    assert(db.keySet == raw.keySet && db.nonEmpty)
    // x61's energy is rint(e): mapping it through the dB formula must
    // land within the rint perturbation's dB radius (≤ 4.343/e, and the
    // fixture's band energies are ≥ 1e6)
    raw.foreach { case (k, e) =>
      val expected = 10 * math.log10(e + 1.0)
      assert(math.abs(db(k) - expected) < 1e-4,
        s"$k: dB ${db(k)} vs rint-derived $expected")
    }
  }

  test("a pure tone concentrates its power in the matching bin") {
    val n = 64; val bin = 5
    val x = Array.tabulate(n)(t => math.cos(2.0 * math.Pi * bin * t / n))
    val ps = Dsp.powerSpectrum(x)
    val total = ps.sum
    assert(ps(bin) / total > 0.99, s"tone leaked: ${ps.toSeq}")
  }
}
