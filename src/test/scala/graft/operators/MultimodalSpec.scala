package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def assets = Multimodal.assetsFromDocuments(
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet").limit(50))

  test("feature extraction is deterministic run-to-run") {
    def run() = Multimodal.extractFeatures(spark, assets)
      .select("asset_id", "feature_norm").as[(Long, Double)].collect().toMap
    val r1 = run(); val r2 = run()
    assert(r1 == r2 && r1.size == 50)
  }

  test("features have the declared shape: dim-16 array, norm consistent") {
    val rows = Multimodal.extractFeatures(spark, assets).collect()
    assert(rows.forall(_.features.length == Multimodal.FakeCodec.FeatureDim))
    rows.foreach { r =>
      val n = math.sqrt(r.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - r.feature_norm) < 1e-9)
    }
  }

  test("resize: output is exactly dstW*dstH bytes, deterministic") {
    val r1 = Multimodal.resizeImages(spark, assets, 32, 24)
      .collect().map(r => r.asset_id -> r.content.toSeq).toMap
    assert(r1.nonEmpty)
    assert(r1.values.forall(_.length == 32 * 24))
    val r2 = Multimodal.resizeImages(spark, assets, 32, 24)
      .collect().map(r => r.asset_id -> r.content.toSeq).toMap
    assert(r1 == r2)
  }

  test("quantile sketch variant tracks the exact percentiles") {
    val dir = TestSpark.Sf0001
    val exact = graft.queries.ReferenceQueries.q2(spark, dir).head
    val approx = graft.queries.ReferenceQueries.q2approx(spark, dir).head
    // GK sketch with accuracy 10000 on ~1000 rows: p95/p99 within 2%
    Seq(1, 2).foreach { i =>
      val e = exact.getDouble(i); val a = approx.getAs[Number](i).doubleValue()
      assert(math.abs(a - e) <= math.max(0.02 * e, 1.0), s"col $i: approx $a vs exact $e")
    }
  }

  test("frame sampling: one row per everyMs tick of a video's duration") {
    val frames = Multimodal.sampleFrames(spark, assets, everyMs = 1000L)
    val byAsset = frames.groupBy("asset_id").agg(count("*").as("n"))
      .as[(Long, Long)].collect().toMap
    val durations = assets.filter(col("modality") === "video")
      .select(col("asset_id"), col("meta.durationMs")).as[(Long, Long)].collect().toMap
    assert(byAsset.keySet == durations.keySet.filter(durations(_) > 0))
    byAsset.foreach { case (id, n) =>
      assert(n == (durations(id) + 999) / 1000) // ceil(duration/everyMs)
    }
  }

  test("PpmCodec: encode→decode round-trips arbitrary rasters exactly") {
    import Multimodal.PpmCodec
    val rnd = new scala.util.Random(7)
    Seq((1, 1), (3, 5), (17, 2), (64, 64)).foreach { case (w, h) =>
      val rgb = Array.fill(w * h * 3)(rnd.nextInt(256).toByte)
      val (dw, dh, out) = PpmCodec.decode(PpmCodec.encode(w, h, rgb))
      assert(dw == w && dh == h, s"dims mangled for ${w}x$h")
      assert(java.util.Arrays.equals(out, rgb), s"raster mangled for ${w}x$h")
    }
  }

  test("PpmCodec: frame streams round-trip; mixed dims; truncated tail is loud") {
    import Multimodal.PpmCodec
    val rnd = new scala.util.Random(11)
    // frames of DIFFERENT dimensions back-to-back (the stream contract
    // carries each frame's own header, like an image2pipe PPM pipe)
    val frames = Seq((2, 3), (5, 1), (4, 4)).map { case (w, h) =>
      (w, h, Array.fill(w * h * 3)(rnd.nextInt(256).toByte))
    }
    val stream = frames.map { case (w, h, rgb) => PpmCodec.encode(w, h, rgb) }
      .reduce(_ ++ _)
    val out = PpmCodec.decodeStream(stream)
    assert(out.length == 3)
    out.zip(frames).foreach { case ((dw, dh, drgb), (w, h, rgb)) =>
      assert(dw == w && dh == h)
      assert(java.util.Arrays.equals(drgb, rgb))
    }
    // single frame degenerates to decode()
    assert(PpmCodec.decodeStream(PpmCodec.encode(1, 1, Array[Byte](1, 2, 3))).length == 1)
    // a truncated TAIL frame fails the whole parse — no silent partials
    intercept[IllegalArgumentException] {
      PpmCodec.decodeStream(stream ++ "P6\n9 9\n255\n".getBytes("US-ASCII"))
    }
  }

  test("WavCodec: encode→decode round-trips; chunk walk skips LIST; rejects bad payloads") {
    import Multimodal.WavCodec
    val rnd = new scala.util.Random(13)
    val samples = Array.fill(300)(rnd.nextInt(65536).toShort)
    val (rate, back) = WavCodec.decode(WavCodec.encode(22050, samples))
    assert(rate == 22050)
    assert(back.sameElements(samples), "PCM mangled through the container")

    // a LIST chunk spliced between fmt and data must be skipped by the
    // chunk walk (an offset-44 reader would read the LIST body as PCM)
    val canonical = WavCodec.encode(8000, samples)
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++
      "INFOxy".getBytes("US-ASCII") // 6 bytes → odd-pad rule not needed
    val spliced = canonical.slice(0, 36) ++ list ++ canonical.drop(36)
    val (r2, b2) = WavCodec.decode(spliced)
    assert(r2 == 8000 && b2.sameElements(samples))

    // loud rejections: wrong magic, compressed, stereo, 8-bit
    intercept[IllegalArgumentException] { WavCodec.decode("JUNK".getBytes ++ new Array[Byte](40)) }
    def patched(off: Int, v: Byte): Array[Byte] = {
      val c = canonical.clone(); c(off) = v; c
    }
    intercept[IllegalArgumentException] { WavCodec.decode(patched(20, 2)) }  // fmt != PCM
    intercept[IllegalArgumentException] { WavCodec.decode(patched(22, 2)) }  // channels
    intercept[IllegalArgumentException] { WavCodec.decode(patched(34, 8)) }  // bits
    // declared chunk size beyond the buffer must not read garbage
    intercept[IllegalArgumentException] {
      WavCodec.decode(canonical.slice(0, canonical.length - 10))
    }
  }

  test("codec fuzz: random bytes always throw cleanly, never hang or return junk") {
    import Multimodal.{PpmCodec, WavCodec}
    val rnd = new scala.util.Random(42)
    var ppmOk = 0; var wavOk = 0
    for (_ <- 0 until 300) {
      val len = 1 + rnd.nextInt(200) // len 0 is a legal empty PPM stream
      val junk = Array.fill(len)(rnd.nextInt(256).toByte)
      // a corpus-scale decode task must reject garbage with the codec's
      // own IllegalArgumentException (require) or a parse-shaped error
      // (number format / buffer bounds) — anything else (hang, OOM,
      // silent success on noise) is a bug
      try { PpmCodec.decode(junk); ppmOk += 1 }
      catch {
        case _: IllegalArgumentException | _: NumberFormatException => ()
      }
      try { PpmCodec.decodeStream(junk); ppmOk += 1 }
      catch {
        case _: IllegalArgumentException | _: NumberFormatException => ()
      }
      try { WavCodec.decode(junk); wavOk += 1 }
      catch {
        case _: IllegalArgumentException | _: java.nio.BufferUnderflowException => ()
      }
    }
    // 300 random payloads should essentially never parse as valid media
    assert(ppmOk <= 1, s"PPM accepted $ppmOk random payloads")
    assert(wavOk <= 1, s"WAV accepted $wavOk random payloads")

    // truncation fuzz: every prefix of a VALID payload throws or parses
    // to the full result, never a silent partial
    val good = WavCodec.encode(16000, Array.tabulate(64)(i => (i * 31).toShort))
    for (cut <- 1 until good.length - 1) {
      try {
        val (_, s) = WavCodec.decode(good.slice(0, cut))
        assert(s.length == 64, s"silent partial at cut=$cut")
      } catch {
        case _: IllegalArgumentException | _: java.nio.BufferUnderflowException => ()
      }
    }
  }

  test("PHash: uniform brightness shift hashes identically (DC exclusion)") {
    import Multimodal.PHash
    val w = 48; val h = 40
    val rng = new scala.util.Random(7)
    val rgb = Array.fill(w * h * 3)((rng.nextInt(226)).toByte)
    val shifted = rgb.map(b => ((b & 0xff) + 17).toByte) // 225+17 < 256, no clamp
    assert(PHash.hash(w, h, rgb) == PHash.hash(w, h, shifted),
      "adding a constant to every pixel only moves the DC coefficient")
  }

  test("PHash: independent noise images land far apart in Hamming space") {
    import Multimodal.PHash
    val w = 64; val h = 64
    def noise(seed: Int) = {
      val rng = new scala.util.Random(seed)
      Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    }
    val hs = (0 until 12).map(s => PHash.hash(w, h, noise(s)))
    for (i <- hs.indices; j <- hs.indices if i < j) {
      val d = java.lang.Long.bitCount(hs(i) ^ hs(j))
      assert(d > 8, s"noise images $i/$j at Hamming $d — signature not discriminating")
    }
    // and the hash is a pure function of the pixels
    assert(PHash.hash(w, h, noise(3)) == PHash.hash(w, h, noise(3)))
  }

  test("PHash: images smaller than the 32x32 pool grid are rejected loudly") {
    intercept[IllegalArgumentException] {
      Multimodal.PHash.hash(16, 16, new Array[Byte](16 * 16 * 3))
    }
  }

  test("x122 DCT twin: coefficient block is the signature's exact front end; entry grain is 63 AC cells") {
    import Multimodal.PHash
    // kernel identity: hash == sign-of-median fold of lowFreqCoefs, so
    // a value-level check on the coefficients pins the signature's
    // entire front end (pool + separable DCT)
    val w = 64; val h = 64
    val rng = new scala.util.Random(11)
    val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val coef = PHash.lowFreqCoefs(w, h, rgb)
    assert(coef.length == 63)
    val sorted = coef.clone(); java.util.Arrays.sort(sorted)
    val median = (sorted(31) + sorted(32)) / 2.0
    val bits = coef.zipWithIndex.foldLeft(0L) { case (acc, (c, i)) =>
      if (c > median) acc | (1L << i) else acc
    }
    assert(bits == PHash.hash(w, h, rgb))

    // entry grain: 63 rows per asset, the DC cell absent
    val out = graft.queries.ExtendedQueries.imageDctFixed(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val perAsset = out.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perAsset.values.forall(_ == 63) && perAsset.size == 16)
    assert(!out.exists(k => k._2 == 0L && k._3 == 0L), "DC must be excluded")
  }

  test("x73: recovered pairs are exactly the planted brightness-shifted copies") {
    val out = graft.queries.ExtendedQueries.imagePhashDedup(spark, TestSpark.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val planted = (0 until 48 by 4).map(k => (k.toLong, (k + 1).toLong, 0)).toSet
    assert(out == planted,
      s"expected exactly the planted +10-shift pairs at Hamming 0; got $out")
  }

  test("PpmCodec: malformed payloads fail loudly, never return garbage") {
    import Multimodal.PpmCodec
    // wrong magic
    intercept[IllegalArgumentException] {
      PpmCodec.decode("P3\n2 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](12))
    }
    // truncated raster: header promises 2x2 but carries 3 bytes
    intercept[IllegalArgumentException] {
      PpmCodec.decode("P6\n2 2\n255\n".getBytes("US-ASCII") ++ new Array[Byte](3))
    }
    // unsupported maxval
    intercept[IllegalArgumentException] {
      PpmCodec.decode("P6\n1 1\n65535\n".getBytes("US-ASCII") ++ new Array[Byte](3))
    }
  }
}
