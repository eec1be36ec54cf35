package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with a typed metadata struct, and per-asset
  * compute (decode, feature extraction, resize, frame sampling) runs as
  * partition-batched transforms.
  *
  * Compressed-media decode (JPEG/PNG/audio) is STUBBED — this container
  * has no native codecs — behind [[FakeCodec]], a deterministic
  * byte-level fake with the same signature a real decoder would have.
  * [[PpmCodec]] is the exception: binary PPM is decodable in pure JVM
  * bytes, so that path is a REAL parser, hash-verified end-to-end by the
  * x54 entry against a closed-form pixel oracle. Everything AROUND the
  * stub is real and load-bearing at scale:
  *  - schema: (asset_id, modality, content: binary, meta struct) — the
  *    binary column is never shuffled by value, only projected/filtered;
  *  - `mapPartitions` over a typed Dataset = the JVM analogue of
  *    `mapInPandas` batch shape: one iterator per partition, codec state
  *    (here: the per-thread buffer a real decoder would hold) amortized
  *    across the partition, output is a new typed column set;
  *  - feature vectors come back as `array<float>`, directly consumable by
  *    [[SimilaritySearch]] / [[Dedup.embeddingNearDups]].
  */
object Multimodal {

  case class AssetMeta(width: Int, height: Int, sampleRateHz: Int, durationMs: Long)
  case class Asset(asset_id: Long, modality: String, content: Array[Byte], meta: AssetMeta)
  case class AssetFeatures(asset_id: Long, modality: String, n_bytes: Int,
                           features: Array[Float], feature_norm: Double)
  case class FrameSample(asset_id: Long, frame_idx: Int, frame_ms: Long, frame: Array[Byte])

  /** Deterministic stand-in for a media codec. A real deployment swaps
    * this object for JNI/FFI bindings (libjpeg/ffmpeg); the Spark plumbing
    * above it is unchanged. */
  object FakeCodec {
    val FeatureDim = 16

    /** "Decode" bytes to a feature vector: position-weighted byte values
      * folded per lane — a fake embedding, deterministic in the content.
      * The formula is deliberately ENGINE-SHARED closed form (r15: it
      * replaced a 64-bit rolling hash no SQL engine can wrap-multiply):
      * lane l accumulates ((b_i · (i+1)) mod 9973) / 9973 − 0.5 over the
      * bytes at positions i ≡ l (mod 16), ascending, in DOUBLE — the
      * list_sum fold-order contract — then casts to float. That makes
      * the x12 registry entry value-level oracle-checkable end to end
      * (the oracle recomputes lanes and norm per character; fixture
      * texts are ASCII, so bytes ≡ code points there). A real
      * deployment swaps this whole object for JNI/FFI codecs — the
      * formula carries no semantic weight, only determinism. */
    def decodeFeatures(content: Array[Byte]): Array[Float] = {
      val acc = new Array[Double](FeatureDim)
      var i = 0
      while (i < content.length) {
        val v = ((content(i) & 0xff).toLong * (i + 1)) % 9973
        acc(i % FeatureDim) += v / 9973.0 - 0.5
        i += 1
      }
      acc.map(_.toFloat)
    }

    /** "Sample" every `everyMs` milliseconds: returns (offset ms, fake frame
      * bytes = a deterministic slice of the content). */
    def sampleFrames(content: Array[Byte], durationMs: Long, everyMs: Long): Seq[(Long, Array[Byte])] =
      (0L until durationMs by everyMs).map { t =>
        val off = if (content.isEmpty) 0 else ((t * 31) % content.length).toInt
        (t, content.slice(off, math.min(off + 64, content.length)))
      }

    /** "Resize" srcW×srcH "pixels" (bytes, row-major over the content,
      * wrapped) to dstW×dstH by nearest-neighbor index mapping —
      * deterministic, output size exactly dstW·dstH bytes. */
    def resize(content: Array[Byte], srcW: Int, srcH: Int, dstW: Int, dstH: Int): Array[Byte] = {
      val out = new Array[Byte](dstW * dstH)
      if (content.isEmpty) return out
      var y = 0
      while (y < dstH) {
        val sy = (y.toLong * srcH / dstH).toInt
        var x = 0
        while (x < dstW) {
          val sx = (x.toLong * srcW / dstW).toInt
          out(y * dstW + x) = content((sy * srcW + sx) % content.length)
          x += 1
        }
        y += 1
      }
      out
    }
  }

  /** A REAL image codec for the one raster format decodable in pure JVM
    * bytes: binary PPM (P6). Unlike [[FakeCodec]] this is not a stub —
    * encode writes a spec-conformant header + packed RGB24, decode
    * parses any conformant P6 payload (whitespace-separated header
    * tokens, maxval 255; comments unsupported and rejected loudly).
    * JPEG/PNG/audio still need the JNI swap point documented on
    * [[FakeCodec]]; the x54 registry entry runs THIS decoder against a
    * closed-form pixel oracle, so the encode→decode round-trip is
    * hash-verified end-to-end. */
  object PpmCodec {
    def encode(w: Int, h: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"need ${w * h * 3} bytes, got ${rgb.length}")
      s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ rgb
    }

    /** One frame starting at `start` → (width, height, packed RGB24,
      * offset just past the raster). */
    private def decodeAt(bytes: Array[Byte], start: Int): (Int, Int, Array[Byte], Int) = {
      var i = start
      def token(): String = {
        while (i < bytes.length && Character.isWhitespace(bytes(i))) i += 1
        require(i < bytes.length && bytes(i) != '#',
          "truncated or commented PPM header (comments unsupported)")
        val s = i
        while (i < bytes.length && !Character.isWhitespace(bytes(i))) i += 1
        new String(bytes, s, i - s, "US-ASCII")
      }
      require(token() == "P6", "not a binary (P6) PPM payload")
      val w = token().toInt; val h = token().toInt
      require(token().toInt == 255, "only maxval 255 supported")
      i += 1 // exactly one whitespace byte separates header from raster
      require(bytes.length - i >= w * h * 3, "raster shorter than header promises")
      (w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3), i + w * h * 3)
    }

    /** → (width, height, packed RGB24). */
    def decode(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
      val (w, h, rgb, _) = decodeAt(bytes, 0)
      (w, h, rgb)
    }

    /** Parse a back-to-back P6 FRAME STREAM — the raw-video contract of
      * `ffmpeg -f image2pipe -vcodec ppm` pipes: independent conformant
      * P6 payloads laid head-to-tail, one per frame. Strict: the stream
      * must end exactly at the last raster byte (a truncated tail frame
      * is an error, not a silent partial read). */
    def decodeStream(bytes: Array[Byte]): Seq[(Int, Int, Array[Byte])] = {
      val out = scala.collection.mutable.ArrayBuffer[(Int, Int, Array[Byte])]()
      var off = 0
      while (off < bytes.length) {
        val (w, h, rgb, next) = decodeAt(bytes, off)
        out += ((w, h, rgb))
        off = next
      }
      out.toSeq
    }
  }

  /** Perceptual image hash (pHash, DCT-sign variant — the classic
    * Zauner/ImageHash construction): grayscale → 32×32 average-pool →
    * 2D DCT-II → the 63 low-frequency AC coefficients (8×8 block minus
    * DC) thresholded at their median → a 63-bit signature packed in a
    * Long. Two images whose signatures sit within a small Hamming
    * distance are perceptual near-duplicates.
    *
    * The DC coefficient is EXCLUDED, which is what buys the headline
    * invariance: adding a constant to every pixel (uniform brightness
    * shift) perturbs only DC, so a shifted copy hashes IDENTICALLY.
    * Cosines come from StrictMath for cross-platform bit-reproducibility
    * (same rationale as [[graft.functions.Dsp]]'s twiddle factors); the
    * median threshold uses the strict `>` of the reference
    * implementations, with ties broken by coefficient index order. */
  object PHash {
    private val N = 32
    // DCT basis: Cos(u)(x) = cos(π(2x+1)u / 64), u < 8 — precomputed once
    private val Cos: Array[Array[Double]] = Array.tabulate(8, N) { (u, x) =>
      StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * N))
    }

    /** The 63 low-frequency AC coefficients (u,v < 8, (0,0) excluded,
      * row-major) of the pooled grayscale DCT — [[hash]]'s shared front
      * end, exposed so the x122 hash twin can pin the pool + DCT
      * machinery at value level (the signature itself stays rows-only:
      * a sign bit at a near-zero coefficient is fp-flippable across
      * engines, a rounded coefficient is not). */
    def lowFreqCoefs(w: Int, h: Int, rgb: Array[Byte]): Array[Double] = {
      require(w >= N && h >= N, s"pHash needs at least ${N}x$N pixels, got ${w}x$h")
      // grayscale (ITU-R 601 integer weights) + average-pool to 32×32.
      // Integer block sums — no float until the DCT.
      val pooled = new Array[Double](N * N)
      var py = 0
      while (py < N) {
        val y0 = py * h / N; val y1 = (py + 1) * h / N
        var px = 0
        while (px < N) {
          val x0 = px * w / N; val x1 = (px + 1) * w / N
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val p = (y * w + x) * 3
              sum += 299L * (rgb(p) & 0xff) + 587L * (rgb(p + 1) & 0xff) +
                     114L * (rgb(p + 2) & 0xff)
              x += 1
            }
            y += 1
          }
          pooled(py * N + px) = sum / (1000.0 * (y1 - y0) * (x1 - x0))
          px += 1
        }
        py += 1
      }
      // separable 2D DCT-II, only the 8×8 low-frequency block
      val t = new Array[Double](8 * N) // t(u, y) = Σ_x pooled(y, x)·Cos(u)(x)
      var u = 0
      while (u < 8) {
        var y = 0
        while (y < N) {
          var acc = 0.0; var x = 0
          while (x < N) { acc += pooled(y * N + x) * Cos(u)(x); x += 1 }
          t(u * N + y) = acc
          y += 1
        }
        u += 1
      }
      val coef = new Array[Double](63)
      var i = 0
      u = 0
      while (u < 8) {
        var v = 0
        while (v < 8) {
          if (u != 0 || v != 0) {
            var acc = 0.0; var y = 0
            while (y < N) { acc += t(u * N + y) * Cos(v)(y); y += 1 }
            coef(i) = acc; i += 1
          }
          v += 1
        }
        u += 1
      }
      coef
    }

    /** 63-bit signature of a decoded w×h RGB24 raster. */
    def hash(w: Int, h: Int, rgb: Array[Byte]): Long = {
      val coef = lowFreqCoefs(w, h, rgb)
      val sorted = coef.clone(); java.util.Arrays.sort(sorted)
      val median = (sorted(31) + sorted(32)) / 2.0
      var bits = 0L
      var i = 0
      while (i < 63) { if (coef(i) > median) bits |= 1L << i; i += 1 }
      bits
    }
  }

  /** A REAL audio codec for the one container decodable in pure JVM
    * bytes: RIFF/WAVE PCM16 mono. Like [[PpmCodec]] (and unlike
    * [[FakeCodec]]) this is not a stub: encode writes a spec-conformant
    * 44-byte canonical header + little-endian int16 samples; decode
    * WALKS THE CHUNK LIST (fmt / data discovered wherever they sit,
    * unknown chunks like LIST/INFO skipped by their declared size — the
    * part naive offset-44 readers get wrong) and rejects compressed,
    * multi-channel or non-16-bit payloads loudly. Lossy formats
    * (MP3/AAC/...) keep the documented JNI swap point on [[FakeCodec]]. */
  object WavCodec {
    private def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    private def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
            ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

    def encode(sampleRateHz: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).put(le32(36 + dataLen))
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).put(le32(16))
        .put(le16(1)).put(le16(1)) // PCM, mono
        .put(le32(sampleRateHz)).put(le32(sampleRateHz * 2))
        .put(le16(2)).put(le16(16)) // block align, bits
        .put("data".getBytes("US-ASCII")).put(le32(dataLen))
      samples.foreach(s => out.putShort(s))
      out.array()
    }

    /** → (sampleRateHz, samples). */
    def decode(bytes: Array[Byte]): (Int, Array[Short]) = {
      val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def tag(): String = {
        val t = new Array[Byte](4); bb.get(t); new String(t, "US-ASCII")
      }
      require(bytes.length >= 12 && tag() == "RIFF", "not a RIFF container")
      bb.getInt // declared RIFF size — data chunk size is authoritative
      require(tag() == "WAVE", "RIFF payload is not WAVE")
      var rate = -1
      var samples: Array[Short] = null
      while (bb.remaining() >= 8 && (rate < 0 || samples == null)) {
        val id = tag(); val size = bb.getInt
        require(size >= 0 && size <= bb.remaining(),
          s"chunk '$id' declares $size bytes but ${bb.remaining()} remain")
        id match {
          case "fmt " =>
            require(size >= 16, s"fmt chunk too small: $size bytes")
            val fmtEnd = bb.position() + size
            require(bb.getShort() == 1, "only uncompressed PCM supported")
            require(bb.getShort() == 1, "only mono supported")
            rate = bb.getInt
            bb.getInt; bb.getShort // byte rate, block align
            require(bb.getShort() == 16, "only 16-bit samples supported")
            bb.position(fmtEnd) // skip any fmt extension bytes
          case "data" =>
            require(size % 2 == 0, "odd PCM16 data length")
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = bb.getShort(); i += 1 }
          case _ => // LIST/INFO/fact/...: skip by declared size (+pad)
            bb.position(bb.position() + size + (size & 1))
        }
      }
      require(rate > 0, "missing fmt chunk")
      require(samples != null, "missing data chunk")
      (rate, samples)
    }
  }

  /** Build an asset table from the documents fixture: text bytes stand in
    * for media payloads (deterministic, scale-proportional). Modality and
    * fake dimensions derive from doc_id. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        lit(16000).as("sampleRateHz"),
        (col("n_chars") * 10).as("durationMs")).as("meta"))

  /** Batched feature extraction — the `mapInPandas` analogue. One codec
    * "session" per partition; binary stays on the executor. */
  def extractFeatures(spark: SparkSession, assets: DataFrame): Dataset[AssetFeatures] = {
    import spark.implicits._
    assets.as[Asset].mapPartitions { it =>
      // per-partition codec init would go here (decoder tables, buffers)
      it.map { a =>
        val f = FakeCodec.decodeFeatures(a.content)
        AssetFeatures(a.asset_id, a.modality, a.content.length, f,
          math.sqrt(f.map(x => x.toDouble * x).sum))
      }
    }
  }

  case class ResizedAsset(asset_id: Long, width: Int, height: Int, content: Array[Byte])

  /** Image resize over the binary column — same batched mapPartitions
    * shape as [[extractFeatures]]; the real-codec swap point is
    * [[FakeCodec.resize]]. Output binary is exactly dstW·dstH bytes. */
  def resizeImages(spark: SparkSession, assets: DataFrame,
                   dstW: Int = 64, dstH: Int = 64): Dataset[ResizedAsset] = {
    import spark.implicits._
    assets.filter(col("modality") === "image").as[Asset].mapPartitions { it =>
      it.map { a =>
        ResizedAsset(a.asset_id, dstW, dstH,
          FakeCodec.resize(a.content, a.meta.width, a.meta.height, dstW, dstH))
      }
    }
  }

  /** Frame sampling for video assets: one row per sampled frame.
    * flatMap shape — output cardinality is data-dependent. */
  def sampleFrames(spark: SparkSession, assets: DataFrame, everyMs: Long = 1000L): Dataset[FrameSample] = {
    import spark.implicits._
    assets.filter(col("modality") === "video").as[Asset].mapPartitions { it =>
      it.flatMap { a =>
        FakeCodec.sampleFrames(a.content, a.meta.durationMs, everyMs).zipWithIndex.map {
          case ((ms, bytes), idx) => FrameSample(a.asset_id, idx, ms, bytes)
        }
      }
    }
  }
}
