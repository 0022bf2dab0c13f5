package graft.multimodal

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real-codec decode through the stub's mapPartitions boundary — the
  * JDK decoders ([[Codecs]]) proven on media GENERATED here, where
  * every expected pixel/sample value is known exactly. The stub
  * entries (m1–m7) stay the oracle-checked surface; this spec is the
  * evidence the swap point actually swaps. */
class CodecsSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("sniffType: real magics classify, truncated and plain bytes do not") {
    import spark.implicits._
    val cases = Seq(
      (1L, "89504E470D0A1A0A0000"),         // PNG
      (2L, "FFD8FFE000104A464946"),         // JPEG/JFIF
      (3L, "474946383961AA"),               // GIF89a
      (4L, "52494646AAAA000057415645FF"),   // RIFF....WAVE
      (5L, "52494646AAAA000041564920"),     // RIFF....AVI -> not wav
      (6L, "255044462D312E37"),             // %PDF-1.7
      (7L, "504B0304AA"),                   // ZIP local header
      (8L, "1F8B08"),                       // gzip
      (9L, "000000186674797069736F6D"),     // ....ftypisom (MP4)
      (10L, "EFBBBF68656C6C6F"),            // UTF-8 BOM text
      (11L, "68656C6C6F20776F726C64"),      // plain ascii -> unknown
      (12L, "89"),                          // truncated PNG -> unknown
      (13L, ""))                            // empty -> unknown
      .toDF("id", "hx")
    val got = cases
      .select(col("id"), Multimodal.sniffType(unhex(col("hx"))).as("t"))
      .as[(Long, String)].collect().toMap
    assert(got === Map(
      1L -> "image/png", 2L -> "image/jpeg", 3L -> "image/gif",
      4L -> "audio/wav", 5L -> "unknown", 6L -> "application/pdf",
      7L -> "application/zip", 8L -> "application/gzip",
      9L -> "video/mp4", 10L -> "text/utf8-bom",
      11L -> "unknown", 12L -> "unknown", 13L -> "unknown"))
    // a REAL codec-generated PNG sniffs as PNG (the in-test generator
    // used by the decode specs below)
    val pngRow = Seq(Tuple1(pngBytes(2, 2)((x, y) => 0xFF000000))).toDF("payload")
    assert(pngRow.select(Multimodal.sniffType(col("payload")))
      .as[String].collect().head === "image/png")
  }

  test("PNG decode: real pixels through the partition-batched boundary") {
    // 8x8: top half black, bottom half white -> with featureDim=2 the
    // band luminance means are exactly 0.0 and 255.0
    val png = pngBytes(8, 8)((_, y) => if (y < 4) 0x000000 else 0xffffff)
    val assets = Seq(
      (1L, png),
      (2L, Array[Byte](1, 2, 3, 4)), // not an image -> NULL decode
      (3L, null.asInstanceOf[Array[Byte]])) // null payload -> NULL
      .toDF("asset_id", "payload")
    val out = Codecs.decodeImagePartitioned(assets, featureDim = 2)
      .orderBy("asset_id").collect()
    assert(out(0).getLong(2) === 8L && out(0).getLong(3) === 8L)
    assert(out(0).getSeq[Double](4) === Seq(0.0, 255.0))
    // corrupt and null payloads degrade to NULL, never fail the task
    assert(out(1).isNullAt(2) && out(1).isNullAt(4))
    assert(out(2).isNullAt(2) && out(2).isNullAt(4))
  }

  private def wavBytes(samples: Array[Short], rate: Float): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(rate, 16, 1, true, false)
    val raw = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (s, i) =>
      raw(2 * i) = (s & 0xff).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xff).toByte
    }
    val in = new javax.sound.sampled.AudioInputStream(
      new ByteArrayInputStream(raw), fmt, samples.length.toLong)
    val out = new ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      in, javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WAV decode feeds energyWindows: real audio, real silence split") {
    // 8192 samples at 8 kHz: first half digital silence, second half a
    // square wave (+/-16384, 16-sample half-period)
    val samples = Array.tabulate[Short](8192) { i =>
      if (i < 4096) 0
      else if ((i / 16) % 2 == 0) 16384.toShort else (-16384).toShort
    }
    val assets = Seq((1L, wavBytes(samples, 8000f))).toDF("asset_id", "payload")
    val dec = Codecs.decodeWavPartitioned(assets).collect().head
    assert(dec.getDouble(2) === 8000.0)
    assert(dec.getLong(3) === 8192L)
    val pcm = dec.getAs[Array[Byte]](4)
    assert(pcm.length === 8192)
    // 16-bit 0 -> unsigned 128; +/-16384 -> high byte 0x40/0xc0 -> 192/64
    assert((pcm(0) & 0xff) === 128)
    assert((pcm(4096) & 0xff) === 192 && (pcm(4112) & 0xff) === 64)
    // the decoded PCM slots into energyWindows UNCHANGED: frameBytes=64
    // stride=4 -> 32 frames at 256-byte hops; the 16 silent-half frames
    // are flat, the 16 square-wave frames spread 128 >> threshold
    val ew = Multimodal.energyWindows(
      Codecs.decodeWavPartitioned(assets)
        .select(col("asset_id"), col("pcm").as("payload")),
      frameBytes = 64, stride = 4).collect().head
    assert(ew.getLong(1) === 32L, s"n_frames: $ew")
    assert(ew.getLong(2) === 16L, s"n_silent: $ew")
    // an undecodable payload degrades to NULL columns
    val bad = Codecs.decodeWavPartitioned(
      Seq((2L, Array[Byte](9, 9, 9))).toDF("asset_id", "payload"))
      .collect().head
    assert(bad.isNullAt(2) && bad.isNullAt(4))
  }

  test("decoded features dedupe real images (identical decode = identical bands)") {
    // two pixel-identical PNGs and one different image: the DECODED
    // luminance bands (not the container bytes, which can differ by
    // encoder settings) must match for the identical pair only
    val a = pngBytes(16, 16)((x, y) => if ((x + y) % 2 == 0) 0xffffff else 0)
    val b = pngBytes(16, 16)((x, y) => if ((x + y) % 2 == 0) 0xffffff else 0)
    val c = pngBytes(16, 16)((_, y) => if (y < 8) 0xffffff else 0)
    val assets = Seq((1L, a), (2L, b), (3L, c)).toDF("asset_id", "payload")
    val rows = Codecs.decodeImagePartitioned(assets, featureDim = 8)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](4)).toMap
    assert(rows(1L) === rows(2L))
    assert(rows(1L) !== rows(3L))
  }

  test("real decode feeds the m4 perceptual-dedup pipeline end to end") {
    // the full composition the stub entries promise: PNG decode →
    // 64-band luminance features → byte quantization → the SAME
    // aHash + quarter-band near-dup pairing m4 runs on stub windows.
    // One image is a NEAR duplicate (single corner pixel flipped, so
    // container bytes AND decoded features differ slightly) — the
    // perceptual pair must still be found; the gradient image must not.
    def grad(flip: Boolean) = pngBytes(16, 16)((x, y) =>
      if (flip && x == 0 && y == 0) 0x808080
      else if (y < 8) 0xffffff else 0)
    val other = pngBytes(16, 16)((x, _) => (x * 16) * 0x010101)
    val assets = Seq((1L, grad(false)), (2L, grad(true)), (3L, other))
      .toDF("asset_id", "payload")
    val feats = Codecs.decodeImagePartitioned(assets, featureDim = 64)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Double](4).map(m => math.min(255, math.max(0,
          math.round(m))).toByte).toArray))
    val quantized = feats.toSeq.toDF("asset_id", "payload")
    val fps = quantized.select(col("asset_id").as("doc_id"),
      graft.multimodal.Multimodal.aHashHex(col("payload")).as("fp"))
    val pairs = graft.dedup.TextDedup.hexFingerprintPairs(fps, maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)),
      s"expected only the near-dup pair, got ${pairs.mkString(", ")}")
  }
}
