package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** REAL media decode through the same partition-batched boundary as
  * [[Multimodal.decodeStubPartitioned]] — JDK-only codecs, zero new
  * dependencies: `javax.imageio` (PNG/BMP/GIF/JPEG) and
  * `javax.sound.sampled` (WAV/PCM). This closes the "declared stub"
  * gap for formats the JDK ships decoders for; the stub entries stay
  * the oracle-checked surface (a SQL oracle can't decode a PNG), and
  * these are spec-checked against images/audio GENERATED in the spec,
  * where the expected pixel/sample values are known exactly.
  *
  * Shape contract (the part that matters at 100 TB): identical to the
  * stub swap point — one `mapPartitions` over the asset rows, codec
  * work partition-local and batched, output row = input row + decoded
  * columns. Undecodable/null payloads yield NULL decoded columns
  * instead of failing the task (a 100 TB crawl always contains
  * corrupt files; dropping the partition for one bad asset is the
  * failure mode to avoid). Decoders allocate per partition, not per
  * row, where the codec API allows it.
  */
object Codecs {

  /** Decode image payloads (any `javax.imageio`-readable container —
    * PNG first among them) and emit real pixel features: width,
    * height, and `featureDim` horizontal-band mean luminances
    * (ITU BT.601 integer weights 299/587/114 over 8-bit RGB, summed
    * exactly as longs, one double division per band — deterministic
    * across JVMs). The luminance bands are the real-image analog of
    * the stub's byte-window means: same fixed-size `array<double>`
    * contract, so everything downstream of the stub decode runs
    * unchanged on real decodes. */
  def decodeImagePartitioned(assets: DataFrame, featureDim: Int = 4): DataFrame = {
    require(featureDim > 0, "featureDim must be positive")
    val spark = assets.sparkSession
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("width", LongType, nullable = true),
      StructField("height", LongType, nullable = true),
      StructField("features", ArrayType(DoubleType), nullable = true)))
    val payloadIdx = assets.schema.fieldIndex("payload")
    val rdd = assets.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val decoded: Option[(Long, Long, Array[Double])] =
          if (bytes == null) None
          else try {
            Option(javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))).map { img =>
              val w = img.getWidth; val h = img.getHeight
              // featureDim horizontal bands; band b covers rows
              // [b*h/featureDim, (b+1)*h/featureDim)
              val sums = new Array[Long](featureDim)
              val counts = new Array[Long](featureDim)
              var y = 0
              while (y < h) {
                val b = math.min(y * featureDim / h, featureDim - 1)
                var x = 0
                while (x < w) {
                  val rgb = img.getRGB(x, y)
                  val lum = 299L * ((rgb >> 16) & 0xff) +
                    587L * ((rgb >> 8) & 0xff) + 114L * (rgb & 0xff)
                  sums(b) += lum; counts(b) += 1L
                  x += 1
                }
                y += 1
              }
              val feats = Array.tabulate(featureDim)(b =>
                if (counts(b) == 0) 0.0 else sums(b).toDouble / (1000.0 * counts(b)))
              (w.toLong, h.toLong, feats)
            }
          } catch { case _: java.io.IOException => None }
        decoded match {
          case Some((w, h, f)) => Row.fromSeq(r.toSeq ++ Seq(w, h, f))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Decode WAV payloads (`javax.sound.sampled`; PCM 8/16-bit, mono
    * or interleaved) into the byte-PCM model the m-family operators
    * consume: sample_rate, n_samples, and `pcm` — one UNSIGNED byte
    * per (first-channel) sample, 16-bit samples taking their high
    * byte, signed recentred to 0..255. The pcm column slots directly
    * into [[Multimodal.energyWindows]] / [[Multimodal.sceneCuts]] as
    * the payload, so silence detection and cut detection run on REAL
    * decoded audio with zero downstream change (spec-proven on a
    * generated half-silence/half-square-wave WAV). */
  def decodeWavPartitioned(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(assets.schema.fields ++ Seq(
      StructField("sample_rate", DoubleType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("pcm", BinaryType, nullable = true)))
    val payloadIdx = assets.schema.fieldIndex("payload")
    val rdd = assets.rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val decoded: Option[(Double, Long, Array[Byte])] =
          if (bytes == null) None
          else try {
            val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              val fmt = in.getFormat
              val bytesPerSample = (fmt.getSampleSizeInBits + 7) / 8
              val frameSize = fmt.getFrameSize
              val raw = in.readAllBytes()
              val n = raw.length / frameSize
              val pcm = new Array[Byte](n)
              val bigEndian = fmt.isBigEndian
              val signed = fmt.getEncoding ==
                javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED
              var i = 0
              while (i < n) {
                val off = i * frameSize // first channel of the frame
                val v: Int =
                  if (bytesPerSample == 1) raw(off) & 0xff
                  else { // 16-bit: take the high byte as 0..255
                    val hi = if (bigEndian) raw(off) else raw(off + 1)
                    (hi & 0xff) ^ (if (signed) 0x80 else 0)
                  }
                // 8-bit signed recentres the same way
                pcm(i) = (if (bytesPerSample == 1 && signed) v ^ 0x80 else v).toByte
                i += 1
              }
              Some((fmt.getSampleRate.toDouble, n.toLong, pcm))
            } finally in.close()
          } catch {
            case _: javax.sound.sampled.UnsupportedAudioFileException => None
            case _: java.io.IOException => None
          }
        decoded match {
          case Some((sr, n, p)) => Row.fromSeq(r.toSeq ++ Seq(sr, n, p))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null))
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
