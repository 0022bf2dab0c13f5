package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * Media decode libraries are unavailable in this environment, so the
  * decode step is a clearly-marked deterministic STUB; everything
  * Spark-side — the schema contract, binary handling, partition-local
  * batched processing via mapPartitions — is real and tested. In
  * production, [[decodeStub]] is replaced by the codec call and nothing
  * else changes.
  */
object Multimodal {

  /** Canonical media-asset schema: payload + typed metadata. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("n_bytes", LongType, nullable = true),
    StructField("content_md5", StringType, nullable = true)))

  /** Wrap a text corpus as binary assets (payload = utf8 bytes) —
    * stands in for image/audio blobs in tests; map-only. */
  def asAssets(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("text/plain").as("media_type"),
      encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast(LongType))
      .withColumn("content_md5", md5(col("payload")))

  /** Content-type sniffing by leading MAGIC BYTES — the multimodal
    * ingest's FIRST gate, before [[headerFields]] can even pick a
    * container layout (the file(1)/libmagic move: extensions and
    * Content-Type headers lie on a crawl; leading bytes don't).
    * Recognizes the common container magics (PNG, JPEG, GIF,
    * RIFF/WAVE, PDF, ZIP/OOXML, gzip, MP4 ftyp, UTF-8 BOM);
    * unmatched payloads classify 'unknown' and lead the triage list.
    * Map-only codegen'd hex-prefix compares — scan speed at 100 TB. */
  def sniffType(payload: Column): Column = {
    val hx = hex(payload.substr(lit(1), lit(12)))
    def pre(n: Int) = substring(hx, 1, n)
    when(pre(8) === "89504E47", "image/png")
      .when(pre(6) === "FFD8FF", "image/jpeg")
      .when(pre(8) === "47494638", "image/gif")
      .when(pre(8) === "52494646" &&
        substring(hx, 17, 8) === "57415645", "audio/wav")
      .when(pre(8) === "25504446", "application/pdf")
      .when(pre(8) === "504B0304", "application/zip")
      .when(pre(4) === "1F8B", "application/gzip")
      .when(substring(hx, 9, 8) === "66747970", "video/mp4")
      .when(pre(6) === "EFBBBF", "text/utf8-bom")
      .otherwise(lit("unknown"))
  }

  /** Corpus type-mix report over [[sniffType]] — what an ingest run
    * reads before sizing its decoder fleets (and the mismatch audit's
    * input: a declared media_type that disagrees with the sniffed one
    * is a mislabeled feed): per sniffed type, asset count, byte mass,
    * and the corpus share. One map-only classification pass + one
    * types-sized keyed count; share = a single IEEE division of exact
    * longs attached from a one-row broadcast. */
  def typeMix(assets: DataFrame): DataFrame = {
    val typed = assets.select(sniffType(col("payload")).as("sniffed_type"),
      octet_length(col("payload")).cast(LongType).as("nb"))
    val counts = typed.groupBy("sniffed_type")
      .agg(count(lit(1)).as("n_assets"), sum(col("nb")).as("total_bytes"))
    val tot = counts.agg(sum(col("n_assets")).as("__tot"))
    counts.crossJoin(broadcast(tot))
      .select(col("sniffed_type"), col("n_assets"), col("total_bytes"),
        // §6 quantizer (Quantize scaladoc): engine-identical at the
        // half boundary, unlike round(double, n)
        graft.functions.Quantize.qdp(
          col("n_assets").cast("double") / col("__tot").cast("double"), 6)
          .as("share"))
  }

  /** STUB decode as a native Catalyst expression: derives the
    * deterministic fixed-size "feature" vector from payload bytes with
    * the codegen'd [[graft.functions.ByteWindowSums]] kernel, so the
    * decode column stays inside whole-stage codegen (no RDD
    * round-trip). This is the shipped path; [[decodeStubPartitioned]]
    * keeps the batched-iterator shape a real codec needs. */
  def decodeStub(assets: DataFrame, featureDim: Int = 4): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    assets.withColumn("features", ColumnBridge.column(
      graft.functions.ByteWindowSums(
        ColumnBridge.expression(col("payload")), featureDim)))
  }

  /** STUB resize: downsample the payload to `targetDim` contiguous
    * byte-window means (a real pipeline swaps in the image scaler; the
    * fixed-size-output contract and the window/mean dataflow are the
    * Spark-side shape). Codegen'd ([[graft.functions.ByteWindowMeans]]),
    * map-only. */
  def resizeStub(assets: DataFrame, targetDim: Int = 16): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    assets.withColumn("resized", ColumnBridge.column(
      graft.functions.ByteWindowMeans(
        ColumnBridge.expression(col("payload")), targetDim)))
  }

  /** Frame sampling: emit every `stride`-th fixed-size frame of the
    * payload as its own row — the video-curation keyframe-extraction
    * shape. A real pipeline decodes container frames; the stub slices
    * the payload into `frameBytes`-sized windows (the last partial
    * window is dropped, as a truncated frame would be). Map-only
    * fan-out (offsets computed per row, then explode) — runs at scan
    * speed, output partitioning follows the input's, ~n_bytes/(frame·
    * stride) rows per asset. Output: (asset_id, frame_no, frame,
    * frame_md5) with frame_no the ORIGINAL frame index (0, stride,
    * 2·stride, …). */
  def sampleFrames(assets: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0, "frameBytes and stride must be positive")
    val hop = frameBytes * stride
    val n = octet_length(col("payload"))
    val starts = when(n >= frameBytes, sequence(lit(0), n - frameBytes, lit(hop)))
      .otherwise(array().cast("array<int>"))
    assets.select(col("asset_id"), col("payload"), explode(starts).as("off"))
      .select(
        col("asset_id"),
        (col("off") / frameBytes).cast("long").as("frame_no"),
        col("payload").substr(col("off") + 1, lit(frameBytes)).as("frame"))
      .withColumn("frame_md5", md5(col("frame")))
  }

  /** 64-bit aHash perceptual fingerprint of the payload, as 16 hex
    * chars — integer-exact (no floating-point means), codegen'd
    * ([[graft.functions.ByteAHash64]]). Over the stub resize windows;
    * swapping the real image scaler into the window step makes it real
    * image aHash with the same downstream contract. */
  def aHashHex(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(graft.functions.ByteAHash64(
      ColumnBridge.expression(payload)))
  }

  /** Perceptual near-dup pairs over binary assets — image/audio dedup
    * for a multimodal training corpus: aHash fingerprints, then the
    * SAME quarter-band blocking + popcount verify the SimHash text
    * family uses ([[graft.dedup.TextDedup.hexFingerprintPairs]]).
    * Map-only fingerprinting, one equi-join on 16-bit bands, no
    * all-pairs stage; lossless for hamming <= 3. */
  def perceptualDupPairs(assets: DataFrame, maxDist: Int = 3): DataFrame =
    graft.dedup.TextDedup.hexFingerprintPairs(
      assets.select(col("asset_id").as("doc_id"), aHashHex(col("payload")).as("fp")),
      maxDist)

  /** Container-header field extraction — the parse-the-header step of
    * media ingestion (think PNG IHDR / WAV fmt), as map-only column
    * expressions with no UDF: magic = first 2 payload bytes as text,
    * width/height = big-endian uint16s at byte offsets 2..3 and 4..5
    * (`hex` + `conv`, codegen'd builtins), body_bytes = payload past
    * the 6-byte header. Assets shorter than the header are dropped (a
    * truncated header is not parseable). Swap the offsets/widths for
    * the real container's layout; the binary-slicing dataflow is the
    * Spark-side shape. */
  def headerFields(assets: DataFrame): DataFrame =
    assets.filter(octet_length(col("payload")) >= 6).select(
      col("asset_id"),
      decode(col("payload").substr(lit(1), lit(2)), "UTF-8").as("magic"),
      conv(hex(col("payload").substr(lit(3), lit(2))), 16, 10)
        .cast(LongType).as("width"),
      conv(hex(col("payload").substr(lit(5), lit(2))), 16, 10)
        .cast(LongType).as("height"),
      (octet_length(col("payload")) - 6).cast(LongType).as("body_bytes"))

  /** Audio energy / silence segmentation — the trim-the-dead-air step
    * of audio curation, over the stub byte-PCM model: the payload is
    * cut into fixed-size frames ([[sampleFrames]]), each frame scored
    * by its mean level and its FLATNESS (spread of `subWindows`
    * contiguous sub-window means — a flat frame is tone/silence, a
    * lively one is speech-like), frames flatter than `flatThreshold`
    * flagged silent, then rolled up per asset. A real pipeline decodes
    * PCM samples into the frame step; every stage after the decode is
    * unchanged.
    *
    * Scale: map-only fan-out + one keyed rollup — scan speed, one
    * shuffle of (asset, frame-stat) rows. Determinism: frame and
    * sub-window sizes are powers of two, so every mean is an exact
    * binary double; the per-asset mean goes through DECIMAL(18,6)
    * (exact for 1/64ths) before the single rounded division. */
  def energyWindows(assets: DataFrame, frameBytes: Int = 64, stride: Int = 4,
                    subWindows: Int = 8, flatThreshold: Double = 4.0): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(Integer.bitCount(frameBytes) == 1 && Integer.bitCount(subWindows) == 1,
      "frameBytes and subWindows must be powers of two (exact means)")
    val frames = sampleFrames(assets, frameBytes, stride)
    val level = ColumnBridge.column(graft.functions.ByteWindowMeans(
      ColumnBridge.expression(col("frame")), 1))(0)
    val sub = ColumnBridge.column(graft.functions.ByteWindowMeans(
      ColumnBridge.expression(col("frame")), subWindows))
    frames.select(col("asset_id"), level.as("level"), sub.as("sub"))
      .withColumn("is_silent",
        array_max(col("sub")) - array_min(col("sub")) < flatThreshold)
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("is_silent"), 1L).otherwise(0L)).as("n_silent"),
        // §6 quantizer on the mean quotient (typeMix's note)
        graft.functions.Quantize.qdp(
          sum(col("level").cast(DecimalType(18, 6))).cast(DoubleType)
            / count(lit(1)), 6).as("mean_level"))
  }

  /** Scene-change (cut) detection — the shot-segmentation step of video
    * curation, over the stub byte-frame model: consecutive sampled
    * frames ([[sampleFrames]]) are compared by the L1 distance between
    * their `subWindows` sub-window mean signatures; a distance above
    * `cutThreshold` marks a cut. A real pipeline decodes frames and
    * swaps the signature for a color histogram — the lag-compare
    * dataflow and the per-asset rollup are the Spark-side shape.
    *
    * Scale: map-only frame fan-out, ONE per-asset window pass ordered
    * by frame_no (frames of one asset are a bounded partition — the
    * st2 sessionize posture), one keyed rollup. Determinism:
    * power-of-two windows make every mean an exact binary double, so
    * L1 distances and the threshold compare are engine-identical.
    *
    * Output per asset: n_frames, n_cuts, first_cut_frame (-1 when the
    * asset has no cut). */
  def sceneCuts(assets: DataFrame, frameBytes: Int = 64, stride: Int = 4,
                subWindows: Int = 8, cutThreshold: Double = 2.0): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    require(Integer.bitCount(frameBytes) == 1 && Integer.bitCount(subWindows) == 1,
      "frameBytes and subWindows must be powers of two (exact means)")
    val frames = sampleFrames(assets, frameBytes, stride)
    val sig = ColumnBridge.column(graft.functions.ByteWindowMeans(
      ColumnBridge.expression(col("frame")), subWindows))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("asset_id")).orderBy(col("frame_no"))
    frames.select(col("asset_id"), col("frame_no"), sig.as("sig"))
      .withColumn("prev", lag(col("sig"), 1).over(w))
      .withColumn("l1", when(col("prev").isNull, lit(null)).otherwise(
        aggregate(zip_with(col("sig"), col("prev"), (a, b) => abs(a - b)),
          lit(0.0), (acc, x) => acc + x)))
      .groupBy("asset_id")
      .agg(count(lit(1)).as("n_frames"),
        sum(when(col("l1") > cutThreshold, 1L).otherwise(0L)).as("n_cuts"),
        coalesce(min(when(col("l1") > cutThreshold, col("frame_no"))), lit(-1L))
          .as("first_cut_frame"))
  }

  /** Privacy-metadata scrub over binary assets — the t5 PII-scrub
    * discipline for container bytes ([[graft.functions.MetadataScrub]]:
    * JPEG APP1/EXIF incl. GPS + COM, PNG tEXt/zTXt/iTXt/eXIf; every
    * other payload and every malformed tail passes through verbatim).
    * Adds a `scrubbed` binary column; map-only codegen'd byte surgery,
    * scan speed at 100 TB. */
  def scrubMetadata(assets: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    assets.withColumn("scrubbed", ColumnBridge.column(
      graft.functions.MetadataScrub(ColumnBridge.expression(col("payload")))))
  }

  /** Metadata AUDIT over binary assets — the detection report a
    * privacy review reads before (and the verifier after) running
    * [[scrubMetadata]]: per asset, the count and byte mass of
    * metadata-bearing segments/chunks plus has_exif / has_gps flags
    * (the GPS flag PARSES the embedded TIFF's IFD0 for the GPSInfo
    * tag — [[graft.functions.MetadataAudit]]). Map-only, codegen'd. */
  def auditMetadata(assets: DataFrame): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    assets
      .withColumn("__a", ColumnBridge.column(graft.functions.MetadataAudit(
        ColumnBridge.expression(col("payload")))))
      .withColumn("n_meta_segments", col("__a")(0))
      .withColumn("meta_bytes", col("__a")(1))
      .withColumn("has_exif", col("__a")(2) === 1L)
      .withColumn("has_gps", col("__a")(3) === 1L)
      .drop("__a")
  }

  /** STUB decode, partition-batched: a real implementation calls the
    * media codec here (per partition, batched — the iterator shape is
    * what matters; swap the checksum for the codec call and nothing
    * else changes). Output is identical to [[decodeStub]]
    * (spec-checked). */
  def decodeStubPartitioned(assets: DataFrame, featureDim: Int = 4): DataFrame = {
    val spark = assets.sparkSession
    val outSchema = StructType(assets.schema.fields :+
      StructField("features", ArrayType(DoubleType), nullable = true))
    val payloadIdx = assets.schema.fieldIndex("payload")
    val rdd = assets.rdd.mapPartitions { rows =>
      // partition-local batch loop — where a codec would process a
      // batch of images/audio frames at a time
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val feats: Array[Double] =
          if (bytes == null) null
          else Array.tabulate(featureDim) { i =>
            // ??? <- real codec feature extraction goes here; stub:
            // byte-window checksum, deterministic
            bytes.iterator.zipWithIndex
              .filter(_._2 % featureDim == i).map(_._1.toInt & 0xff).sum.toDouble
          }
        Row.fromSeq(r.toSeq :+ (feats: Any))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }
}
