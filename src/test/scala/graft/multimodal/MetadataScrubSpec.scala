package graft.multimodal

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.MetadataScrub
import graft.multimodal.{MediaMeta => M}

/** m10's byte surgery: JPEG APP1/COM and PNG text/eXIf chunks removed,
  * everything else byte-identical — hand-built segment walks, the
  * defensive malformed-tail stops, and REAL codec-generated media with
  * injected GPS EXIF that still decodes after the scrub. */
class MetadataScrubSpec extends SparkSpec {
  import spark.implicits._

  private def hx(b: Array[Byte]): String = b.map(x => f"$x%02X").mkString

  private def containsSlice(hay: Array[Byte], needle: Array[Byte]): Boolean =
    hx(hay).contains(hx(needle)) // hex-space search is fine for tests

  // --- kernel hand cases -------------------------------------------------

  test("JPEG: APP1 (EXIF/GPS) and COM drop, APP0 survives, tail verbatim") {
    val body = "not a real scan but opaque to the walker".getBytes("US-ASCII")
    val dirty = M.unhex(M.JpegExifDirtyHex) ++ body
    val clean = M.unhex(M.JpegCleanHex) ++ body
    assert(hx(MetadataScrub.scrub(dirty)) === hx(clean))
    val dirtyCom = M.unhex(M.JpegComDirtyHex) ++ body
    assert(hx(MetadataScrub.scrub(dirtyCom)) === hx(clean))
    // idempotent: re-scrubbing the clean output is a no-op
    assert(hx(MetadataScrub.scrub(clean)) === hx(clean))
  }

  test("JPEG: the walk stops at SOS — an APP1 byte pattern in entropy data survives") {
    // SOI + APP0 + SOS + (bytes that LOOK like an APP1 segment)
    val entropy = M.unhex(M.App1ExifGpsHex)
    val payload = M.unhex(M.SoiHex + M.App0JfifHex + "FFDA") ++ entropy
    assert(hx(MetadataScrub.scrub(payload)) === hx(payload),
      "bytes after SOS are opaque and must never be edited")
  }

  test("JPEG: standalone markers copy; malformed length keeps the tail verbatim") {
    // RST0 and TEM have no length field
    val standalone = M.unhex(M.SoiHex + "FFD0" + "FF01" + M.App1ExifGpsHex)
    val expectStandalone = M.unhex(M.SoiHex + "FFD0" + "FF01")
    assert(hx(MetadataScrub.scrub(standalone)) === hx(expectStandalone))
    // a segment whose declared length runs past the payload: untouched
    val truncated = M.unhex(M.SoiHex + "FFE1FFFF" + "AABB")
    assert(hx(MetadataScrub.scrub(truncated)) === hx(truncated))
  }

  test("PNG: tEXt/zTXt/iTXt/eXIf drop, IHDR/IDAT survive, IEND stops the walk") {
    val idat = M.pngChunkHex("IDAT", Array[Byte](1, 2, 3, 4))
    val iend = M.pngChunkHex("IEND", Array.emptyByteArray)
    val ztxt = M.pngChunkHex("zTXt", "k".getBytes("US-ASCII"))
    val itxt = M.pngChunkHex("iTXt", "k".getBytes("US-ASCII"))
    val dirty = M.unhex(M.PngSigHex + M.IhdrHex + M.TExtHex + ztxt + idat +
      itxt + M.EXIfHex + iend + M.TExtHex)
    // the tEXt after IEND is trailing garbage the walker must not touch
    val clean = M.unhex(M.PngSigHex + M.IhdrHex + idat + iend + M.TExtHex)
    assert(hx(MetadataScrub.scrub(dirty)) === hx(clean))
    // malformed chunk type (non-alphabetic): tail verbatim from there
    val malformed = M.unhex(M.PngSigHex + M.IhdrHex) ++
      "some trailing ascii, not a chunk".getBytes("US-ASCII")
    assert(hx(MetadataScrub.scrub(malformed)) === hx(malformed))
  }

  test("non-JPEG/PNG payloads pass through unchanged") {
    val wav = M.unhex("52494646AAAA000057415645FF00FF")
    val pdf = M.unhex("255044462D312E37") ++ "doc".getBytes("US-ASCII")
    val txt = "plain text".getBytes("US-ASCII")
    for (p <- Seq(wav, pdf, txt, Array.emptyByteArray))
      assert(hx(MetadataScrub.scrub(p)) === hx(p))
  }

  // --- real codec-generated media ----------------------------------------

  private def imageBytes(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, if ((x + y) % 2 == 0) 0xFFFFFF else 0x000000)
    val out = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  private def decode(b: Array[Byte]) = Option(
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))

  test("real PNG with injected tEXt+eXIf(GPS): scrub restores the original bytes and it still decodes") {
    val original = imageBytes("png", 16, 16)
    // inject right after the IHDR chunk (sig 8 + len/type 8 + 13 + crc 4)
    val at = 8 + 8 + 13 + 4
    val injected = original.take(at) ++ M.unhex(M.TExtHex + M.EXIfHex) ++
      original.drop(at)
    assert(decode(injected).isDefined, "the injected PNG must itself be valid")
    val scrubbed = MetadataScrub.scrub(injected)
    assert(hx(scrubbed) === hx(original),
      "scrubbing the injected chunks must restore the codec's exact bytes")
    assert(!containsSlice(scrubbed, M.unhex(M.TiffGpsHex)), "GPS TIFF gone")
    val img = decode(scrubbed)
    assert(img.isDefined && img.get.getWidth === 16 && img.get.getHeight === 16)
  }

  test("real JPEG with injected APP1 GPS EXIF: scrub drops it, image still decodes, m8 re-sniffs") {
    val original = imageBytes("jpg", 16, 16)
    val injected = original.take(2) ++ M.unhex(M.App1ExifGpsHex) ++
      original.drop(2)
    assert(decode(injected).isDefined, "the injected JPEG must itself be valid")
    val scrubbed = MetadataScrub.scrub(injected)
    assert(hx(scrubbed) === hx(MetadataScrub.scrub(original)),
      "scrub(injected) must equal scrub(original) byte for byte")
    assert(!containsSlice(scrubbed, M.unhex(M.TiffGpsHex)), "GPS TIFF gone")
    val img = decode(scrubbed)
    assert(img.isDefined && img.get.getWidth === 16 && img.get.getHeight === 16)
    // the scrubbed payloads re-sniff as their container types (m8's gate)
    val sniffed = Seq(Tuple1(scrubbed)).toDF("payload")
      .select(Multimodal.sniffType(col("payload"))).as[String].collect().head
    assert(sniffed === "image/jpeg")
  }

  // --- the audit twin ------------------------------------------------------

  private def auditOf(b: Array[Byte]): (Long, Long, Long, Long) = {
    val a = MetadataScrub.audit(b)
    (a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3))
  }

  test("audit: counts, byte mass, and a REAL GPS-IFD parse (not a byte grep)") {
    val body = "opaque body".getBytes("US-ASCII")
    // JPEG with EXIF+GPS: 1 segment, its full byte mass, both flags
    assert(auditOf(M.unhex(M.JpegExifDirtyHex) ++ body) ===
      ((1L, M.App1ExifGpsHex.length / 2L, 1L, 1L)))
    // JPEG with a COM comment: metadata, but no EXIF and no GPS
    assert(auditOf(M.unhex(M.JpegComDirtyHex) ++ body) ===
      ((1L, M.ComHex.length / 2L, 0L, 0L)))
    // PNG with tEXt + eXIf(GPS): 2 chunks, both flags
    assert(auditOf(M.unhex(M.PngMetaDirtyHex) ++ body) ===
      ((2L, (M.TExtHex.length + M.EXIfHex.length) / 2L, 1L, 1L)))
    // an EXIF whose TIFF has NO GPSInfo tag: has_exif without has_gps —
    // IFD0's one entry is ImageDescription (0x010E), not 0x8825
    val tiffNoGps = "49492A0008000000" + "0100" +
      "0E010200040000001A000000" + "00000000" + "61626300"
    val app1NoGps = M.jpegSegmentHex(0xE1, M.unhex("457869660000" + tiffNoGps))
    assert(auditOf(M.unhex(M.SoiHex + app1NoGps + M.App0JfifHex) ++ body) ===
      ((1L, app1NoGps.length / 2L, 1L, 0L)),
      "a GPS claim must come from the IFD walk finding tag 0x8825")
    // big-endian (MM) TIFF with GPS: the parser honors byte order
    val tiffBeGps = "4D4D002A00000008" + "0001" +
      "882500040000000100000026" + "00000000"
    val app1Be = M.jpegSegmentHex(0xE1, M.unhex("457869660000" + tiffBeGps))
    assert(auditOf(M.unhex(M.SoiHex + app1Be) ++ body)._4 === 1L,
      "big-endian GPSInfo tag must be found")
    // non-container payloads audit all-zero
    assert(auditOf("plain".getBytes("US-ASCII")) === ((0L, 0L, 0L, 0L)))
  }

  test("audit ∘ scrub reads all-clear (the privacy-review verify loop)") {
    val body = "body bytes".getBytes("US-ASCII")
    for (dirtyHex <- Seq(M.JpegExifDirtyHex, M.PngMetaDirtyHex, M.JpegComDirtyHex)) {
      val dirty = M.unhex(dirtyHex) ++ body
      assert(auditOf(dirty)._1 > 0L, "the dirty fixture must audit dirty")
      assert(auditOf(MetadataScrub.scrub(dirty)) === ((0L, 0L, 0L, 0L)),
        s"scrubbed output must audit clean for $dirtyHex")
    }
    // and on real codec media with injected GPS EXIF
    val injected = {
      val o = imageBytes("jpg", 8, 8)
      o.take(2) ++ M.unhex(M.App1ExifGpsHex) ++ o.drop(2)
    }
    assert(auditOf(injected)._4 === 1L, "real JPEG + injected GPS audits dirty")
    assert(auditOf(MetadataScrub.scrub(injected))._4 === 0L)
  }

  // --- the Spark-side operator -------------------------------------------

  test("scrubMetadata: column-level scrub matches the kernel and m5 still parses") {
    val body0 = "jpeg body ".getBytes("US-ASCII")
    val body1 = "png body xx".getBytes("US-ASCII")
    val assets = Seq(
      (0L, M.unhex(M.JpegExifDirtyHex) ++ body0),
      (1L, M.unhex(M.PngMetaDirtyHex) ++ body1),
      (2L, M.unhex(M.JpegComDirtyHex) ++ body0),
      (3L, "raw text asset".getBytes("US-ASCII")))
      .toDF("asset_id", "payload")
    val got = Multimodal.scrubMetadata(assets)
      .select(col("asset_id"), hex(col("scrubbed")).as("hx"))
      .as[(Long, String)].collect().toMap
    assert(got(0L) === M.JpegCleanHex + hx(body0))
    assert(got(1L) === M.PngCleanHex + hx(body1))
    assert(got(2L) === M.JpegCleanHex + hx(body0))
    assert(got(3L) === hx("raw text asset".getBytes("US-ASCII")))
    // m5's header parse (ASCII-magic stub layout) still runs over the
    // scrubbed pass-through class — the scrub left it byte-identical
    val parsed = Multimodal.headerFields(
      Multimodal.scrubMetadata(assets).filter(col("asset_id") === 3L)
        .drop("payload").withColumnRenamed("scrubbed", "payload"))
      .as[(Long, String, Long, Long, Long)].collect()
    assert(parsed.length === 1 && parsed.head._2 === "ra")
  }
}
