package graft.multimodal

/** Well-formed metadata segments/chunks as hex constants — the shared
  * fixture behind the m10 scrub entry, its DuckDB oracle, and the
  * injection specs (t5's PII-injection move, for container bytes):
  * the entry prepends these to the ASCII corpus, the scrubber removes
  * exactly the metadata-bearing ones, and the oracle REPLAYS the byte
  * arithmetic by constructing the expected output from the same
  * constants — no segment walking needed SQL-side.
  *
  * Every segment is structurally valid (real lengths, real CRCs, a
  * real little-endian TIFF with a GPS IFD), so the same constants
  * inject into codec-generated media in the specs and the scrubbed
  * output still decodes.
  */
object MediaMeta {

  private def hexOf(bytes: Array[Byte]): String =
    bytes.map(b => f"$b%02X").mkString

  /** Parse a hex string (upper or lower) into bytes. */
  def unhex(hx: String): Array[Byte] = {
    require(hx.length % 2 == 0, s"odd hex length: ${hx.length}")
    Array.tabulate(hx.length / 2)(i =>
      Integer.parseInt(hx.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  /** A complete PNG chunk (length + type + data + CRC32 of type+data)
    * as hex — CRCs are real, so injected chunks are valid PNG. */
  def pngChunkHex(chunkType: String, data: Array[Byte]): String = {
    require(chunkType.length == 4, "PNG chunk types are 4 chars")
    val tp = chunkType.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val c = new java.util.zip.CRC32()
    c.update(tp); c.update(data)
    hexOf(be32(data.length.toLong)) + hexOf(tp) + hexOf(data) +
      hexOf(be32(c.getValue))
  }

  /** A complete JPEG marker segment (marker + 2-byte BE length
    * including itself + data) as hex. */
  def jpegSegmentHex(marker: Int, data: Array[Byte]): String =
    f"FF$marker%02X${data.length + 2}%04X" + hexOf(data)

  /** Minimal little-endian TIFF: IFD0 with one entry (tag 0x8825 =
    * GPS IFD pointer) → GPS IFD with one entry (tag 0x0001 =
    * GPSLatitudeRef, ASCII "N\0" inline). 44 bytes — the smallest
    * structurally real EXIF body that demonstrably carries GPS. */
  val TiffGpsHex: String =
    "49492A00" +                 // "II*\0" little-endian magic
      "08000000" +               // IFD0 at offset 8
      "0100" +                   // IFD0: 1 entry
      "2588" + "0400" + "01000000" + "1A000000" + // GPSInfo LONG → @26
      "00000000" +               // no next IFD
      "0100" +                   // GPS IFD: 1 entry
      "0100" + "0200" + "02000000" + "4E000000" + // GPSLatitudeRef "N\0"
      "00000000"                 // no next IFD

  /** APP1 EXIF segment ("Exif\0\0" + the GPS TIFF). */
  val App1ExifGpsHex: String =
    jpegSegmentHex(0xE1, unhex("457869660000" + TiffGpsHex))

  /** APP0 JFIF segment (version 1.1, no thumbnail) — metadata-free,
    * must SURVIVE the scrub. */
  val App0JfifHex: String =
    jpegSegmentHex(0xE0, unhex("4A46494600" + "0101" + "00" +
      "0001" + "0001" + "00" + "00"))

  /** COM free-text comment segment — must be scrubbed. */
  val ComHex: String = jpegSegmentHex(0xFE,
    "camera XYZ v1.0".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** PNG 8-byte signature. */
  val PngSigHex: String = "89504E470D0A1A0A"

  /** Valid IHDR (16×16, 8-bit RGB) with a real CRC — must survive. */
  val IhdrHex: String = pngChunkHex("IHDR",
    be32(16L) ++ be32(16L) ++ Array[Byte](8, 2, 0, 0, 0))

  /** tEXt chunk (keyword "Author", NUL separator, value "graft" —
    * the real tEXt layout) — must be scrubbed. */
  val TExtHex: String = pngChunkHex("tEXt",
    "Author".getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++
      Array[Byte](0) ++
      "graft".getBytes(java.nio.charset.StandardCharsets.US_ASCII))

  /** eXIf chunk carrying the GPS TIFF — must be scrubbed. */
  val EXIfHex: String = pngChunkHex("eXIf", unhex(TiffGpsHex))

  /** SOI marker. */
  val SoiHex: String = "FFD8"

  // the m10 fixture's per-class (dirty prefix, expected clean prefix):
  // asset_id % 4 == 0 → JPEG with EXIF+GPS; 1 → PNG with tEXt+eXIf;
  // 2 → JPEG with a COM comment; 3 → raw text (untouched)
  val JpegExifDirtyHex: String = SoiHex + App1ExifGpsHex + App0JfifHex
  val JpegCleanHex: String = SoiHex + App0JfifHex
  val PngMetaDirtyHex: String = PngSigHex + IhdrHex + TExtHex + EXIfHex
  val PngCleanHex: String = PngSigHex + IhdrHex
  val JpegComDirtyHex: String = SoiHex + ComHex + App0JfifHex
}
