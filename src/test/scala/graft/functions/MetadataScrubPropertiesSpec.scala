package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.{MediaMeta => M}

/** Property-based hardening of the byte-surgery kernels: on ARBITRARY
  * bytes (a 100 TB crawl ships every corruption imaginable) the scrub
  * must never throw, never grow the payload, stay idempotent, and the
  * audit must never throw and never report more metadata bytes than
  * exist. Structured generators then mix real segments with junk. */
class MetadataScrubPropertiesSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(300), p)
    assert(res.passed, res.status.toString)
  }

  private val rawBytes: Gen[Array[Byte]] =
    Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray)

  // bytes that START like a container (the walkers engage) but
  // continue arbitrarily — the adversarial corruption surface
  private val jpegish: Gen[Array[Byte]] =
    rawBytes.map(b => Array(0xFF.toByte, 0xD8.toByte) ++ b)
  private val pngish: Gen[Array[Byte]] =
    rawBytes.map(b => M.unhex(M.PngSigHex) ++ b)

  private val anyPayload: Gen[Array[Byte]] =
    Gen.oneOf(rawBytes, jpegish, pngish)

  // a syntactically plausible mixed stream of REAL segments and junk
  private val segmentSoup: Gen[Array[Byte]] = {
    val piece = Gen.oneOf(
      Gen.const(M.unhex(M.App1ExifGpsHex)),
      Gen.const(M.unhex(M.App0JfifHex)),
      Gen.const(M.unhex(M.ComHex)),
      Gen.const(M.unhex(M.TExtHex)),
      Gen.const(M.unhex(M.EXIfHex)),
      Gen.const(M.unhex(M.IhdrHex)),
      rawBytes)
    for {
      head <- Gen.oneOf(M.unhex(M.SoiHex), M.unhex(M.PngSigHex))
      parts <- Gen.listOfN(4, piece)
    } yield head ++ parts.flatten.toArray
  }

  test("scrub: total, non-growing, idempotent on arbitrary bytes") {
    check(Prop.forAll(anyPayload) { b =>
      val s = MetadataScrub.scrub(b)
      val s2 = MetadataScrub.scrub(s)
      s.length <= b.length && java.util.Arrays.equals(s, s2)
    })
  }

  test("scrub: total, non-growing, idempotent on segment soup") {
    check(Prop.forAll(segmentSoup) { b =>
      val s = MetadataScrub.scrub(b)
      s.length <= b.length &&
        java.util.Arrays.equals(s, MetadataScrub.scrub(s))
    })
  }

  test("audit: total, and meta_bytes never exceeds the payload") {
    check(Prop.forAll(Gen.oneOf(anyPayload, segmentSoup)) { b =>
      val a = MetadataScrub.audit(b)
      val (n, bytes, exif, gps) =
        (a.getLong(0), a.getLong(1), a.getLong(2), a.getLong(3))
      n >= 0 && bytes >= 0 && bytes <= b.length &&
        Set(0L, 1L)(exif) && Set(0L, 1L)(gps) &&
        (gps == 0L || exif == 1L) // GPS only ever rides inside EXIF
    })
  }

  test("scrub and audit agree: bytes removed == audited meta bytes") {
    // on payloads whose walkable prefix is well-formed, the scrub's
    // byte delta must equal the audit's meta_bytes (same walk, same
    // drop set) — checked on the soup, where both well-formed and
    // malformed tails occur
    check(Prop.forAll(segmentSoup) { b =>
      val removed = b.length - MetadataScrub.scrub(b).length
      removed == MetadataScrub.audit(b).getLong(1)
    })
  }
}
