package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.unsafe.types.UTF8String

/** Fuzz of the byte-layout contract every md5 sketch oracle rests on:
  * `lower64`/`upper64` must equal the little-endian u64 of md5 digest
  * bytes [8,16) / [0,8) — exactly DuckDB's `md5_number_lower` /
  * `md5_number_upper`. The expected value here is derived INDEPENDENTLY
  * from the canonical md5 hex string (hex chars reversed pairwise into a
  * little-endian u64), so an endianness or offset slip in the hand-rolled
  * `le64` cannot cancel out against itself. Pinned vectors first, then
  * random token strings across the full unicode/empty/long tail. */
class NeutralHashPropertySpec extends AnyFunSuite {

  /** md5 hex via the JDK, rendered canonically (big-endian hex). */
  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"${b & 0xff}%02x").mkString
  }

  /** Little-endian u64 from 8 bytes of hex (16 chars): reverse the byte
    * pairs, parse as unsigned — the documented DuckDB layout, derived by
    * string surgery rather than bit shifts. */
  private def le64FromHex(hex16: String): Long = {
    val reversed = hex16.grouped(2).toSeq.reverse.mkString
    java.lang.Long.parseUnsignedLong(reversed, 16)
  }

  private def expectedLower(s: String): Long = le64FromHex(md5Hex(s).substring(16, 32))
  private def expectedUpper(s: String): Long = le64FromHex(md5Hex(s).substring(0, 16))

  test("pinned vectors: empty string and a known token") {
    // md5("") = d41d8cd98f00b204e9800998ecf8427e (RFC 1321 test suite)
    assert(md5Hex("") == "d41d8cd98f00b204e9800998ecf8427e")
    assert(NeutralHash.lower64("") == le64FromHex("e9800998ecf8427e"))
    assert(NeutralHash.upper64("") == le64FromHex("d41d8cd98f00b204"))
    // a multi-byte UTF-8 token exercises getBytes encoding agreement
    val tok = "café 中文"
    assert(NeutralHash.lower64(tok) == expectedLower(tok))
    assert(NeutralHash.upper64(tok) == expectedUpper(tok))
  }

  private val genToken: Gen[String] = Gen.frequency(
    5 -> Gen.stringOf(Gen.asciiPrintableChar),
    3 -> Gen.stringOf(Gen.oneOf(('a' to 'z') ++ ('0' to '9') :+ ' ')),
    2 -> Gen.listOf(Gen.oneOf(
      Gen.choose(' ', '~'), Gen.choose(' ', 'ӿ'),
      Gen.choose('一', '鿿'))).map(_.mkString),
    1 -> Gen.const(""),
    1 -> Gen.stringOf(Gen.asciiPrintableChar).map(_ * 50), // long inputs
  )

  private def samples(n: Int): Seq[String] =
    (0 until n).flatMap(i => genToken(Gen.Parameters.default, Seed(i.toLong)))

  test("lower64/upper64 match the md5 hex layout on random tokens") {
    samples(500).foreach { s =>
      assert(NeutralHash.lower64(s) == expectedLower(s), s"lower64 of ${s.take(40)}")
      assert(NeutralHash.upper64(s) == expectedUpper(s), s"upper64 of ${s.take(40)}")
    }
  }

  test("UTF8String and String variants agree; both64 is one digest of both") {
    samples(200).foreach { s =>
      val u = UTF8String.fromString(s)
      assert(NeutralHash.lower64(u) == NeutralHash.lower64(s))
      assert(NeutralHash.upper64(u) == NeutralHash.upper64(s))
      assert(NeutralHash.both64(u) == ((NeutralHash.lower64(s), NeutralHash.upper64(s))))
    }
  }

  test("unsignedString renders the full u64 range like UBIGINT::VARCHAR") {
    val edge = Seq(0L, 1L, -1L, Long.MinValue, Long.MaxValue, -2L)
    edge.foreach { v =>
      assert(NeutralHash.unsignedString(v).toString ==
        java.math.BigInteger.valueOf(v).and(
          new java.math.BigInteger("ffffffffffffffff", 16)).toString)
    }
  }
}
