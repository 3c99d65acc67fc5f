package graft.server

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import Negotiation._

/** Unit + property coverage of the negotiation module — the RFC cases
  * the reference enumerates in http/get_compressed/README.md:118-176. */
class NegotiationSpec extends AnyFunSuite {
  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val prefs = Seq("zstd", "gzip")

  test("absent header → identity (no surprise compression)") {
    assert(pickCoding(None, prefs, http10 = false) === Right("identity"))
    assert(pickCoding(None, prefs, http10 = true) === Right("identity"))
  }

  test("simple cases from the reference README") {
    assert(pickCoding(Some("zstd"), prefs, false) === Right("zstd"))
    assert(pickCoding(Some("gzip"), prefs, false) === Right("gzip"))
    assert(pickCoding(Some("br"), prefs, false) === Right("identity")) // unsupported → identity ok
    assert(pickCoding(Some("gzip, zstd"), prefs, false) === Right("zstd")) // server pref breaks tie
    assert(pickCoding(Some("zstd;q=0.5, gzip;q=0.8"), prefs, false) === Right("gzip"))
    assert(pickCoding(Some("*"), prefs, false) === Right("zstd"))
    assert(pickCoding(Some("identity"), prefs, false) === Right("identity"))
  }

  test("HTTP/1.0 always gets identity, whatever the client asks for") {
    assert(pickCoding(Some("zstd"), prefs, http10 = true) === Right("identity"))
    assert(pickCoding(Some("gzip, zstd"), prefs, http10 = true) === Right("identity"))
    assert(pickCoding(Some("*"), prefs, http10 = true) === Right("identity"))
  }

  test("identity;q=0 with no acceptable alternative → 406") {
    assert(pickCoding(Some("identity;q=0"), prefs, false).isLeft)
    assert(pickCoding(Some("identity;q=0, br"), prefs, false).isLeft)
    assert(pickCoding(Some("*;q=0"), prefs, false).isLeft)
    // but an acceptable coding rescues it
    assert(pickCoding(Some("identity;q=0, zstd"), prefs, false) === Right("zstd"))
    assert(pickCoding(Some("*;q=0, gzip"), prefs, false) === Right("gzip"))
  }

  test("q-value ordering wins over server preference") {
    assert(pickCoding(Some("zstd;q=0.1, gzip;q=0.9"), prefs, false) === Right("gzip"))
    // identity only beats codings when strictly higher
    assert(pickCoding(Some("identity;q=1, zstd;q=1"), prefs, false) === Right("zstd"))
    assert(pickCoding(Some("identity;q=1, zstd;q=0.9"), prefs, false) === Right("identity"))
  }

  test("quoted strings and whitespace survive tokenizing") {
    val elems = parseList("""application/vnd.apache.arrow.stream; codecs="zstd, lz4" , gzip;q="0.5"""")
    assert(elems.head.name === "application/vnd.apache.arrow.stream")
    assert(elems.head.params("codecs") === "zstd, lz4")
    assert(elems(1).name === "gzip")
    assert(elems(1).q === 0.5)
  }

  test("ipc codec selection honors server order and client list") {
    val mime = ArrowMime
    assert(pickIpcCodec(Some(s"""$mime; codecs="zstd, lz4""""), Seq("zstd", "lz4")) === Some("zstd"))
    assert(pickIpcCodec(Some(s"""$mime; codecs="lz4""""), Seq("zstd", "lz4")) === Some("lz4"))
    assert(pickIpcCodec(Some(s"""$mime; codecs="snappy""""), Seq("zstd", "lz4")) === None)
    assert(pickIpcCodec(Some(mime), Seq("zstd", "lz4")) === None)
    assert(pickIpcCodec(None, Seq("zstd", "lz4")) === None)
  }

  test("negotiate: codecs win over Accept-Encoding (never double-compress)") {
    val s = negotiate(Some(s"""$ArrowMime; codecs="lz4""""), Some("zstd"),
      Seq("zstd", "lz4"), prefs, false)
    assert(s === Right(Strategy(None, Some("lz4"))))
    assert(s.toOption.get.contentType.contains("codecs=\"lz4\""))
  }

  // ---------------- properties ----------------

  private val codingGen = Gen.oneOf("zstd", "gzip", "br", "identity", "*")
  private val qGen = Gen.oneOf("", ";q=0", ";q=0.1", ";q=0.5", ";q=1")
  private val elemGen = for { c <- codingGen; q <- qGen } yield c + q
  private val headerGen = Gen.chooseNum(1, 5)
    .flatMap(n => Gen.listOfN(n, elemGen)).map(_.mkString(", "))

  test("property: picked coding is always supported or identity, never q=0") {
    check(Prop.forAll(headerGen) { h =>
      pickCoding(Some(h), prefs, http10 = false) match {
        case Right(c) =>
          val elems = parseList(h)
          val explicit = elems.groupBy(_.name).map { case (n, es) => n -> es.last.q }
          val qc = explicit.get(c).orElse(explicit.get("*")).getOrElse(
            if (c == "identity") 1.0 else -1.0)
          (prefs :+ "identity").contains(c) && qc > 0
        case Left(_) =>
          // 406 only when identity is forbidden and nothing else works
          val elems = parseList(h)
          val explicit = elems.groupBy(_.name).map { case (n, es) => n -> es.last.q }
          val idQ = explicit.get("identity").orElse(explicit.get("*")).getOrElse(1.0)
          idQ == 0.0
      }
    })
  }

  test("property: parseList never throws on arbitrary ASCII headers") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      parseList(s); tokenize(s); true
    })
  }
}
