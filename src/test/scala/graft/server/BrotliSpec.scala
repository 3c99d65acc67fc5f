package graft.server

import org.scalatest.funsuite.AnyFunSuite

/** RFC 7932 stored-mode conformance for [[Brotli]]. No stock brotli
  * implementation exists in this container (that jar-block is WHY this
  * codec exists), so validity is pinned two independent ways:
  *   1. golden byte vectors derived BY HAND from the RFC's bit layout
  *      (§9.1 stream header, §9.2 meta-block header, LSB-first fill) —
  *      the encoder must hit them bit-exactly;
  *   2. decode of hand-assembled foreign shapes the encoder never
  *      emits (WBITS=16 header, metadata blocks, 4-nibble MLEN) — so
  *      encoder and decoder cannot share a common misreading.
  */
class BrotliSpec extends AnyFunSuite {

  test("golden vector: compress(\"abc\") matches the hand-derived RFC bits") {
    // bits in stream order (LSB-first per byte):
    //   WBITS=22      -> 1, then n=5 as 3 bits: 1,0,1
    //   ISLAST        -> 0
    //   MNIBBLES=4    -> 0,0
    //   MLEN-1 = 2    -> 16 bits: 0,1,0,0,0,0,0,0,0,0,0,0,0,0,0,0
    //   ISUNCOMP      -> 1
    //   pad to byte, 3 raw bytes, then ISLAST=1 ISLASTEMPTY=1 (0x03)
    val expected = Array[Byte](0x0b, 0x01, 0x80.toByte, 'a', 'b', 'c', 0x03)
    assert(Brotli.compress("abc".getBytes("UTF-8")).toSeq === expected.toSeq)
  }

  test("golden vector: the empty stream is header + empty-last block") {
    // bits: 1,1,0,1 (WBITS=22), ISLAST=1, ISLASTEMPTY=1 -> 0b110111 = 0x3b
    assert(Brotli.compress(Array.emptyByteArray).toSeq === Seq(0x3b.toByte))
  }

  test("round-trips across block-boundary sizes") {
    val rnd = new scala.util.Random(42)
    for (n <- Seq(1, 100, Brotli.ChunkSize - 1, Brotli.ChunkSize,
        Brotli.ChunkSize + 1, 3 * Brotli.ChunkSize + 12345)) {
      val data = new Array[Byte](n)
      rnd.nextBytes(data)
      val enc = Brotli.compress(data)
      assert(Brotli.decompress(enc).toSeq === data.toSeq, s"n=$n")
      // stored-mode overhead stays under 6 bytes per MiB block + seal
      assert(enc.length <= n + 6 * (n / Brotli.ChunkSize + 2), s"n=$n overhead")
    }
  }

  test("flush() emits a partial block so streaming consumers progress") {
    val bos = new java.io.ByteArrayOutputStream
    val out = new Brotli.BrotliStoredOutputStream(bos)
    out.write("hello ".getBytes)
    out.flush()
    val afterFlush = bos.size()
    assert(afterFlush >= 7, "flushed bytes must include the first block")
    out.write("world".getBytes)
    out.close()
    assert(Brotli.decompress(bos.toByteArray).toSeq === "hello world".getBytes.toSeq)
  }

  /** LSB-first bit assembler for the hand-built foreign streams. */
  private class Bits {
    private val out = new java.io.ByteArrayOutputStream
    private var cur = 0
    private var n = 0
    def bit(b: Int): this.type = {
      cur |= (b & 1) << n; n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
      this
    }
    def bits(v: Long, k: Int): this.type = { (0 until k).foreach(i => bit(((v >> i) & 1).toInt)); this }
    def align(): this.type = { if (n > 0) { out.write(cur); cur = 0; n = 0 }; this }
    def raw(b: Array[Byte]): this.type = { align(); out.write(b); this }
    def bytes: Array[Byte] = { align(); out.toByteArray }
  }

  test("decodes a foreign WBITS=16 stream with 4-nibble MLEN") {
    val payload = "foreign-shape".getBytes
    val b = new Bits
    b.bit(0) // WBITS = 16
    b.bit(0) // ISLAST = 0
    b.bits(0, 2) // MNIBBLES = 4
    b.bits(payload.length - 1L, 16)
    b.bit(1) // ISUNCOMPRESSED
    b.raw(payload)
    b.bit(1).bit(1) // ISLAST, ISLASTEMPTY
    assert(Brotli.decompress(b.bytes).toSeq === payload.toSeq)
  }

  test("skips metadata meta-blocks (MNIBBLES=0b11)") {
    val payload = "after-metadata".getBytes
    val meta = Array[Byte](9, 9, 9, 9) // 4 bytes to skip
    val b = new Bits
    b.bit(0) // WBITS = 16
    // metadata block: ISLAST=0, MNIBBLES=3, reserved=0, MSKIPBYTES=1,
    // MSKIPLEN byte = 3 (skip 3+1 bytes), align, skipped bytes
    b.bit(0).bits(3, 2).bit(0).bits(1, 2).bits(3, 8).raw(meta)
    // then a real data block
    b.bit(0).bits(0, 2).bits(payload.length - 1L, 16).bit(1).raw(payload)
    b.bit(1).bit(1)
    assert(Brotli.decompress(b.bytes).toSeq === payload.toSeq)
  }

  test("rejects entropy-coded meta-blocks loudly") {
    val b = new Bits
    b.bit(0) // WBITS = 16
    b.bit(0).bits(0, 2).bits(9, 16).bit(0) // ISUNCOMPRESSED = 0
    b.bits(0, 32) // junk "compressed" bits
    val ex = intercept[java.io.IOException](Brotli.decompress(b.bytes))
    assert(ex.getMessage.contains("stored-mode subset"))
  }

  test("truncated stream fails with EOF, not silent short data") {
    val enc = Brotli.compress("some payload worth keeping".getBytes)
    intercept[java.io.EOFException](
      Brotli.decompress(java.util.Arrays.copyOf(enc, enc.length - 8)))
  }
}
