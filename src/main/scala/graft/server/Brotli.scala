package graft.server

import java.io.{InputStream, OutputStream}

/** Brotli (RFC 7932) STORED-MODE codec — the `br` HTTP content-coding
  * without any jarred encoder: every byte of payload travels in
  * uncompressed meta-blocks (§9.2 `ISUNCOMPRESSED`), which the RFC
  * admits as a first-class stream shape, so ANY stock brotli decoder
  * (browsers, curl, the C/Java/Rust libraries) reads this output.
  *
  * Why it exists: the reference's negotiation prefers `zstd > br > gzip`
  * (http/get_compressed/python/server/server.py:444-449) and its client
  * matrix requests `br` explicitly (client.py:89-96). This container has
  * no brotli jar (offline resolver), which blocked `br` parity for
  * eleven rounds; the stored-mode subset restores wire-format parity —
  * a client asking for `br` now gets a spec-valid brotli stream — while
  * the honest limitation is documented here: NO entropy coding, ratio
  * ≈ 1.0 (overhead ≤ 4 bytes + 1/2^20 per MiB block). Server preference
  * still ranks zstd first, so `br` is only chosen when the client asks
  * for it over zstd — exactly the reference's ranking semantics.
  *
  * The decoder handles the full stored-mode grammar (any WBITS, any
  * chunking, metadata blocks §9.2 MNIBBLES=0b11) and REJECTS
  * entropy-coded meta-blocks loudly — it exists for our own client path
  * and specs, not as a general brotli implementation.
  *
  * Bit layout per RFC 7932: bits fill bytes LSB-first; uncompressed
  * payload and every subsequent meta-block header start byte-aligned
  * (§9.1 stream header, §9.2 meta-block header).
  */
object Brotli {

  /** 1 MiB data per meta-block: MLEN-1 fits 20 bits (5 nibbles), far
    * under the WBITS=22 window (2^22 - 16), per-block overhead ~4 B. */
  val ChunkSize: Int = 1 << 20
  private val Wbits = 22

  /** One-shot convenience (specs, small payloads). */
  def compress(data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(data.length + 64)
    val out = new BrotliStoredOutputStream(bos)
    out.write(data); out.close()
    bos.toByteArray
  }

  /** One-shot decode of a stored-mode stream. */
  def decompress(data: Array[Byte]): Array[Byte] = {
    val in = new BrotliStoredInputStream(new java.io.ByteArrayInputStream(data))
    val bos = new java.io.ByteArrayOutputStream(data.length)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    bos.toByteArray
  }

  /** Streaming encoder: buffers up to [[ChunkSize]] and emits one
    * uncompressed meta-block per flush/fill; `close()` seals the stream
    * with the empty ISLAST meta-block. `flush()` emits a partial block
    * so streaming serves (64 KiB coalescing floor upstream) still make
    * progress — same contract as the zstd/gzip wrappers. */
  final class BrotliStoredOutputStream(out: OutputStream) extends OutputStream {
    private val buf = new Array[Byte](ChunkSize)
    private var filled = 0
    private var headerEmitted = false
    private var closed = false

    override def write(b: Int): Unit = {
      buf(filled) = b.toByte; filled += 1
      if (filled == ChunkSize) emitBlock()
    }

    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      var o = off
      var remaining = len
      while (remaining > 0) {
        val take = math.min(remaining, ChunkSize - filled)
        System.arraycopy(b, o, buf, filled, take)
        filled += take; o += take; remaining -= take
        if (filled == ChunkSize) emitBlock()
      }
    }

    override def flush(): Unit = {
      if (filled > 0) emitBlock()
      out.flush()
    }

    override def close(): Unit = {
      if (!closed) {
        closed = true
        if (filled > 0) emitBlock()
        // stream header even for the empty stream, then ISLAST+ISLASTEMPTY
        val bits = new BitAccumulator
        if (!headerEmitted) { emitWbits(bits); headerEmitted = true }
        bits.putBit(1) // ISLAST
        bits.putBit(1) // ISLASTEMPTY
        out.write(bits.toBytes)
        out.flush()
        out.close()
      }
    }

    private def emitWbits(bits: BitAccumulator): Unit = {
      // WBITS=22: '1' then 3-bit n = 22 - 17 = 5 (§9.1 decode mirror)
      bits.putBit(1)
      bits.putBits(Wbits - 17, 3)
    }

    private def emitBlock(): Unit = {
      val bits = new BitAccumulator
      if (!headerEmitted) { emitWbits(bits); headerEmitted = true }
      bits.putBit(0) // ISLAST
      val mlen = filled
      // minimal nibble count for MLEN-1 (4, 5 or 6 nibbles)
      val nibbles = if (mlen - 1 < (1 << 16)) 4 else if (mlen - 1 < (1 << 20)) 5 else 6
      bits.putBits(nibbles - 4, 2) // MNIBBLES code
      bits.putBits(mlen - 1, nibbles * 4)
      bits.putBit(1) // ISUNCOMPRESSED
      out.write(bits.toBytes) // pads to the byte boundary
      out.write(buf, 0, filled)
      filled = 0
    }
  }

  /** LSB-first bit packer; `toBytes` zero-pads the tail byte (the §9.2
    * "skip to byte boundary" fill). */
  private final class BitAccumulator {
    private val bytes = new java.io.ByteArrayOutputStream(8)
    private var cur = 0
    private var nbits = 0
    def putBit(b: Int): Unit = {
      cur |= (b & 1) << nbits
      nbits += 1
      if (nbits == 8) { bytes.write(cur); cur = 0; nbits = 0 }
    }
    def putBits(v: Int, n: Int): Unit = {
      var i = 0
      while (i < n) { putBit((v >> i) & 1); i += 1 }
    }
    def toBytes: Array[Byte] = {
      if (nbits > 0) { bytes.write(cur); cur = 0; nbits = 0 }
      bytes.toByteArray
    }
  }

  /** Streaming stored-mode decoder. Throws on entropy-coded meta-blocks
    * (outside the stored subset) and on malformed headers. */
  final class BrotliStoredInputStream(in: InputStream) extends InputStream {
    private var bitBuf = 0
    private var bitsLeft = 0
    private var remaining = 0L // bytes left in the current uncompressed block
    private var finished = false
    private var started = false

    private def readByteRaw(): Int = {
      val b = in.read()
      if (b < 0) throw new java.io.EOFException("truncated brotli stream")
      b
    }
    private def readBit(): Int = {
      if (bitsLeft == 0) { bitBuf = readByteRaw(); bitsLeft = 8 }
      val b = bitBuf & 1
      bitBuf >>= 1; bitsLeft -= 1
      b
    }
    private def readBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v |= readBit() << i; i += 1 }
      v
    }
    private def alignByte(): Unit = { bitsLeft = 0 }

    private def readWbits(): Unit = {
      if (readBit() == 0) () // WBITS = 16
      else {
        val n = readBits(3)
        if (n != 0) () // 17 + n
        else {
          val m = readBits(3)
          if (m == 1) throw new java.io.IOException("invalid WBITS")
          // m == 0 → 17, else 8 + m — all fine for stored blocks
        }
      }
    }

    /** Advance to the next uncompressed block; sets `remaining`/`finished`. */
    private def nextBlock(): Unit = {
      if (!started) { readWbits(); started = true }
      while (remaining == 0 && !finished) {
        val isLast = readBit()
        if (isLast == 1 && readBit() == 1) { finished = true; return }
        val mn = readBits(2)
        if (mn == 3) {
          // metadata block: reserved bit, MSKIPBYTES, MSKIPLEN, skip
          if (isLast == 1) throw new java.io.IOException("metadata block cannot be last")
          if (readBit() != 0) throw new java.io.IOException("reserved bit set")
          val skipBytes = readBits(2)
          val skipLen = if (skipBytes == 0) 0L
          else {
            var v = 0L
            var i = 0
            while (i < skipBytes) { v |= readBits(8).toLong << (8 * i); i += 1 }
            if (skipBytes > 1 && (v >> (8 * (skipBytes - 1))) == 0)
              throw new java.io.IOException("non-minimal MSKIPBYTES")
            v + 1
          }
          alignByte()
          var left = skipLen
          while (left > 0) { readByteRaw(); left -= 1 }
        } else {
          val nibbles = 4 + mn
          var mlen = 0L
          var i = 0
          while (i < nibbles) { mlen |= readBits(4).toLong << (4 * i); i += 1 }
          mlen += 1
          val uncompressed = if (isLast == 0) readBit() else 0
          if (uncompressed != 1)
            throw new java.io.IOException(
              "entropy-coded brotli meta-block: only the stored-mode subset is supported")
          alignByte()
          remaining = mlen
        }
      }
    }

    override def read(): Int = {
      if (finished) return -1
      if (remaining == 0) { nextBlock(); if (finished) return -1 }
      val b = readByteRaw()
      remaining -= 1
      b
    }

    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (len == 0) return 0
      if (finished) return -1
      if (remaining == 0) { nextBlock(); if (finished) return -1 }
      val want = math.min(len.toLong, remaining).toInt
      val n = in.read(b, off, want)
      if (n < 0) throw new java.io.EOFException("truncated brotli stream")
      remaining -= n
      n
    }
  }
}
