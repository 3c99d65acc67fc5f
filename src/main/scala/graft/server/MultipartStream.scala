package graft.server

import java.io.{InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets.UTF_8

/** Streaming multipart/mixed parser: scans for boundaries incrementally
  * and exposes each part body as a bounded InputStream — never buffers
  * the whole response (the reference's measured lesson: naive parse cost
  * 85% of total time, http/get_multipart/python/client/README.md:41-49).
  *
  * Assumes parts are delimited by CRLF + "--boundary" (our server always
  * emits the leading CRLF, including before the first part).
  */
object MultipartStream {

  final case class Part(headers: Map[String, String], body: InputStream)

  /** Bulk-read chunk size — shared by BoundedBody's read cap and the
    * pushback capacity below: unread(avail - delim.length) is only safe
    * because the pushback buffer is sized for a whole chunk. */
  private val ChunkSize = 64 * 1024

  /** Parse `in` with the given boundary, invoking `handler` per part in
    * order. Each part's body is drained after the handler returns. */
  def parse(in: InputStream, boundary: String)(handler: Part => Unit): Unit = {
    // pushback capacity covers a bulk-read chunk: BoundedBody.read(b,_,_)
    // may unread most of a chunk when a delimiter candidate sits inside it
    val pb = new PushbackInputStream(in, ChunkSize + boundary.length + 8)
    val delim = ("\r\n--" + boundary).getBytes(UTF_8)
    // preamble: everything before the first delimiter is discarded
    drain(new BoundedBody(pb, delim))
    var done = consumeBoundaryTail(pb)
    while (!done) {
      val headers = readHeaders(pb)
      val body = new BoundedBody(pb, delim)
      handler(Part(headers, body))
      drain(body)
      done = consumeBoundaryTail(pb)
    }
  }

  private def drain(in: InputStream): Unit = {
    val buf = new Array[Byte](8192)
    while (in.read(buf) != -1) ()
  }

  /** After a delimiter: "--" → final boundary; CRLF → next part. */
  private def consumeBoundaryTail(in: PushbackInputStream): Boolean = {
    val a = in.read(); val b = in.read()
    if (a == '-' && b == '-') true
    else if (a == '\r' && b == '\n') false
    else throw new IllegalStateException(s"malformed boundary tail: $a,$b")
  }

  /** Header lines up to the blank line separating headers from body. */
  private def readHeaders(in: PushbackInputStream): Map[String, String] = {
    val headers = Map.newBuilder[String, String]
    var line = readLine(in)
    while (line.nonEmpty) {
      val idx = line.indexOf(':')
      if (idx > 0)
        headers += line.substring(0, idx).trim.toLowerCase -> line.substring(idx + 1).trim
      line = readLine(in)
    }
    headers.result()
  }

  private def readLine(in: InputStream): String = {
    val sb = new StringBuilder
    var c = in.read()
    while (c != -1 && c != '\n') { if (c != '\r') sb.append(c.toChar); c = in.read() }
    sb.toString
  }

  /** Reads until the delimiter byte sequence; partial matches that turn
    * out not to be the delimiter are pushed back. */
  private final class BoundedBody(in: PushbackInputStream, delim: Array[Byte])
      extends InputStream {
    private var ended = false

    override def read(): Int = {
      if (ended) return -1
      val c = in.read()
      if (c == -1) { ended = true; return -1 }
      if (c != delim(0)) return c
      // potential delimiter start: look ahead
      val look = new Array[Byte](delim.length)
      look(0) = c.toByte
      var n = 1
      var matched = true
      while (n < delim.length && matched) {
        val d = in.read()
        if (d == -1) matched = false
        else {
          look(n) = d.toByte; n += 1
          if (look(n - 1) != delim(n - 1)) matched = false
        }
      }
      if (matched && n == delim.length) { ended = true; -1 }
      else { in.unread(look, 1, n - 1); c }
    }

    /** Bulk fast path: read a chunk, scan it for the delimiter in-place,
      * and push back whatever belongs to the boundary/next part. One
      * virtual call per chunk instead of one per byte — this is the
      * difference the reference measured as 85% parse overhead
      * (http/get_multipart/python/client/README.md:41-49). */
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      if (ended) return -1
      val cap = math.min(len, ChunkSize)
      val n = in.read(b, off, cap)
      if (n == -1) { ended = true; return -1 }
      var i = 0
      while (i < n) {
        if (b(off + i) == delim(0)) {
          val avail = n - i
          val cmp = math.min(avail, delim.length)
          var j = 1
          while (j < cmp && b(off + i + j) == delim(j)) j += 1
          if (j == delim.length) {
            // full delimiter inside the chunk: consume it, return prefix
            in.unread(b, off + i + delim.length, avail - delim.length)
            ended = true
            return if (i == 0) -1 else i
          } else if (j == cmp && avail < delim.length) {
            // chunk ends mid-candidate: return the clean prefix, push the
            // ambiguous tail back for the per-byte path to disambiguate
            in.unread(b, off + i, avail)
            if (i > 0) return i
            val c = read() // per-byte lookahead resolves the candidate
            if (c == -1) return -1
            b(off) = c.toByte
            return 1
          }
        }
        i += 1
      }
      n
    }
  }
}
