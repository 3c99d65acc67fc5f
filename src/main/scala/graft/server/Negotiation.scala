package graft.server

/** HTTP content-negotiation for Arrow responses — Scala reimplementation
  * of the semantics the reference's get_compressed server implements
  * (http/get_compressed/python/server/server.py: tokenizer :99-111,
  * Accept-Encoding parse :114-178, pick_ipc_codec :184-237, pick_coding
  * :240-299, composite :302-338; RFC cases enumerated in
  * http/get_compressed/README.md:118-176).
  *
  * Strategy strings: "identity", an HTTP coding ("zstd"/"gzip"), or
  * "identity+<ipc codec>" for per-buffer IPC compression.
  */
object Negotiation {

  val ArrowMime = "application/vnd.apache.arrow.stream"

  /** One element of a comma-separated header list: token + parameters. */
  final case class Element(name: String, params: Map[String, String]) {
    def q: Double = params.get("q").flatMap(s => s.toDoubleOption)
      .map(v => if (v < 0) 0.0 else if (v > 1) 1.0 else v).getOrElse(1.0)
  }

  /** Tokenize a header value respecting quoted strings (RFC 2616 §2.2):
    * yields tokens, separators and quoted strings (unescaped). */
  private[server] def tokenize(s: String): List[String] = {
    val out = List.newBuilder[String]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '"') {
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else if (d == '"') { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        out += "\"" + sb.result() // keep a marker so callers know it was quoted
      } else if (c == ',' || c == ';' || c == '=') {
        out += c.toString; i += 1
      } else if (c.isWhitespace) i += 1
      else {
        val start = i
        while (i < n && !",;=\" \t".contains(s.charAt(i))) i += 1
        out += s.substring(start, i)
      }
    }
    out.result()
  }

  /** Parse a comma-separated list of `token[;p=v]*` elements. */
  private[server] def parseList(header: String): List[Element] = {
    val toks = tokenize(header)
    val elems = List.newBuilder[Element]
    var name: Option[String] = None
    var params = Map.newBuilder[String, String]
    var pendingKey: Option[String] = None
    var inParam = false

    def flush(): Unit = {
      name.foreach(n => elems += Element(n.toLowerCase, params.result()))
      name = None; params = Map.newBuilder; pendingKey = None; inParam = false
    }
    toks.foreach {
      case "," => flush()
      case ";" => inParam = true; pendingKey = None
      case "=" => () // value follows
      case t =>
        val value = if (t.startsWith("\"")) t.substring(1) else t
        if (!inParam && name.isEmpty) name = Some(value)
        else if (inParam && pendingKey.isEmpty) pendingKey = Some(value.toLowerCase)
        else if (inParam) { params += (pendingKey.get -> value); pendingKey = None }
    }
    flush()
    elems.result()
  }

  /** Pick an HTTP content-coding per Accept-Encoding.
    * Returns Right(coding) — "identity" means no coding — or Left(406
    * diagnostic). Mirrors the reference's rules: q-values ranked,
    * server preference breaks ties, `*` covers unmentioned codings,
    * explicit `identity;q=0` (or `*;q=0` without identity mention)
    * forbids the uncoded fallback → 406 when nothing else fits. */
  def pickCoding(acceptEncoding: Option[String], serverPrefs: Seq[String],
      http10: Boolean): Either[String, String] = {
    // HTTP/1.0 has no chunked transfer and unreliable coding support —
    // the reference serves it uncoded (server.py:495-499 branches on
    // protocol); force identity regardless of Accept-Encoding.
    if (http10) return Right("identity")
    acceptEncoding match {
      case None | Some("") =>
        // Deviation from the reference (server.py:495-499 defaults
        // HTTP/1.1 to gzip assuming browser clients): an absent
        // Accept-Encoding means only identity is safe for programmatic
        // clients, so we send uncoded.
        Right("identity")
      case Some(h) =>
        val elems = parseList(h)
        if (elems.isEmpty) return Right("identity")
        val explicit: Map[String, Double] = elems.groupBy(_.name).map {
          case (n, es) => n -> es.last.q
        }
        val star = explicit.get("*")
        def qOf(coding: String): Option[Double] =
          explicit.get(coding).orElse(star)
        val candidates = serverPrefs
          .flatMap(c => qOf(c).filter(_ > 0).map(q => (c, q)))
        // identity is acceptable unless explicitly excluded; it only
        // OUTRANKS an offered coding when the client gave it a strictly
        // higher explicit q (clients listing a coding want that coding)
        val identityExplicit = explicit.get("identity").orElse(star)
        if (candidates.nonEmpty) {
          val bestQ = candidates.map(_._2).max
          if (identityExplicit.exists(_ > bestQ)) Right("identity")
          else Right(candidates.filter(_._2 == bestQ).head._1)
        } else if (identityExplicit.forall(_ > 0)) Right("identity")
        else Left(s"no acceptable content-coding; server supports: " +
          (serverPrefs :+ "identity").mkString(", "))
    }
  }

  /** Pick an IPC buffer codec from `Accept: application/vnd.apache.arrow.stream;
    * codecs="zstd, lz4"`. Returns the first server-supported codec in
    * server-preference order, or None when the header requests none. */
  def pickIpcCodec(accept: Option[String], serverCodecs: Seq[String]): Option[String] =
    accept.flatMap { h =>
      val arrow = parseList(h).filter(e =>
        e.name == ArrowMime || e.name == "*/*" || e.name == "application/*")
      val requested: Seq[String] = arrow.flatMap(_.params.get("codecs")).flatMap(
        _.split(",").map(_.trim.toLowerCase).filter(_.nonEmpty))
      serverCodecs.find(requested.contains)
    }

  final case class Strategy(
      /** HTTP Content-Encoding to apply (None = identity). */
      httpCoding: Option[String],
      /** IPC per-buffer codec (None = uncompressed buffers). */
      ipcCodec: Option[String]) {
    def contentType: String =
      ipcCodec.fold(ArrowMime)(c => s"""$ArrowMime; codecs="$c"""")
  }

  /** Composite negotiation, reference precedence (server.py:302-338):
    * IPC codecs requested via Accept win (never double-compress);
    * otherwise negotiate an HTTP coding; 406 when impossible. */
  def negotiate(accept: Option[String], acceptEncoding: Option[String],
      serverIpcCodecs: Seq[String], serverCodings: Seq[String],
      http10: Boolean): Either[String, Strategy] = {
    pickIpcCodec(accept, serverIpcCodecs) match {
      case Some(codec) => Right(Strategy(None, Some(codec)))
      case None => pickCoding(acceptEncoding, serverCodings, http10).map {
        case "identity" => Strategy(None, None)
        case coding     => Strategy(Some(coding), None)
      }
    }
  }
}
