package graft.sources

/** Escape-correct codec for the FLAT string-to-string JSON documents this
  * engine persists and consumes — the secret payload (reference C1,
  * /root/reference/src/ingestion_lambda.py:123-138) and the watermark
  * state file (S14, /root/reference/src/ingestion_lambda.py:177-201).
  *
  * Both documents are `{"key": "value", ...}` by contract. The previous
  * regex scanner silently mis-parsed values containing `\"` (a password
  * with an escaped quote became wrong credentials) and broke on `{` in a
  * value; this is a real recursive-descent scanner for exactly the flat
  * shape: full JSON string escapes (`\" \\ \/ \b \f \n \r \t \uXXXX`),
  * and a LOUD failure — never a silent wrong answer — on anything the
  * shape excludes (nested objects/arrays, non-string values, trailing
  * garbage, malformed escapes). No dependency: ~70 lines, total.
  */
object MiniJson {

  /** Parse a flat `{"k": "v", ...}` document. Throws IllegalArgumentException
    * with position context on any deviation from the flat-string shape. */
  def parseFlat(s: String): Map[String, String] = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"malformed flat-JSON document at offset $i: $msg (near '${s.slice(i, i + 20)}')")
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      if (i >= s.length || s.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def string(): String = {
      skipWs()
      if (i >= s.length || s.charAt(i) != '"') fail("expected string")
      i += 1
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        s.charAt(i) match {
          case '\\' =>
            if (i + 1 >= s.length) fail("dangling escape")
            s.charAt(i + 1) match {
              case '"' => sb += '"'; i += 2
              case '\\' => sb += '\\'; i += 2
              case '/' => sb += '/'; i += 2
              case 'b' => sb += '\b'; i += 2
              case 'f' => sb += '\f'; i += 2
              case 'n' => sb += '\n'; i += 2
              case 'r' => sb += '\r'; i += 2
              case 't' => sb += '\t'; i += 2
              case 'u' =>
                if (i + 6 > s.length) fail("truncated \\u escape")
                val hex = s.substring(i + 2, i + 6)
                val cp = try Integer.parseInt(hex, 16)
                         catch { case _: NumberFormatException => fail(s"bad \\u escape '$hex'") }
                sb += cp.toChar; i += 6
              case c => fail(s"unsupported escape '\\$c'")
            }
          case c if c < ' ' => fail("unescaped control character in string")
          case c => sb += c; i += 1
        }
      }
      if (i >= s.length) fail("unterminated string")
      i += 1 // closing quote
      sb.result()
    }

    val out = Map.newBuilder[String, String]
    expect('{')
    skipWs()
    if (i < s.length && s.charAt(i) == '}') i += 1
    else {
      var more = true
      while (more) {
        val k = string()
        expect(':')
        skipWs()
        if (i < s.length && (s.charAt(i) == '{' || s.charAt(i) == '['))
          fail(s"nested value for key '$k' — this document must be flat string-to-string")
        out += k -> string()
        skipWs()
        if (i < s.length && s.charAt(i) == ',') { i += 1; more = true }
        else { expect('}'); more = false }
      }
    }
    skipWs()
    if (i != s.length) fail("trailing content after document")
    out.result()
  }

  /** Parse a document that is either the flat shape itself or ONE flat
    * object wrapped under a single top-level key — the reference's
    * actual secret delivery. The stored SecretString is BRACE-LESS
    * (`"crigglestone": {...}`): ingestion_lambda.py builds
    * `json.loads('{' + secret + '}')['crigglestone']`, so both the
    * pre-braced wrapped form and the verbatim brace-less store form are
    * accepted (the latter by applying the reference's own '{'+s+'}'
    * re-bracing). Anything else — two wrapping keys, double nesting,
    * arrays — still fails loudly with the FLAT parse's error, never a
    * silent wrong answer. */
  def parseFlatOrWrapped(s: String): Map[String, String] =
    try parseFlat(s)
    catch {
      case e: IllegalArgumentException =>
        val braceless = !s.dropWhile(_.isWhitespace).startsWith("{")
        val braced = if (braceless) s"{$s}" else s
        // Name every shape that was attempted — a malformed brace-less
        // secret would otherwise surface only the flat error on the
        // un-braced text ("expected {"), hiding that re-bracing +
        // single-key unwrap were tried too. The most specific parse
        // error (inner flat when the unwrap succeeded, outer flat
        // otherwise) is chained as the cause.
        val attempted =
          if (braceless) "flat, then re-braced single-key wrapped"
          else "flat, then single-key wrapped"
        def fail(cause: Throwable): Nothing =
          throw new IllegalArgumentException(
            s"secret parses as neither shape (attempted: $attempted): ${cause.getMessage}", cause)
        unwrapSingleKey(braced) match {
          case None => fail(e)
          case Some(inner) =>
            try parseFlat(inner)
            catch { case e2: IllegalArgumentException => fail(e2) }
        }
    }

  /** If `s` is exactly `{ "key" : { ... } }` (one key, object value,
    * nothing after), return the inner object text; scanning is
    * string-escape-aware so braces inside values can't fool it. */
  private def unwrapSingleKey(s: String): Option[String] = {
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def skipString(): Boolean = {
      if (i >= s.length || s.charAt(i) != '"') return false
      i += 1
      while (i < s.length && s.charAt(i) != '"') {
        if (s.charAt(i) == '\\') i += 2 else i += 1
      }
      if (i >= s.length) return false
      i += 1; true
    }
    skipWs()
    if (i >= s.length || s.charAt(i) != '{') return None
    i += 1
    skipWs()
    if (!skipString()) return None // the single wrapping key
    skipWs()
    if (i >= s.length || s.charAt(i) != ':') return None
    i += 1
    skipWs()
    if (i >= s.length || s.charAt(i) != '{') return None
    val start = i
    var depth = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => if (!skipString()) return None
        case '{' => depth += 1; i += 1
        case '}' =>
          depth -= 1; i += 1
          if (depth == 0) {
            val inner = s.substring(start, i)
            skipWs()
            if (i >= s.length || s.charAt(i) != '}') return None
            i += 1
            skipWs()
            return if (i == s.length) Some(inner) else None
          }
        case _ => i += 1
      }
    }
    None
  }

  /** Render a flat map as JSON with full escaping — the exact inverse of
    * [[parseFlat]] (round-trip asserted in SecretsSpec/StarPipelineSpec).
    * Keys sorted for stable diffs of the persisted state file. */
  def renderFlat(m: Map[String, String]): String =
    m.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${quote(k)}: ${quote(v)}" }
      .mkString("{", ", ", "}")

  private def quote(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\b' => "\\b"
      case '\f' => "\\f"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }.mkString("\"", "", "\"")
}
