package graft.service

/** CH query-parameter substitution — `{name:Type}` placeholders bound
  * by the native protocol's parameter block or the HTTP door's
  * `param_<name>=` URL parameters. Values arrive as text; the
  * string-family types render as escaped SQL literals, and every
  * OTHER family is VALIDATED against its declared type before
  * splicing (advisor r14: a bound `{id:UInt64}` of `1; DROP TABLE t`
  * previously spliced verbatim — the one interface meant to be
  * injection-safe was not; CH parses the value as the declared type
  * and rejects garbage, so does this):
  *
  *   - integer/float/decimal families must parse as a single numeric
  *     literal;
  *   - Bool must be true/false/1/0;
  *   - Nullable(X)/LowCardinality(X) unwrap (a NULL value for
  *     Nullable splices the NULL keyword);
  *   - Array/Tuple/Map (and any unrecognized type) are restricted to
  *     a literal-only grammar — numbers, quoted strings, NULL,
  *     true/false, brackets, commas — never raw SQL text.
  *
  * Substitution engages only when the caller bound parameters, so
  * `{macro}` groups and brace literals in parameter-less requests pass
  * through untouched. An unbound placeholder refuses loudly (CH errors
  * on missing parameters too). */
object QueryParams {

  private val ParamRe =
    """\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([^}]*)\}""".r

  private val stringLike = Set("string", "fixedstring", "date", "date32",
    "datetime", "datetime64", "uuid", "enum8", "enum16", "ipv4", "ipv6")

  private val intLike = Set("int8", "int16", "int32", "int64", "int128",
    "int256", "uint8", "uint16", "uint32", "uint64", "uint128", "uint256")

  private val floatLike = Set("float32", "float64", "decimal", "decimal32",
    "decimal64", "decimal128", "decimal256")

  private val IntRe = """[+-]?\d+""".r
  private val NumRe = """[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?""".r

  def substitute(q: String, params: Map[String, String]): String = {
    if (params.isEmpty || !q.contains('{')) return q
    ParamRe.replaceAllIn(q, m => {
      val name = m.group(1)
      val t = m.group(2).trim
      val v = params.getOrElse(name,
        throw new IllegalArgumentException(
          s"query parameter '$name' ($t) has no bound value"))
      java.util.regex.Matcher.quoteReplacement(render(t, v, name))
    })
  }

  private def render(declared: String, v: String, name: String): String = {
    val t = declared.trim
    val base = t.takeWhile(_.isLetterOrDigit).toLowerCase
    def bad(why: String): Nothing = throw new IllegalArgumentException(
      s"query parameter '$name' ($declared): $why: '$v'")
    base match {
      case "nullable" | "lowcardinality" =>
        val open = t.indexOf('(')
        val close = t.lastIndexOf(')')
        if (open < 0 || close <= open) bad("malformed type")
        val innerT = t.substring(open + 1, close)
        val innerBase = innerT.trim.takeWhile(_.isLetterOrDigit).toLowerCase
        // CH spells a parameter NULL as \N; the bare word is accepted
        // for NON-string inners only (for a String inner "null" is a
        // legitimate 4-char value — coercing it was a silent data
        // change, review finding)
        val isNull = base == "nullable" && (v == "\\N" ||
          (!stringLike(innerBase) && v.trim.equalsIgnoreCase("null")))
        if (isNull) "NULL"
        else render(innerT, v, name)
      case b if stringLike(b) =>
        "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
      case b if intLike(b) =>
        val s = v.trim
        if (!IntRe.matches(s)) bad("not an integer literal")
        s
      case b if floatLike(b) =>
        val s = v.trim
        if (!NumRe.matches(s)) bad("not a numeric literal")
        s
      case "bool" | "boolean" => v.trim.toLowerCase match {
        case "true" | "1" => "true"
        case "false" | "0" => "false"
        case _ => bad("not a boolean literal")
      }
      case _ =>
        // Array/Tuple/Map and anything unrecognized: accept only what
        // the literal grammar can produce — never raw SQL text
        if (!literalOnly(v)) bad(
          "not a literal (numbers, quoted strings, NULL, true/false, " +
            "brackets, commas only)")
        v
    }
  }

  /** Token scan over a composite value: whitespace, BALANCED bracket/
    * brace/paren punctuation, commas/colons, STRICT numeric literals,
    * single-quoted strings (backslash escapes), and the
    * NULL/true/false keywords. Any bare identifier, operator, comment,
    * or unbalanced close — the injection surface — fails. (Review
    * finding: a lax numeric scan accepted `--` as a "number", letting
    * a composite value comment out the rest of the statement, and an
    * unbalanced `)` could escape a call context.) */
  private def literalOnly(v: String): Boolean = {
    var i = 0
    var depth = 0
    val n = v.length
    while (i < n) {
      val c = v(i)
      if (c.isWhitespace || c == ',' || c == ':') i += 1
      else if (c == '[' || c == '(' || c == '{') { depth += 1; i += 1 }
      else if (c == ']' || c == ')' || c == '}') {
        depth -= 1
        if (depth < 0) return false
        i += 1
      } else if (c == '\'') {
        i += 1
        var closed = false
        while (i < n && !closed) {
          if (v(i) == '\\' && i + 1 < n) i += 2
          else if (v(i) == '\'') { closed = true; i += 1 }
          else i += 1
        }
        if (!closed) return false
      } else if (c.isDigit || c == '+' || c == '-' || c == '.') {
        val start = i
        i += 1
        while (i < n && (v(i).isDigit || "+-.eE".indexOf(v(i).toInt) >= 0)) i += 1
        // the token must BE a number — `--`, `1-1`, `.e` are not
        if (!NumRe.matches(v.substring(start, i))) return false
      } else if (c.isLetter) {
        val start = i
        while (i < n && v(i).isLetter) i += 1
        val w = v.substring(start, i).toLowerCase
        if (w != "null" && w != "true" && w != "false") return false
      } else return false
    }
    depth == 0
  }
}
