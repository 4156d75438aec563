package graft.service

/** CH query-parameter substitution — `{name:Type}` placeholders bound
  * by the native protocol's parameter block or the HTTP door's
  * `param_<name>=` URL parameters. Values arrive as text; the
  * string-family types render as escaped SQL literals, everything else
  * (numbers, arrays, tuples) verbatim in its own text form — exactly
  * how CH's HTTP interface reads `param_x`. Substitution engages only
  * when the caller bound parameters, so `{macro}` groups and brace
  * literals in parameter-less requests pass through untouched. An
  * unbound placeholder refuses loudly (CH errors on missing
  * parameters too). */
object QueryParams {

  private val ParamRe =
    """\{\s*([A-Za-z_][A-Za-z0-9_]*)\s*:\s*([^}]*)\}""".r

  private val stringLike = Set("string", "fixedstring", "date", "date32",
    "datetime", "datetime64", "uuid", "enum8", "enum16", "ipv4", "ipv6")

  def substitute(q: String, params: Map[String, String]): String = {
    if (params.isEmpty || !q.contains('{')) return q
    ParamRe.replaceAllIn(q, m => {
      val name = m.group(1)
      val t = m.group(2).trim
      val v = params.getOrElse(name,
        throw new IllegalArgumentException(
          s"query parameter '$name' ($t) has no bound value"))
      val base = t.takeWhile(_.isLetterOrDigit).toLowerCase
      val lit =
        if (stringLike(base))
          "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"
        else v
      java.util.regex.Matcher.quoteReplacement(lit)
    })
  }
}
