package graft

/** Shared JSON string escaping for the harness mains. Escapes
  * backslash, quote, and ALL control chars (<0x20): Spark 4 exception
  * messages are routinely multi-line, and a raw newline inside a JSON
  * string makes the driver's json.load fail exactly when a failure
  * most needs to be machine-readable.
  */
object JsonOut {
  def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
