package graft.util

/** Minimal JSON string escaping, shared by every hand-built JSON emitter in
  * the repo (HTTP request bodies, Verify's oracle_sql.json dump). Escapes
  * quote, backslash, and ALL control characters below 0x20. */
object Json {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
