package graft

/** Shared JSON-string helpers for the artifact writers (Bench, Verify,
  * Tables.preflight). One implementation of the escape rules and of
  * "first line of an exception message" — three independently
  * maintained copies had already drifted (one crashed on an
  * empty-string message).
  */
private[graft] object Jsons {
  /** JSON string literal: escapes backslash, quote, and ALL control
    * chars (<0x20) — a tab or CR in builder-authored SQL or an error
    * message would otherwise break the driver's json.load.
    */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** First line of a possibly-null, possibly-empty message, truncated.
    * Total: never throws (an empty string has no lines to `next()`).
    */
  def firstLine(t: Throwable, max: Int = 160): String =
    Option(t.getMessage).getOrElse(t.getClass.getName)
      .linesIterator.nextOption().getOrElse(t.getClass.getName).take(max)

  /** First NON-EMPTY line of an already-captured message — a message
    * starting with a newline yields its first content line, not "".
    */
  def firstLine(msg: String, max: Int): String =
    msg.linesIterator.find(_.nonEmpty).getOrElse("error").take(max)
}
