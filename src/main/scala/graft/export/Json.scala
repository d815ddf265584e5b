package graft.export

/** Minimal deterministic JSON writer (no external deps; field order
  * preserved for stable diffs of exported configs).
  */
sealed trait Json { def render: String }
object Json {
  final case class JStr(v: String) extends Json {
    def render: String = "\"" + v.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  }
  final case class JNum(v: Long) extends Json { def render: String = v.toString }
  final case class JDouble(v: Double) extends Json { def render: String = v.toString }
  final case class JBool(v: Boolean) extends Json { def render: String = v.toString }
  case object JNull extends Json { def render: String = "null" }
  final case class JArr(items: Seq[Json]) extends Json {
    def render: String = items.map(_.render).mkString("[", ",", "]")
  }
  final case class JObj(fields: Seq[(String, Json)]) extends Json {
    def render: String =
      fields.map { case (k, v) => JStr(k).render + ":" + v.render }.mkString("{", ",", "}")
  }

  def str(s: String): Json = JStr(s)
  def opt(s: Option[String]): Json = s.map(JStr).getOrElse(JNull)
}
