package graft.io

/** The Redshift-format load manifest:
  * `{"entries":[{"url":"...","mandatory":true}]}`
  * (reference RedshiftLoader.ts:302-309). `mandatory:true` per entry is what
  * makes a multi-file load atomic — the COPY fails unless every listed file
  * is present (SURVEY.md §4 "Atomic multi-file visibility").
  */
final case class Manifest(entries: Seq[Manifest.Entry]) {
  def toJson: String = {
    val es = entries
      .map(e => s"""{"url":${Manifest.jsonStr(e.url)},"mandatory":${e.mandatory}}""")
      .mkString(",")
    s"""{"entries":[$es]}"""
  }
}

object Manifest {
  final case class Entry(url: String, mandatory: Boolean = true)

  def of(urls: Seq[String]): Manifest = Manifest(urls.map(Entry(_)))

  private[io] def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  /** Minimal parse for round-trip tests (url + mandatory pairs). */
  def parseUrls(json: String): Seq[String] =
    "\"url\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r
      .findAllMatchIn(json)
      .map(m => m.group(1).replace("\\\\", "\\").replace("\\\"", "\""))
      .toSeq
}
