package graft.config

/** Re-tag configuration (reference config.rs + testdata `*.parquet.zip.yaml`):
  * a YAML mapping from metric-file prefix to fixed labels to attach, plus a
  * `skip-unmapped` switch. The reference's YAML surface is this exact subset,
  * so a ~40-line indentation parser replaces the serde_yaml dependency:
  *
  * {{{
  * config:
  *   skip-unmapped: true
  * mapping:
  *   <prefix>:
  *     tags:
  *       <label>: <value>
  * }}}
  */
object ReTag {
  final case class Config(skipUnmapped: Boolean, mapping: Map[String, Map[String, String]])

  def parse(yaml: String): Config = {
    var skipUnmapped = false
    val mapping = scala.collection.mutable.LinkedHashMap[String, scala.collection.mutable.LinkedHashMap[String, String]]()
    var section: String = ""        // "config" | "mapping"
    var currentPrefix: String = null
    var inTags = false

    for (raw <- yaml.linesIterator if raw.trim.nonEmpty && !raw.trim.startsWith("#")) {
      val indent = raw.takeWhile(_ == ' ').length
      val line = raw.trim
      val (key, value) = line.split(":", 2) match {
        case Array(k, v) => (k.trim, v.trim)
        case Array(k) => (k.trim, "")
      }
      if (indent == 0) {
        section = key; currentPrefix = null; inTags = false
      } else section match {
        case "config" =>
          if (key == "skip-unmapped") skipUnmapped = value == "true"
        case "mapping" =>
          if (indent == 2) {
            currentPrefix = key
            mapping(currentPrefix) = scala.collection.mutable.LinkedHashMap()
            inTags = false
          } else if (indent == 4 && key == "tags") inTags = true
          else if (indent >= 6 && inTags && currentPrefix != null)
            mapping(currentPrefix)(key) = stripQuotes(value)
        case _ => ()
      }
    }
    Config(skipUnmapped, mapping.map { case (k, v) => k -> v.toMap }.toMap)
  }

  private def stripQuotes(s: String): String =
    if (s.length >= 2 && ((s.head == '"' && s.last == '"') || (s.head == '\'' && s.last == '\'')))
      s.substring(1, s.length - 1)
    else s
}
