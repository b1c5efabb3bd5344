package graft.functions

import com.fasterxml.jackson.databind.JsonNode

/** Minimal JSON→YAML renderer for the export sink edge (operator B8,
  * /root/reference/pkg/export/export.go:152-156). The engine's canonical
  * serialization is JSON (`to_json`, codegen'd); YAML is only the
  * surface form written into export archives, so this runs exclusively
  * inside the sink's `foreachPartition` — never in a query plan.
  * Deterministic: field order is preserved from the JSON document.
  */
object Yaml {

  def fromJson(json: String): String = {
    if (json == null) return ""
    val node = JsonFunctions.mapper.readTree(json)
    val sb = new StringBuilder
    render(node, 0, sb, topLevel = true)
    sb.toString
  }

  private def needsQuote(s: String): Boolean =
    s.isEmpty || s.exists(c => ":#{}[],&*?|-<>=!%@\\\"'\n\t".contains(c)) ||
      s.head.isWhitespace || s.last.isWhitespace ||
      Seq("true", "false", "null", "yes", "no", "~").contains(s.toLowerCase) ||
      s.forall(c => c.isDigit || c == '.' || c == '-' || c == '+' || c == 'e' || c == 'E')

  private def scalar(n: JsonNode): String =
    if (n.isTextual) {
      val s = n.asText()
      if (needsQuote(s)) "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n") + "\""
      else s
    } else n.asText() // numbers, booleans, null

  private def render(n: JsonNode, indent: Int, sb: StringBuilder, topLevel: Boolean = false): Unit = {
    val pad = "  " * indent
    if (n.isObject) {
      if (n.isEmpty) { sb.append(pad).append("{}\n"); return }
      val it = n.fields()
      while (it.hasNext) {
        val e = it.next()
        val k = e.getKey
        val v = e.getValue
        if (v.isObject && !v.isEmpty) {
          sb.append(pad).append(k).append(":\n"); render(v, indent + 1, sb)
        } else if (v.isArray && v.size() > 0) {
          sb.append(pad).append(k).append(":\n"); render(v, indent, sb)
        } else if (v.isObject) sb.append(pad).append(k).append(": {}\n")
        else if (v.isArray) sb.append(pad).append(k).append(": []\n")
        else if (v.isNull) sb.append(pad).append(k).append(": null\n")
        else sb.append(pad).append(k).append(": ").append(scalar(v)).append("\n")
      }
    } else if (n.isArray) {
      val it = n.elements()
      while (it.hasNext) {
        val v = it.next()
        if (v.isObject || v.isArray) {
          sb.append(pad).append("-\n"); render(v, indent + 1, sb)
        } else sb.append(pad).append("- ").append(scalar(v)).append("\n")
      }
    } else sb.append(pad).append(scalar(n)).append("\n")
  }
}
