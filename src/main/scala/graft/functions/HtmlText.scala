package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → clean text extraction: the text family's FRONT END — every
  * real web corpus starts at raw HTML, and until this expression the
  * pipeline started at already-clean `documents.text` (the reference's
  * own mission framing is "extract … transform and filter",
  * README.md:3). Public C4 / trafilatura-style rules, no external
  * parser library — one deterministic forward byte walk in plain JVM
  * bytecode (the [[RepetitionStatsExpr]] scan discipline), so the call
  * stays inside whole-stage codegen and costs O(|html|) per row with
  * zero allocation beyond the output builder.
  *
  * The committed semantics (what [[graft.tools.GenHtmlFixtures]] pins
  * per fixture and HtmlTextSpec pins per crafted case):
  *
  *   - `<!-- … -->` comments vanish (including any tags inside them);
  *     an unterminated comment consumes to EOF.
  *   - `<script>`, `<style>`, `<noscript>`, `<template>` elements
  *     vanish WITH their content (raw-text scan to the matching
  *     case-insensitive `</name`; unterminated → EOF). A self-closed
  *     form (`<script/>`) has no content to skip.
  *   - Other tags are stripped. Tag scanning honors single/double
  *     quoted attribute values — `<a title="a>b">` is ONE tag. A `<`
  *     not followed by a letter, `/`, `!` or `?` is literal text
  *     (`5 < 6` survives). An unterminated tag consumes to EOF.
  *   - BLOCK-level tags (open or close: p div br hr li ul ol dl dt dd
  *     h1–h6 tr td th table thead tbody section article header footer
  *     nav aside blockquote pre form figure figcaption title body
  *     head html) emit a line break; inline tags (a span b i em strong
  *     code img …) emit nothing, so `foo<b>bar</b>` stays `foobar`.
  *   - Entities decode: the five XML names + `&nbsp;` (to a plain
  *     space) and numeric `&#NNN;` / `&#xHH;` code points; anything
  *     unrecognized stays literal text.
  *   - Whitespace normalization: each line is trimmed, internal
  *     whitespace runs (space, tab, CR, FF, NBSP) collapse to one
  *     space, and empty lines drop — the output is `\n`-joined
  *     non-empty lines.
  *
  * Never throws: any input produces a best-effort string (malformed
  * markup is DATA at crawl scale — a parse error must be a filterable
  * row, not a dead executor). NULL in → NULL out.
  */
object HtmlText {

  private val blockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "br", "hr", "li", "ul", "ol", "dl", "dt", "dd",
      "h1", "h2", "h3", "h4", "h5", "h6", "tr", "td", "th", "table",
      "thead", "tbody", "section", "article", "header", "footer", "nav",
      "aside", "blockquote", "pre", "form", "figure", "figcaption",
      "title", "body", "head", "html").foreach(s.add)
    s
  }

  private val rawTextTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("script", "style", "noscript", "template").foreach(s.add)
    s
  }

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\r' || c == '\f' || c == '\u00A0'

  /** Decode one entity starting at `i` (s(i) == '&'). Appends the
    * decoded text (or the literal '&' on no match) and returns the next
    * index. */
  private def entity(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    val semi = {
      var j = i + 1
      val lim = math.min(n, i + 12) // longest accepted form: &#x10FFFF;
      while (j < lim && s.charAt(j) != ';') j += 1
      if (j < lim && j < n && s.charAt(j) == ';') j else -1
    }
    if (semi < 0 || semi == i + 1) { out.append('&'); return i + 1 }
    val body = s.substring(i + 1, semi)
    val decoded: String = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case _ if body.length > 1 && body.charAt(0) == '#' =>
        val hex = body.length > 2 && (body.charAt(1) == 'x' || body.charAt(1) == 'X')
        val digits = if (hex) body.substring(2) else body.substring(1)
        // digits only — Integer.parseInt would also accept a leading
        // sign, but HTML keeps '&#+65;' literal
        val wellFormed = digits.nonEmpty && digits.forall(c =>
          (c >= '0' && c <= '9') ||
            (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))))
        val cp =
          try {
            if (!wellFormed) -1
            else java.lang.Integer.parseInt(digits, if (hex) 16 else 10)
          } catch { case _: NumberFormatException => -1 }
        if (cp >= 1 && cp <= 0x10ffff &&
          !(cp >= 0xd800 && cp <= 0xdfff)) new String(Character.toChars(cp))
        else null
      case _ => null
    }
    if (decoded == null) { out.append('&'); i + 1 }
    else { out.append(decoded); semi + 1 }
  }

  /** Scan a tag starting at `i` (s(i) == '<', s(i+1) is letter, '/',
    * '!' or '?'). Appends a '\n' for block tags, skips raw-text
    * content, and returns the next index. */
  private def tag(s: String, i: Int, out: java.lang.StringBuilder): Int = {
    val n = s.length
    // tag name: optional '/', then letters/digits
    var j = i + 1
    val closing = j < n && s.charAt(j) == '/'
    if (closing) j += 1
    val nameStart = j
    while (j < n && (Character.isLetterOrDigit(s.charAt(j)))) j += 1
    val name = s.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
    // scan to the closing '>', honoring quoted attribute values
    var quote: Char = 0
    var selfClosed = false
    var k = j
    var end = -1
    while (k < n && end < 0) {
      val c = s.charAt(k)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') { end = k; selfClosed = k > i + 1 && s.charAt(k - 1) == '/' }
      k += 1
    }
    val next = if (end < 0) n else end + 1
    if (blockTags.contains(name)) out.append('\n')
    if (!closing && !selfClosed && rawTextTags.contains(name)) {
      // raw-text element: content vanishes up to the matching </name
      val target = "</" + name
      var m = next
      var found = -1
      while (m + target.length <= n && found < 0) {
        if (s.regionMatches(true, m, target, 0, target.length)) found = m
        else m += 1
      }
      if (found < 0) return n
      // consume the close tag itself (to its '>')
      var e = found + target.length
      while (e < n && s.charAt(e) != '>') e += 1
      if (blockTags.contains(name)) out.append('\n')
      return if (e < n) e + 1 else n
    }
    next
  }

  /** Called from both interpreted eval and generated Java. */
  def extract(html: UTF8String): UTF8String = {
    if (html == null) return null
    val s = html.toString
    val n = s.length
    val raw = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(false, i, "<!--", 0, 4)) {
          val close = s.indexOf("-->", i + 4)
          i = if (close < 0) n else close + 3
        } else if (i + 1 < n && {
          // HTML opens tags on ASCII letters only — '<у' in multilingual
          // text is literal content a browser keeps, not a tag
          val d = s.charAt(i + 1)
          (d >= 'a' && d <= 'z') || (d >= 'A' && d <= 'Z') ||
            d == '/' || d == '!' || d == '?'
        }) {
          i = tag(s, i, raw)
        } else { raw.append(c); i += 1 }
      } else if (c == '&') {
        i = entity(s, i, raw)
      } else { raw.append(c); i += 1 }
    }
    // whitespace normalization: trim + collapse per line, drop empties
    val outSb = new java.lang.StringBuilder(raw.length)
    var lineHasText = false
    var pendingSpace = false
    var k = 0
    val m = raw.length
    while (k < m) {
      val c = raw.charAt(k)
      if (c == '\n') {
        if (lineHasText) { lineHasText = false; pendingSpace = false; outSb.append('\n') }
      } else if (isWs(c)) {
        if (lineHasText) pendingSpace = true
      } else {
        if (pendingSpace) { outSb.append(' '); pendingSpace = false }
        outSb.append(c)
        lineHasText = true
      }
      k += 1
    }
    // trailing newline (from a final block close) is structural noise
    var len = outSb.length
    while (len > 0 && outSb.charAt(len - 1) == '\n') len -= 1
    UTF8String.fromString(outSb.substring(0, len))
  }
}

/** `html_text(html)` — C4-style HTML → clean text extraction. One
  * static call per row inside whole-stage codegen ([[ImageMetaExpr]]
  * stance): the expression is the pipeline's one markup-interpreting
  * touch-point, everything downstream sees clean `\n`-joined lines. */
case class HtmlTextExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "html_text"
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    HtmlText.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.HtmlText.extract($c);"
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
