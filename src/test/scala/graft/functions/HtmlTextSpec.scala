package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

/** Crafted-case pins for the committed [[HtmlText]] semantics: nested
  * and inline tags, raw-text containers, comments, entities, quoted
  * attributes, and malformed markup (best-effort, never-throw). The
  * fixture manifest pins real pages end-to-end (`text_html_extract`);
  * this spec pins the EDGES the generator's well-formed pages cannot
  * exercise. */
class HtmlTextSpec extends SparkSpec {

  private def x(html: String): String = {
    val r = HtmlText.extract(UTF8String.fromString(html))
    if (r == null) null else r.toString
  }

  test("blocks break lines; inline tags vanish without separating words") {
    assert(x("<div>Hello <b>world</b>!</div><p>Next</p>") == "Hello world!\nNext")
    assert(x("foo<span>bar</span>") == "foobar")
    assert(x("<ul><li>a</li><li>b</li></ul>") == "a\nb")
  }

  test("script/style/noscript strip WITH content, even decoy tags inside") {
    assert(x("<p>a</p><script>var x = '<p>not text</p>';</script><p>b</p>") == "a\nb")
    assert(x("<style>p { color: red }</style><p>c</p>") == "c")
    // case-insensitive close; self-closed form has no content to skip
    assert(x("<SCRIPT>x</ScRiPt><p>d</p>") == "d")
    assert(x("<script/><p>e</p>") == "e")
    // unterminated raw-text container consumes to EOF — never throws
    assert(x("<p>kept</p><script>var x = 1;") == "kept")
  }

  test("comments vanish including tags inside; unterminated comment to EOF") {
    assert(x("a<!-- <p>hidden</p> -->b") == "ab")
    assert(x("a<!-- never closed") == "a")
  }

  test("entities: named, numeric, hex; unknown and malformed stay literal") {
    assert(x("Fish &amp; chips &lt;now&gt; &#65;&#x42;") == "Fish & chips <now> AB")
    assert(x("&quot;q&quot; &apos;a&apos;") == "\"q\" 'a'")
    assert(x("a&nbsp;&nbsp;b") == "a b")
    assert(x("&unknown; &#; &; &#xZZ; &#xD800; & alone") ==
      "&unknown; &#; &; &#xZZ; &#xD800; & alone")
    // Integer.parseInt would take a signed form — HTML keeps it literal
    assert(x("&#+65; &#x+41; &#-1;") == "&#+65; &#x+41; &#-1;")
  }

  test("'<' followed by a non-ASCII letter is literal text, not a tag") {
    assert(x("<p>x<у всегда</p>") == "x<у всегда")
    assert(x("a<é b") == "a<é b")
  }

  test("quoted attributes may contain '>'; literal '<' survives; malformed is best-effort") {
    assert(x("""<a title="a>b">link</a>""") == "link")
    assert(x("<a title='a>b'>link2</a>") == "link2")
    assert(x("5 < 6 and <em>unclosed") == "5 < 6 and unclosed")
    // unterminated tag consumes to EOF
    assert(x("text <div unfinished") == "text")
    assert(x("") == "")
    assert(x(null) == null)
  }

  test("whitespace: trim, collapse, drop empty lines, no trailing newline") {
    assert(x("<p>  a   b  </p>\n\n\n<p>\t c </p>") == "a b\nc")
    assert(x("<br><br><br>") == "")
  }

  test("expression is codegen'd and NULL-safe over a DataFrame") {
    val spark2 = spark
    import spark2.implicits._
    val df = Seq(Some("<p>row one.</p>"), None)
      .toDF("html")
      .select(graft.functions.functions.html_text(col("html")).as("t"))
    assert(df.collect().map(r => Option(r.getString(0))).toSet ==
      Set(Some("row one."), None))
  }
}
