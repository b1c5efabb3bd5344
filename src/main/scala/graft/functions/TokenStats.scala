package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token statistics and language ID as tight per-row loops.
  *
  * The HOF formulations (`filter`/`aggregate`/`transform` lambdas over
  * `split(text, "\\s+")`) are correct but *interpreted* — every token
  * costs a Catalyst eval dispatch, which is the dominant profile of a
  * text-quality pass over 100 TB. These helpers scan the UTF-8 bytes
  * once per row (the [[NGramHash]] pattern) and are called from real
  * `doGenCode` implementations, so the whole text-stats projection stays
  * inside whole-stage codegen.
  *
  * Semantics are pinned to the HOF path they replace (spec-proven in
  * TextAnalysisSpec): tokenization replicates `split(text, "\\s+")`
  * including its leading/trailing empty tokens, token length counts
  * codepoints like Spark's `length()`, stopword matching is exact
  * (case-sensitive), and language scoring lowercases tokens first.
  */
object TokenStats {

  /** Java-regex `\s` byte classes (ASCII-only, safe to scan bytewise in
    * UTF-8: multibyte codepoints never contain ASCII bytes). */
  @inline private def isWs(b: Byte): Boolean = b == 32 || (b >= 9 && b <= 13)

  /** A serializable exact-match token set (UTF8String equality). */
  final class WordSet(words: Array[String]) extends Serializable {
    private val set = new java.util.HashSet[UTF8String](words.length * 2)
    words.foreach(w => set.add(UTF8String.fromString(w)))
    def contains(s: UTF8String): Boolean = set.contains(s)
  }

  /** Per-token visitor replicating `split(text, "\\s+")` boundaries:
    * a leading whitespace run yields a leading empty token, a trailing
    * run a trailing empty token, and the empty string is one empty
    * token. Calls `f(startByte, endByte)` per token.
    */
  @inline private def foreachToken(bytes: Array[Byte])(f: (Int, Int) => Unit): Unit = {
    val len = bytes.length
    var i = 0
    var tokStart = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        f(tokStart, i)
        var j = i + 1
        while (j < len && isWs(bytes(j))) j += 1
        tokStart = j; i = j
      } else i += 1
    }
    f(tokStart, len)
  }

  /** Codepoints in `bytes[s, e)` — UTF-8 continuation bytes don't count,
    * matching Spark's `length()`. */
  @inline private def charCount(bytes: Array[Byte], s: Int, e: Int): Int = {
    var n = 0
    var i = s
    while (i < e) { if ((bytes(i) & 0xc0) != 0x80) n += 1; i += 1 }
    n
  }

  /** (n_tokens, total_token_chars, stopword_hits) in one pass. */
  def compute(text: UTF8String, stops: WordSet): InternalRow = {
    val bytes = text.getBytes
    var nTok = 0
    var totalChars = 0L
    var hits = 0
    foreachToken(bytes) { (s, e) =>
      nTok += 1
      totalChars += charCount(bytes, s, e)
      if (stops.contains(UTF8String.fromBytes(bytes, s, e - s))) hits += 1
    }
    new GenericInternalRow(Array[Any](nTok, totalChars, hits))
  }

  /** Language marker sets, mirroring TextAnalysis.langMarkers (kept in
    * lexicographic lang order — ties pick the LARGEST lang string, the
    * exact `array_max(struct(hits, lang))` semantics of the declarative
    * formulation this replaces). */
  private val langs: Array[String] = Array("de", "en", "es", "fr", "zh")
  private val markerSets: Array[WordSet] = Array(
    new WordSet(Array("der", "die", "das", "und", "ist", "nicht", "mit", "ein")),
    new WordSet(Array("the", "and", "of", "to", "is", "in", "that", "with")),
    new WordSet(Array("el", "la", "los", "las", "es", "y", "que", "de")),
    new WordSet(Array("le", "la", "les", "est", "et", "que", "dans", "une")),
    new WordSet(Array("的", "是", "了", "在", "我", "有", "和", "不")))
  private val und = UTF8String.fromString("und")
  private val langU: Array[UTF8String] = langs.map(UTF8String.fromString)

  /** Argmax-by-(hits, lang) language ID; "und" when no marker matches. */
  def langId(text: UTF8String): UTF8String = {
    val bytes = text.getBytes
    val hits = new Array[Int](langs.length)
    foreachToken(bytes) { (s, e) =>
      if (e > s) {
        val tok = UTF8String.fromBytes(bytes, s, e - s).toLowerCase
        var l = 0
        while (l < markerSets.length) {
          if (markerSets(l).contains(tok)) hits(l) += 1
          l += 1
        }
      }
    }
    var best = 0
    var l = 1
    while (l < hits.length) {
      // >= : equal hits prefer the later (larger) lang code, matching
      // array_max over struct(hits, lang)
      if (hits(l) >= hits(best)) best = l
      l += 1
    }
    if (hits(best) > 0) langU(best) else und
  }

  val statsSchema: StructType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("total_token_chars", LongType, nullable = false),
    StructField("stopword_hits", IntegerType, nullable = false)))
}

/** `token_stats(text)` → struct(n_tokens, total_token_chars,
  * stopword_hits) — one codegen'd byte scan instead of three interpreted
  * HOF passes. */
case class TokenStatsExpr(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {
  override def dataType: DataType = TokenStats.statsSchema
  override def prettyName: String = "token_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  @transient private lazy val stopSet = new TokenStats.WordSet(stopwords.toArray)

  override def nullSafeEval(v: Any): Any =
    TokenStats.compute(v.asInstanceOf[UTF8String], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val stopsRef = ctx.addReferenceObj("stops", stopSet,
      classOf[TokenStats.WordSet].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.compute($c, $stopsRef);")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `md5_hash60(str)` — the first 15 hex digits of md5(str) as a long,
  * computed straight from the digest bytes (big-endian first 8 bytes
  * >>> 4). Value-identical to `conv(substring(md5(s),1,15),16,10)` but
  * without materializing the hex string or parsing it back
  * (spec-asserted in TextAnalysisSpec) — the builtin chain costs ~6×
  * more than the digest itself. This is the engine-portable token hash
  * of the oracle-gated simhash pipeline.
  */
object Md5Hash60 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dig(i) & 0xffL); i += 1 }
    v >>> 4
  }
}

case class Md5Hash60Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_hash60"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    java.lang.Long.valueOf(Md5Hash60.hash(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Hash60.hash($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** `lang_id(text)` — marker-hit argmax language ID as one codegen'd
  * byte scan. */
case class LangIdExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    TokenStats.langId(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenStats.langId($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
