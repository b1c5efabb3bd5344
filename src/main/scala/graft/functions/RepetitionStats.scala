package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Per-document gram-repetition statistics as one tight per-row pass —
  * the Gopher/C4 repetition signals (`top_bigram_frac`,
  * `dup_trigram_frac`) need NO cross-document state, so the right
  * 100 TB shape is a shuffle-free projection, not an
  * explode → groupBy → rollup (which materializes ~L gram rows per
  * document and shuffles them twice; measured 5.1 s vs 0.3 s at sf0.1).
  *
  * Tokenization replicates `split(text, "\\s+")` (the [[NGramHash]] /
  * [[TokenStats]] contract). Each token is xxhash64'd in place over the
  * document's bytes (no copies), gram identities are order-sensitive
  * mixes of the token hashes, and run/distinct counting is sort-based
  * over the per-document gram arrays — O(L log L) on tiny L, zero
  * allocation beyond three long arrays per row. Hash identity equals
  * string identity modulo 64-bit collisions WITHIN one document
  * (~L²/2⁶⁴ — vanishing), which is why the DuckDB oracle's
  * string-equality counting hash-matches.
  */
object RepetitionStats {
  private val Seed = 42L
  private val Mix = 0x9e3779b97f4a7c15L

  @inline private def isWs(b: Byte): Boolean = b == 32 || (b >= 9 && b <= 13)

  /** (top_bigram_count, n_bigrams, n_trigrams, distinct_trigrams) as
    * longs; zeros for documents too short to have the gram. */
  def compute(text: UTF8String): InternalRow = {
    val bytes = text.getBytes
    val len = bytes.length
    var starts = new Array[Int](math.min(64, len / 2 + 2).max(8))
    var ends = new Array[Int](starts.length)
    var nTok = 0
    @inline def addTok(s: Int, e: Int): Unit = {
      if (nTok == starts.length) {
        starts = java.util.Arrays.copyOf(starts, nTok * 2)
        ends = java.util.Arrays.copyOf(ends, nTok * 2)
      }
      starts(nTok) = s; ends(nTok) = e; nTok += 1
    }
    var i = 0
    var tokStart = 0
    while (i < len) {
      if (isWs(bytes(i))) {
        addTok(tokStart, i)
        var j = i + 1
        while (j < len && isWs(bytes(j))) j += 1
        tokStart = j; i = j
      } else i += 1
    }
    addTok(tokStart, len)

    if (nTok < 2)
      return new GenericInternalRow(Array[Any](0L, 0L, 0L, 0L))

    val th = new Array[Long](nTok)
    i = 0
    while (i < nTok) {
      th(i) = XXH64.hashUnsafeBytes(bytes,
        Platform.BYTE_ARRAY_OFFSET + starts(i), ends(i) - starts(i), Seed)
      i += 1
    }

    // bigrams: longest equal run after sort = the top gram's count
    val nBi = nTok - 1
    val bi = new Array[Long](nBi)
    i = 0
    while (i < nBi) { bi(i) = th(i) * Mix + th(i + 1); i += 1 }
    java.util.Arrays.sort(bi)
    var top2 = 1L
    var run = 1L
    i = 1
    while (i < nBi) {
      if (bi(i) == bi(i - 1)) { run += 1; if (run > top2) top2 = run }
      else run = 1
      i += 1
    }

    var tot3 = 0L
    var dist3 = 0L
    if (nTok >= 3) {
      val nTri = nTok - 2
      val tri = new Array[Long](nTri)
      i = 0
      while (i < nTri) { tri(i) = (th(i) * Mix + th(i + 1)) * Mix + th(i + 2); i += 1 }
      java.util.Arrays.sort(tri)
      tot3 = nTri
      dist3 = 1
      i = 1
      while (i < nTri) { if (tri(i) != tri(i - 1)) dist3 += 1; i += 1 }
    }
    new GenericInternalRow(Array[Any](top2, nBi.toLong, tot3, dist3))
  }
}

/** `repetition_stats(text)` — struct(top_bigrams, n_bigrams,
  * n_trigrams, distinct_trigrams). Real `doGenCode` (a single static
  * call), so the repetition projection stays inside whole-stage
  * codegen next to [[TokenStatsExpr]].
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("top_bigrams", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("distinct_trigrams", LongType, nullable = false)))
  override def prettyName: String = "repetition_stats"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    RepetitionStats.compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.RepetitionStats.compute($c);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
