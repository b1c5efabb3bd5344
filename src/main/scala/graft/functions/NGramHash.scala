package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingle hashing as one tight per-row loop.
  *
  * The MinHash/LSH near-dup pipeline never needs the shingle *strings* —
  * only `xxhash64(shingle)` (signature stage) and shingle identity
  * (verification stage). Materializing the strings via higher-order
  * `transform` lambdas is interpreted and was 93% of the round-1 bench;
  * this computes the distinct shingle hashes directly, byte-identical to
  * `xxhash64(concat_ws(" ", tok_i..tok_{i+n-1}))` of the string path
  * (seed 42, same whitespace tokenization as `split(text, "\\s+")`),
  * so downstream signatures are exactly unchanged.
  *
  * 100 TB shape: the exploded relation carries (id, long) instead of
  * (id, string) — the dedup shuffle is fixed-width 8-byte keys no matter
  * how long documents are.
  */
object NGramHash {
  private val Seed = 42L

  /** Java-regex `\s` byte classes (all ASCII, so byte scanning is safe
    * in UTF-8: multibyte codepoints never contain ASCII bytes). */
  @inline private def isWs(b: Byte): Boolean =
    b == 32 || (b >= 9 && b <= 13)

  /** Distinct (sorted) xxhash64 values of the word `n`-gram shingles of
    * `text`. Tokenization replicates Spark's `split(text, "\\s+")` with
    * its default limit -1: a leading whitespace run yields a leading
    * empty token and a trailing run a trailing empty token. Documents
    * with fewer than `n` tokens hash the whole raw text as their single
    * shingle (so exact copies of short docs still collide), matching the
    * string path's `otherwise(array(text))` branch.
    */
  def ngramHashes(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    // Token boundaries (byte offsets); grown by addTok when a document
    // has more tokens (pre-sizing to the worst case of len/2 wasted
    // ~4 bytes of garbage per text byte per row).
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

    if (nTok < n) {
      // whole raw text is the single shingle
      return UnsafeArrayData.fromPrimitiveArray(Array(XXH64.hashUTF8String(text, Seed)))
    }
    val nGrams = nTok - n + 1
    val hashes = new Array[Long](nGrams)
    // Reusable scratch for the single-space-joined gram bytes.
    var scratch = new Array[Byte](64)
    var g = 0
    while (g < nGrams) {
      var gramLen = n - 1 // n-1 separator spaces
      var t = g
      while (t < g + n) { gramLen += ends(t) - starts(t); t += 1 }
      if (gramLen > scratch.length)
        scratch = new Array[Byte](Integer.highestOneBit(gramLen) * 2)
      var pos = 0
      t = g
      while (t < g + n) {
        if (t > g) { scratch(pos) = ' '; pos += 1 }
        val tl = ends(t) - starts(t)
        System.arraycopy(bytes, starts(t), scratch, pos, tl)
        pos += tl
        t += 1
      }
      hashes(g) = XXH64.hashUnsafeBytes(scratch, Platform.BYTE_ARRAY_OFFSET, gramLen, Seed)
      g += 1
    }
    // distinct via sort + unique (order is irrelevant downstream: the
    // array is exploded into an aggregation or a join key)
    java.util.Arrays.sort(hashes)
    var uniq = 1
    i = 1
    while (i < nGrams) {
      if (hashes(i) != hashes(i - 1)) { hashes(uniq) = hashes(i); uniq += 1 }
      i += 1
    }
    // UnsafeArrayData keeps the longs primitive — GenericArrayData's
    // Array[Long] constructor would box every hash into Object[].
    UnsafeArrayData.fromPrimitiveArray(
      if (uniq == nGrams) hashes else java.util.Arrays.copyOf(hashes, uniq))
  }
}

/** `ngram_hashes(text, n)` — array of distinct 64-bit shingle hashes.
  * Real `doGenCode`: the generated code is a single static call, so the
  * expression stays inside whole-stage codegen with no interpreted
  * lambda or per-element Catalyst dispatch.
  */
case class NGramHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram size must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    NGramHash.ngramHashes(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NGramHash.ngramHashes($c, $n);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
