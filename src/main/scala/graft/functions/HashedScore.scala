package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Whole-document hashed-linear-model scoring as one scan-side
  * kernel: for each token, the engine-portable 60-bit md5 hash
  * ([[Md5Hash60]]) picks a bucket in the weight table and the
  * bucket's signed integer weight accumulates into a long — exact
  * and summation-order-free. Returns (n_tokens, raw weight sum);
  * score normalization stays in the surrounding projection.
  */
object HashedScore {
  def score(toks: ArrayData, weights: Array[Long]): InternalRow = {
    val dim = weights.length
    val n = toks.numElements()
    var raw = 0L
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        raw += weights((Md5Hash60.hash(toks.getUTF8String(i)) % dim).toInt)
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](n.toLong, raw))
  }
}

/** `hashed_score(tokens)` with the weight table carried as DATA on the
  * expression (same matrix-as-reference-object pattern as
  * [[BestCellExpr]]): the token relation never materializes, so the
  * whole classifier runs inside the scan — zero exchanges. The
  * reference-object weight array rides the serialized plan per stage;
  * beyond ~10⁶ buckets (8 MB) prefer the broadcast-relation
  * formulation ([[graft.ops.TextAnalysis.classifierScore]]), which
  * ships weights once per executor instead.
  */
case class HashedScoreExpr(child: Expression, weights: Array[Long])
    extends UnaryExpression {
  require(weights.nonEmpty, "empty weight table")
  override def prettyName: String = "hashed_score"
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("raw", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    HashedScore.score(v.asInstanceOf[ArrayData], weights)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val w = ctx.addReferenceObj("classifierWeights", weights, "long[]")
      s"${ev.value} = graft.functions.HashedScore.score($c, $w);"
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
