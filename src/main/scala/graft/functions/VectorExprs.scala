package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd vector math over embedding columns (`array<float>` /
  * `array<double>`).
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express the
  * same math declaratively but their lambdas are *interpreted* — each
  * element costs a Catalyst eval dispatch (~0.5 ms per 64-dim cosine,
  * the round-1 ANN hot-path cost). These expressions emit a plain fused
  * Java loop via `doGenCode`, so a cosine is ~64 multiply-adds inside
  * whole-stage codegen. They are the inner loop of every similarity
  * operator (brute-force / LSH / IVF ANN, embedding near-dup).
  *
  * Null semantics mirror the HOF formulation they replace: a null array,
  * a length mismatch (zip_with pads with null), or any null element
  * yields null.
  */
private[functions] trait VectorBinaryExpr extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  /** Fail mis-typed inputs at analysis time (an AnalysisException) rather
    * than letting `elemType` blow up later inside eval/codegen.
    */
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  protected def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array<float|double> inputs, got $other")
  }

  @inline protected final def elem(arr: ArrayData, t: DataType, i: Int): Double =
    t match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** Java accessor snippet for one element of `arr` at index `i`. */
  protected final def accessor(arr: String, t: DataType, i: String): String =
    t match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
}

/** `dot_product(a, b)` = Σ aᵢ·bᵢ in double precision. */
case class DotProductExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "dot_product"
  private lazy val (lt, rt) = (elemType(left), elemType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += elem(x, lt, i) * elem(y, rt, i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (n, i, acc) = (ctx.freshName("n"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += ${accessor(a, lt, i)} * ${accessor(b, rt, i)};
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `cosine_sim(a, b)` = a·b / (‖a‖·‖b‖), one fused pass (3 accumulators)
  * instead of three separate array traversals. A zero-norm input yields
  * NULL (matching Spark's legacy `Divide`-by-zero semantics): NaN would
  * sort *above* every real score, silently ranking a zero embedding #1
  * in every top-k and passing every `>= threshold` filter.
  */
case class CosineSimExpr(left: Expression, right: Expression) extends VectorBinaryExpr {
  override def prettyName: String = "cosine_sim"
  private lazy val (lt, rt) = (elemType(left), elemType(right))

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = elem(x, lt, i); val yb = elem(y, rt, i)
      dot += xa * yb; na += xa * xa; nb += yb * yb
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val xa = ctx.freshName("xa"); val yb = ctx.freshName("yb")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $xa = ${accessor(a, lt, i)};
         |    double $yb = ${accessor(b, rt, i)};
         |    $dot += $xa * $yb; $na += $xa * $xa; $nb += $yb * $yb;
         |  }
         |  if ($na == 0.0 || $nb == 0.0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb)); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
