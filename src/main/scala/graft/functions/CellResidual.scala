package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cell_residual(vec, cell)`: the vector minus its assigned coarse
  * centroid — the residual FAISS's IVFPQ product-quantizes instead of
  * the raw vector (Jégou et al. 2011 §IV: within-cell offsets are far
  * more compressible than absolute positions, so the same code budget
  * buys much higher ADC fidelity). The centroid matrix rides as ONE
  * JVM reference object (the [[CentroidExprBase]] codebooks-as-data
  * idiom); generated code is a fixed O(dim) loop.
  *
  * Output `array<float>` (the PQ training/encode shape). NULL for
  * degenerate input: vector shorter than the centroid dimension, a
  * null element, or a cell index outside the matrix.
  */
case class CellResidualExpr(left: Expression, right: Expression,
    centroids: Array[Array[Double]], normalize: Boolean = false,
    appendEvery: Int = 0)
    extends BinaryExpression {

  private def outLen: Int = {
    val d = centroids(0).length
    if (appendEvery > 0) d + d / appendEvery else d
  }
  override def prettyName: String = "cell_residual"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, int), got $other")
  }

  private lazy val leftElemType: DataType = left.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array input, got $other")
  }

  @inline private def elem(arr: ArrayData, i: Int): Double =
    leftElemType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  private def accessor(arr: String, i: String): String =
    leftElemType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val cell = b.asInstanceOf[Int]
    val dim = centroids(0).length
    if (cell < 0 || cell >= centroids.length || v.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    val c = centroids(cell)
    var nrm = 1.0
    if (normalize) {
      var ss = 0.0
      i = 0
      while (i < dim) { val x = elem(v, i); ss += x * x; i += 1 }
      val n = Math.sqrt(ss)
      if (n > 0) nrm = n
    }
    val out = new Array[Float](outLen)
    var o = 0
    i = 0
    while (i < dim) {
      out(o) = (elem(v, i) / nrm - c(i)).toFloat
      o += 1
      if (appendEvery > 0 && (i + 1) % appendEvery == 0) { out(o) = 1.0f; o += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, cell) => {
      val m = ctx.addReferenceObj("centroids", centroids, "double[][]")
      val dim = ctx.freshName("dim"); val out = ctx.freshName("out")
      val i = ctx.freshName("i"); val bad = ctx.freshName("bad")
      val o = ctx.freshName("o")
      val nrm = ctx.freshName("nrm"); val ss = ctx.freshName("ss")
      val nn = ctx.freshName("nn"); val x = ctx.freshName("x")
      val normCode = if (normalize)
        s"""double $ss = 0.0;
           |for (int $i = 0; $i < $dim; $i++) {
           |  double $x = ${accessor(v, i)};
           |  $ss += $x * $x;
           |}
           |double $nn = Math.sqrt($ss);
           |if ($nn > 0) $nrm = $nn;""".stripMargin
      else ""
      val appendCode = if (appendEvery > 0)
        s"if (($i + 1) % $appendEvery == 0) { $out[$o] = 1.0f; $o++; }"
      else ""
      s"""
         |int $dim = $m[0].length;
         |boolean $bad = ($cell < 0 || $cell >= $m.length || $v.numElements() < $dim);
         |for (int $i = 0; !$bad && $i < $dim; $i++) {
         |  if ($v.isNullAt($i)) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $nrm = 1.0;
         |  $normCode
         |  float[] $out = new float[$outLen];
         |  int $o = 0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $out[$o] = (float) (${accessor(v, i)} / $nrm - $m[$cell][$i]);
         |    $o++;
         |    $appendCode
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
