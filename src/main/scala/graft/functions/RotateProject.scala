package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `rotate_project(vec)`: the coordinates of `vec` in a rotated basis —
  * matrix-vector product against a rotation matrix carried as ONE JVM
  * reference object ([[CentroidExprBase]]'s codebooks-as-data idiom,
  * applied to [[graft.ops.Opq]]'s pre-transform).
  *
  * Why not `array(dot(vec, lit(row₀)), …)`: a d×d rotation unrolls to
  * d² literal nodes (4096 at d=64) — the Janino compile of that tree
  * runs per ACTION and dominated `ann_opq`'s wall clock (10.8 s of an
  * 81 s full bench before this expression; the generated code also
  * brushes the 64 KB method cap where codegen silently degrades to
  * interpreted eval). Here the generated code is a fixed ~20-line
  * nested loop — O(1) in d, matrix shipped once.
  *
  * Options (both resolved at plan time, zero per-row branching in
  * generated code):
  *   - `normalize`: divide every coordinate by ‖vec‖ (the rotation
  *     preserves norms, so this is unit-normalization in the rotated
  *     space; zero vectors pass through unscaled).
  *   - `appendEvery > 0`: insert a constant 1.0f after every
  *     `appendEvery` output coordinates — the augmented layout whose
  *     argmax-dot against −‖c‖²/2-augmented codebooks is exact L2
  *     assignment ([[graft.ops.Opq]]).
  *
  * Output is `array<float>` (the shape [[graft.ops.PqIndex]] trains and
  * scans on). Degenerate input (vector shorter than the matrix width,
  * or a null element) yields NULL — rotation of a partial vector has
  * no meaningful value.
  */
case class RotateProjectExpr(child: Expression, matrix: Array[Array[Double]],
    normalize: Boolean, appendEvery: Int)
    extends CentroidExprBase {
  override def prettyName: String = "rotate_project"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  private def outLen: Int = {
    val r = matrix.length
    if (appendEvery > 0) r + r / appendEvery else r
  }

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val dim = matrix(0).length
    if (v.numElements() < dim) return null
    var i = 0
    while (i < dim) { if (v.isNullAt(i)) return null; i += 1 }
    var nrm = 1.0
    if (normalize) {
      var s = 0.0
      i = 0
      while (i < dim) { val x = elem(v, i); s += x * x; i += 1 }
      val n = Math.sqrt(s)
      if (n > 0) nrm = n
    }
    val out = new Array[Float](outLen)
    var o = 0
    var r = 0
    while (r < matrix.length) {
      val row = matrix(r)
      var s = 0.0
      var j = 0
      while (j < dim) { s += elem(v, j) * row(j); j += 1 }
      out(o) = (s / nrm).toFloat
      o += 1
      r += 1
      if (appendEvery > 0 && r % appendEvery == 0) { out(o) = 1.0f; o += 1 }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("matrix", matrix, "double[][]")
      val dim = ctx.freshName("dim"); val out = ctx.freshName("out")
      val nrm = ctx.freshName("nrm"); val ss = ctx.freshName("ss")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val r = ctx.freshName("r"); val o = ctx.freshName("o")
      val s = ctx.freshName("s"); val x = ctx.freshName("x")
      val bad = ctx.freshName("bad"); val n = ctx.freshName("n")
      val normCode = if (normalize)
        s"""double $ss = 0.0;
           |for (int $i = 0; $i < $dim; $i++) {
           |  double $x = ${accessor(v, i)};
           |  $ss += $x * $x;
           |}
           |double $n = Math.sqrt($ss);
           |if ($n > 0) $nrm = $n;""".stripMargin
      else ""
      val appendCode = if (appendEvery > 0)
        s"if (($r + 1) % $appendEvery == 0) { $out[$o] = 1.0f; $o++; }"
      else ""
      s"""
         |int $dim = $m[0].length;
         |boolean $bad = ($v.numElements() < $dim);
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
         |  for (int $r = 0; $r < $m.length; $r++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $s += ${accessor(v, j)} * $m[$r][$j];
         |    }
         |    $out[$o] = (float) ($s / $nrm);
         |    $o++;
         |    $appendCode
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
