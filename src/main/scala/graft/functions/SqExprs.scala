package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Codegen'd scalar-quantization (SQ8) kernels — the third quantizer
  * family next to the coarse IVF centroids and the PQ codebooks: each
  * dimension is affinely mapped to an 8-bit code against per-dimension
  * [lo, hi] training bounds (FAISS `ScalarQuantizer` QT_8bit; Jégou et
  * al.'s uniform-quantizer baseline). 4× fewer scan bytes than float32
  * at far higher fidelity than PQ's m-subspace codes — the right index
  * for the "cheap exactness" middle of the recall/bytes trade.
  *
  * The training bounds ride into codegen as JVM reference objects (the
  * [[RotateProjectExpr]] codebooks-as-data idiom): d-length arrays
  * shipped once per plan, never unrolled into literal expression trees.
  *
  * Cross-engine determinism (the `ann_sq8` oracle replays everything):
  * the code is `clamp(floor((x − lo) · 255 / (hi − lo)), 0, 255)` with
  * left-associated IEEE double arithmetic on identical operands — both
  * engines produce the identical integer, so code-domain distances are
  * exact longs, no rounding anywhere in the query's output.
  */
private[functions] object SqExprs {
  /** One dimension's code. Constant dimensions (hi ≤ lo) carry no
    * information → code 0 (and decode back to lo). */
  @inline def codeOf(x: Double, lo: Double, hi: Double): Int =
    if (hi <= lo) 0
    else {
      val t = Math.floor((x - lo) * 255.0 / (hi - lo))
      if (t < 0.0) 0 else if (t > 255.0) 255 else t.toInt
    }

  /** Midpoint reconstruction of one code (FAISS QT_8bit decode). */
  @inline def decodeOf(code: Int, lo: Double, hi: Double): Double =
    if (hi <= lo) lo else lo + (code + 0.5) * (hi - lo) / 255.0
}

/** `sq_encode(vec)` → `array<int>` of 8-bit codes against the trained
  * per-dimension bounds. A vector whose length differs from the trained
  * dimensionality, or with a null element, yields NULL (no meaningful
  * encoding exists). */
case class SqEncodeExpr(child: Expression, lo: Array[Double], hi: Array[Double])
    extends CentroidExprBase {
  require(lo.length == hi.length, "lo/hi bound arrays must be same length")
  override def prettyName: String = "sq_encode"
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val d = lo.length
    if (v.numElements() != d) return null
    var i = 0
    while (i < d) { if (v.isNullAt(i)) return null; i += 1 }
    val out = new Array[Int](d)
    i = 0
    while (i < d) {
      out(i) = SqExprs.codeOf(elem(v, i), lo(i), hi(i))
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
      val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val bad = ctx.freshName("bad"); val out = ctx.freshName("out")
      val t = ctx.freshName("t"); val l = ctx.freshName("l"); val h = ctx.freshName("h")
      s"""
         |int $d = $loRef.length;
         |boolean $bad = ($v.numElements() != $d);
         |for (int $i = 0; !$bad && $i < $d; $i++) {
         |  if ($v.isNullAt($i)) $bad = true;
         |}
         |if ($bad) {
         |  ${ev.isNull} = true;
         |} else {
         |  int[] $out = new int[$d];
         |  for (int $i = 0; $i < $d; $i++) {
         |    double $l = $loRef[$i]; double $h = $hiRef[$i];
         |    if ($h > $l) {
         |      double $t = Math.floor((${accessor(v, i)} - $l) * 255.0 / ($h - $l));
         |      $out[$i] = $t < 0.0 ? 0 : ($t > 255.0 ? 255 : (int) $t);
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `int_sq_dist(a, b)` = Σ (aᵢ − bᵢ)² over two `array<int>` code vectors,
  * accumulated in long — EXACT integer arithmetic, the symmetric
  * code-domain distance (both sides quantized). Null array, length
  * mismatch, or null element → NULL (the [[VectorBinaryExpr]] HOF
  * semantics). */
case class IntSqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def prettyName: String = "int_sq_dist"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<int> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = (x.getInt(i) - y.getInt(i)).toLong
      acc += d * d
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; } else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    long $d = (long) ($a.getInt($i) - $b.getInt($i));
         |    $acc += $d * $d;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `sq_dot(qvec, codes)` = Σ qᵢ · decode(codeᵢ) — the dot-product form
  * of the asymmetric estimator, the term an IVF-SQ probe adds to its
  * exact q·centroid component ([[graft.ops.IvfSq]], mirroring the
  * residual-PQ score decomposition). Left child is the float/double
  * query vector, right child the `array<int>` codes. */
case class SqDotExpr(left: Expression, right: Expression,
    lo: Array[Double], hi: Array[Double])
    extends BinaryExpression {
  require(lo.length == hi.length, "lo/hi bound arrays must be same length")
  override def prettyName: String = "sq_dot"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val qType: DataType = left.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array<float|double> query, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<int>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline private def qElem(arr: ArrayData, i: Int): Double = qType match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (q, c) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val d = lo.length
    if (q.numElements() != d || c.numElements() != d) return null
    var acc = 0.0
    var i = 0
    while (i < d) {
      if (q.isNullAt(i) || c.isNullAt(i)) return null
      acc += qElem(q, i) * SqExprs.decodeOf(c.getInt(i), lo(i), hi(i))
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
      val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val l = ctx.freshName("l"); val h = ctx.freshName("h")
      val rec = ctx.freshName("rec")
      val qAcc = qType match {
        case FloatType => s"(double) $q.getFloat($i)"
        case _ => s"$q.getDouble($i)"
      }
      s"""
         |int $d = $loRef.length;
         |if ($q.numElements() != $d || $c.numElements() != $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($q.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $l = $loRef[$i]; double $h = $hiRef[$i];
         |    double $rec = $h > $l ? $l + ($c.getInt($i) + 0.5) * ($h - $l) / 255.0 : $l;
         |    $acc += $qAcc * $rec;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `sq_adc(qvec, codes)` = Σ (qᵢ − decode(codeᵢ))² — the ASYMMETRIC
  * distance (query kept full-precision, corpus decoded from its codes at
  * the bin midpoint). The production estimator: one quantization error
  * per pair instead of two, measurably tighter recall than the symmetric
  * form at the same scan bytes (SqSpec pins the ordering). Left child is
  * the float/double query vector, right child the `array<int>` codes. */
case class SqAdcExpr(left: Expression, right: Expression,
    lo: Array[Double], hi: Array[Double])
    extends BinaryExpression {
  require(lo.length == hi.length, "lo/hi bound arrays must be same length")
  override def prettyName: String = "sq_adc"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val qType: DataType = left.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array<float|double> query, got $other")
  }

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float|double>, array<int>), got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  @inline private def qElem(arr: ArrayData, i: Int): Double = qType match {
    case FloatType => arr.getFloat(i).toDouble
    case _ => arr.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (q, c) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val d = lo.length
    if (q.numElements() != d || c.numElements() != d) return null
    var acc = 0.0
    var i = 0
    while (i < d) {
      if (q.isNullAt(i) || c.isNullAt(i)) return null
      val diff = qElem(q, i) - SqExprs.decodeOf(c.getInt(i), lo(i), hi(i))
      acc += diff * diff
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (q, c) => {
      val loRef = ctx.addReferenceObj("sqLo", lo, "double[]")
      val hiRef = ctx.addReferenceObj("sqHi", hi, "double[]")
      val d = ctx.freshName("d"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val diff = ctx.freshName("diff")
      val l = ctx.freshName("l"); val h = ctx.freshName("h")
      val rec = ctx.freshName("rec")
      val qAcc = qType match {
        case FloatType => s"(double) $q.getFloat($i)"
        case _ => s"$q.getDouble($i)"
      }
      s"""
         |int $d = $loRef.length;
         |if ($q.numElements() != $d || $c.numElements() != $d) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $d; $i++) {
         |    if ($q.isNullAt($i) || $c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $l = $loRef[$i]; double $h = $hiRef[$i];
         |    double $rec = $h > $l ? $l + ($c.getInt($i) + 0.5) * ($h - $l) / 255.0 : $l;
         |    double $diff = $qAcc - $rec;
         |    $acc += $diff * $diff;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
