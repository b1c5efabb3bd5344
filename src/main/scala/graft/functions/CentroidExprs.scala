package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Centroid-matrix scoring expressions: the quantizer halves of the IVF
  * and PQ ANN indexes ([[graft.ops.IvfIndex]], [[graft.ops.PqIndex]]),
  * with the centroid matrix carried as ONE JVM reference object instead
  * of `k` unrolled literal subtrees.
  *
  * Why this exists (round-10 directive #3): the previous formulation
  * built `array(struct(dot(vec, lit(c₀)), 0), …, struct(dot(vec,
  * lit(c_{k−1})), k−1))` — an expression tree LINEAR in k. At the test
  * k=8 that is harmless; a production coarse quantizer wants k ≈
  * 10⁴–10⁵ cells, where k unrolled literals blow past the JVM's 64 KB
  * method cap (whole-stage codegen silently degrades to interpreted
  * eval) and serialize the matrix into every task binary once per
  * SUBTREE OCCURRENCE. Here the matrix is a single `double[][]`
  * reference (`ctx.addReferenceObj`) and the generated code is a fixed
  * ~30-line nested loop — code size O(1) in k, matrix shipped once, and
  * the argmax stays inside whole-stage codegen at any k
  * (CentroidExprsSpec pins k=256 with `WholeStageCodegen` present).
  * Beyond k ≈ 10⁴ (matrix >~10 MB) the right form changes again — a
  * broadcast centroid RELATION scored by a join, so the matrix rides
  * the broadcast bus instead of the serialized plan; that form is
  * [[graft.ops.QuantizerRelation]], selected automatically by
  * [[graft.ops.IvfIndex.assignCells]] above its cell cutover, and
  * FAISS draws the same line (coarse quantizer as data, not code).
  *
  * Selection semantics are those of the `array_max`/`array_sort` struct
  * formulation they replace: lexicographic max over `(score, index)` —
  * ties prefer the LARGER index. Degenerate vectors (a null element, or
  * too short for the matrix dimension) scored all-null under the old
  * expressions and therefore tied every centroid, selecting the
  * highest indices; the loop forms reproduce exactly that (`k−1` /
  * the last `nProbe` indices) so write-time cell layouts are stable
  * across the refactor.
  */
private[functions] trait CentroidExprBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${other.simpleString}")
  }

  protected lazy val childElemType: DataType = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => t
    case other => throw new IllegalArgumentException(
      s"$prettyName requires array<float|double> input, got $other")
  }

  @inline protected final def elem(arr: ArrayData, i: Int): Double =
    childElemType match {
      case FloatType => arr.getFloat(i).toDouble
      case _ => arr.getDouble(i)
    }

  /** Java accessor snippet for one element of `arr` at index `i`. */
  protected final def accessor(arr: String, i: String): String =
    childElemType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _ => s"$arr.getDouble($i)"
    }
}

/** `best_cell(vec)`: index of the max-score centroid row (rows are
  * pre-normalized by the caller, so the dot product IS the cosine
  * ordering — the 1/‖vec‖ factor is constant per row and cannot move
  * an argmax). Ties → larger index; degenerate input → `k−1`. */
case class BestCellExpr(child: Expression, matrix: Array[Array[Double]])
    extends CentroidExprBase {
  override def prettyName: String = "best_cell"
  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val dim = matrix(0).length
    var degen = n != dim
    var i = 0
    while (!degen && i < n) { if (v.isNullAt(i)) degen = true; i += 1 }
    if (degen) return matrix.length - 1
    var best = 0
    var bs = Double.NegativeInfinity
    var c = 0
    while (c < matrix.length) {
      val row = matrix(c)
      var s = 0.0
      var j = 0
      while (j < n) { s += elem(v, j) * row(j); j += 1 }
      if (s >= bs) { bs = s; best = c }
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
      val n = ctx.freshName("n"); val degen = ctx.freshName("degen")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val bs = ctx.freshName("bs"); val best = ctx.freshName("best")
      val row = ctx.freshName("row")
      s"""
         |int $n = $v.numElements();
         |boolean $degen = ($n != $m[0].length);
         |for (int $i = 0; !$degen && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) $degen = true;
         |}
         |if ($degen) { ${ev.value} = $m.length - 1; } else {
         |  int $best = 0;
         |  double $bs = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $m.length; $c++) {
         |    double[] $row = $m[$c];
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += ${accessor(v, j)} * $row[$j];
         |    }
         |    if ($s >= $bs) { $bs = $s; $best = $c; }
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `probe_cells(vec)`: the `nProbe` centroid indices with the largest
  * `(score, index)` pairs, emitted ASCENDING by `(score, index)` — the
  * exact output of the `slice(array_sort(...), -nProbe, nProbe)` it
  * replaces. Degenerate input → the last `nProbe` indices. */
case class ProbeCellsExpr(child: Expression, matrix: Array[Array[Double]],
    nProbe: Int) extends CentroidExprBase {
  override def prettyName: String = "probe_cells"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  private def p: Int = math.min(nProbe, matrix.length)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val k = matrix.length
    val dim = matrix(0).length
    var degen = n != dim
    var i = 0
    while (!degen && i < n) { if (v.isNullAt(i)) degen = true; i += 1 }
    val idx = new Array[Int](p)
    if (degen) {
      var q = 0
      while (q < p) { idx(q) = k - p + q; q += 1 }
    } else {
      val sc = new Array[Double](p)
      var cnt = 0
      var c = 0
      while (c < k) {
        val row = matrix(c)
        var s = 0.0
        var j = 0
        while (j < n) { s += elem(v, j) * row(j); j += 1 }
        if (cnt < p) {
          var pos = cnt
          while (pos > 0 && sc(pos - 1) > s) pos -= 1
          var q = cnt
          while (q > pos) { sc(q) = sc(q - 1); idx(q) = idx(q - 1); q -= 1 }
          sc(pos) = s; idx(pos) = c; cnt += 1
        } else if (s >= sc(0)) {
          var pos = 0
          while (pos + 1 < p && sc(pos + 1) <= s) {
            sc(pos) = sc(pos + 1); idx(pos) = idx(pos + 1); pos += 1
          }
          sc(pos) = s; idx(pos) = c
        }
        c += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(idx)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val m = ctx.addReferenceObj("centroids", matrix, "double[][]")
      val n = ctx.freshName("n"); val degen = ctx.freshName("degen")
      val i = ctx.freshName("i"); val c = ctx.freshName("c")
      val j = ctx.freshName("j"); val s = ctx.freshName("s")
      val sc = ctx.freshName("sc"); val idx = ctx.freshName("idx")
      val cnt = ctx.freshName("cnt"); val pos = ctx.freshName("pos")
      val q = ctx.freshName("q")
      s"""
         |int $n = $v.numElements();
         |boolean $degen = ($n != $m[0].length);
         |for (int $i = 0; !$degen && $i < $n; $i++) {
         |  if ($v.isNullAt($i)) $degen = true;
         |}
         |int[] $idx = new int[$p];
         |if ($degen) {
         |  for (int $q = 0; $q < $p; $q++) $idx[$q] = $m.length - $p + $q;
         |} else {
         |  double[] $sc = new double[$p];
         |  int $cnt = 0;
         |  for (int $c = 0; $c < $m.length; $c++) {
         |    double $s = 0.0;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $s += ${accessor(v, j)} * $m[$c][$j];
         |    }
         |    if ($cnt < $p) {
         |      int $pos = $cnt;
         |      while ($pos > 0 && $sc[$pos - 1] > $s) $pos--;
         |      for (int $q = $cnt; $q > $pos; $q--) {
         |        $sc[$q] = $sc[$q - 1]; $idx[$q] = $idx[$q - 1];
         |      }
         |      $sc[$pos] = $s; $idx[$pos] = $c; $cnt++;
         |    } else if ($s >= $sc[0]) {
         |      int $pos = 0;
         |      while ($pos + 1 < $p && $sc[$pos + 1] <= $s) {
         |        $sc[$pos] = $sc[$pos + 1]; $idx[$pos] = $idx[$pos + 1]; $pos++;
         |      }
         |      $sc[$pos] = $s; $idx[$pos] = $c;
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($idx);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_encode(vec)`: the `m` per-subspace nearest-centroid codes (argmax
  * of the subvector·centroid dot — scale-invariant, so raw vectors are
  * fine; see [[graft.ops.PqIndex]]). Ties → larger code; a subspace
  * whose slice is short or contains a null → code `k−1` (the all-null-
  * scores tie of the sliced-literal formulation). */
case class PqEncodeExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends CentroidExprBase {
  override def prettyName: String = "pq_encode"
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = books.length
    val k = books(0).length
    val dsub = books(0)(0).length
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      var degen = off + dsub > n
      var i = off
      while (!degen && i < off + dsub) { if (v.isNullAt(i)) degen = true; i += 1 }
      var best = k - 1
      if (!degen) {
        best = 0
        var bs = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          val row = books(mi)(c)
          var s = 0.0
          var j = 0
          while (j < dsub) { s += elem(v, off + j) * row(j); j += 1 }
          if (s >= bs) { bs = s; best = c }
          c += 1
        }
      }
      codes(mi) = best
      mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("books", books, "double[][][]")
      val n = ctx.freshName("n"); val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi"); val off = ctx.freshName("off")
      val degen = ctx.freshName("degen"); val i = ctx.freshName("i")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val bs = ctx.freshName("bs")
      val best = ctx.freshName("best"); val dsub = ctx.freshName("dsub")
      val kk = ctx.freshName("kk")
      s"""
         |int $n = $v.numElements();
         |int $kk = $b[0].length;
         |int $dsub = $b[0][0].length;
         |int[] $codes = new int[$b.length];
         |for (int $mi = 0; $mi < $b.length; $mi++) {
         |  int $off = $mi * $dsub;
         |  boolean $degen = ($off + $dsub > $n);
         |  for (int $i = $off; !$degen && $i < $off + $dsub; $i++) {
         |    if ($v.isNullAt($i)) $degen = true;
         |  }
         |  int $best = $kk - 1;
         |  if (!$degen) {
         |    $best = 0;
         |    double $bs = Double.NEGATIVE_INFINITY;
         |    for (int $c = 0; $c < $kk; $c++) {
         |      double $s = 0.0;
         |      for (int $j = 0; $j < $dsub; $j++) {
         |        $s += ${accessor(v, s"$off + $j")} * $b[$mi][$c][$j];
         |      }
         |      if ($s >= $bs) { $bs = $s; $best = $c; }
         |    }
         |  }
         |  $codes[$mi] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** `pq_lut(qvec)`: the per-query ADC lookup table as ONE FLAT
  * `array<double>` of length `m·k` — `LUT[mi·k + code]` = query
  * subvector · centroid. Flat instead of nested so the whole table is
  * one primitive array in codegen (`UnsafeArrayData.fromPrimitiveArray`)
  * and [[graft.ops.PqIndex.adcScore]] reads it with two adds per
  * subspace. A query too short for the codebook dimension or containing
  * a null element yields NULL (the old sliced-literal form produced
  * per-entry nulls — reachable only off the queries-are-clean contract,
  * and a null LUT fails the probe loudly instead of ranking on a
  * half-null table). */
case class PqLutExpr(child: Expression, books: Array[Array[Array[Double]]])
    extends CentroidExprBase {
  override def prettyName: String = "pq_lut"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val n = v.numElements()
    val m = books.length
    val k = books(0).length
    val dsub = books(0)(0).length
    if (n < m * dsub) return null
    var i = 0
    while (i < m * dsub) { if (v.isNullAt(i)) return null; i += 1 }
    val lut = new Array[Double](m * k)
    var mi = 0
    while (mi < m) {
      val off = mi * dsub
      var c = 0
      while (c < k) {
        val row = books(mi)(c)
        var s = 0.0
        var j = 0
        while (j < dsub) { s += elem(v, off + j) * row(j); j += 1 }
        lut(mi * k + c) = s
        c += 1
      }
      mi += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(lut)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val b = ctx.addReferenceObj("books", books, "double[][][]")
      val n = ctx.freshName("n"); val lut = ctx.freshName("lut")
      val mi = ctx.freshName("mi"); val off = ctx.freshName("off")
      val c = ctx.freshName("c"); val j = ctx.freshName("j")
      val s = ctx.freshName("s"); val i = ctx.freshName("i")
      val dsub = ctx.freshName("dsub"); val kk = ctx.freshName("kk")
      val ok = ctx.freshName("ok")
      s"""
         |int $n = $v.numElements();
         |int $kk = $b[0].length;
         |int $dsub = $b[0][0].length;
         |if ($n < $b.length * $dsub) { ${ev.isNull} = true; } else {
         |  boolean $ok = true;
         |  for (int $i = 0; $ok && $i < $b.length * $dsub; $i++) {
         |    if ($v.isNullAt($i)) $ok = false;
         |  }
         |  if (!$ok) { ${ev.isNull} = true; } else {
         |    double[] $lut = new double[$b.length * $kk];
         |    for (int $mi = 0; $mi < $b.length; $mi++) {
         |      int $off = $mi * $dsub;
         |      for (int $c = 0; $c < $kk; $c++) {
         |        double $s = 0.0;
         |        for (int $j = 0; $j < $dsub; $j++) {
         |          $s += ${accessor(v, s"$off + $j")} * $b[$mi][$c][$j];
         |        }
         |        $lut[$mi * $kk + $c] = $s;
         |      }
         |    }
         |    ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |      .fromPrimitiveArray($lut);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
