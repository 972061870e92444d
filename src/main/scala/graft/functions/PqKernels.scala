package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Compiled PQ encode kernel (round 21 — VERDICT r20 #1, the direct
  * continuation of the round-20 [[NearestSeed]] win): the per-subspace
  * argmin over ksub codebook entries of the rounded squared-L2
  * distance, for all m subspaces, as ONE expression whose generated
  * code is O(1) in m·ksub — the codebooks ride along as a REFERENCE
  * OBJECT (`ctx.addReferenceObj`), never as literal expression nodes.
  *
  * The literal form it replaces builds m·ksub separate
  * `round(sq_dist_l2(slice(v, j·sub+1, sub), typedLit(book)), 6)`
  * struct expressions per row (128 at the registered m=8/ksub=16):
  * every distinct trained book set generates fresh janino source, each
  * `slice` materializes a sub-element array per candidate, and at
  * production m/ksub the projection crosses the 64 KB whole-stage-
  * codegen method limit exactly as seed assignment did at K>512
  * (BASELINE round-20 TimeSeed2L). This kernel's generated code is a
  * fixed-size triple loop, whatever m·ksub is.
  *
  * Bit-equivalence contract with the literal form (spec-asserted):
  *   - per-candidate distance is [[SqDistL2]]'s exact accumulation
  *     (naa/dab/nbb in index order, combined as naa − 2·dab + nbb)
  *     over n = min(|slice|, sub) elements — `slice(v, j·sub+1, sub)`
  *     yields max(0, min(sub, |v| − j·sub)) elements, reproduced here
  *     by clamping the per-subspace loop bound;
  *   - each candidate rounds through [[NearestSeed.round6]] (Spark's
  *     `round(_, 6)` arithmetic) BEFORE comparison;
  *   - the running min uses `java.lang.Double.compare` with ties
  *     keeping the EARLIER candidate — codes iterate ascending, so
  *     this IS the (dist ASC, code ASC) struct-min.
  *
  * Returns array<int> of m codes — the same value
  * `array(argmin_0, …, argmin_{m−1})` produces.
  */
case class PqEncode(child: Expression, m: Int, ksub: Int, flatBooks: Seq[Double])
    extends UnaryExpression {

  require(m > 0 && ksub > 0, "pq_encode requires m > 0 and ksub > 0")
  require(flatBooks.length % (m * ksub) == 0 && flatBooks.nonEmpty,
    s"flat codebook length ${flatBooks.length} not a positive multiple of m*ksub = ${m * ksub}")

  private val sub: Int = flatBooks.length / (m * ksub)
  @transient private lazy val bookArr: Array[Double] = flatBooks.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<double> input, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val len = v.numElements()
    val codes = new Array[Any](m)
    var j = 0
    while (j < m) {
      // slice(v, j*sub+1, sub) semantics: the slice is empty past the
      // end of v, shorter when v ends mid-subspace
      val n = math.max(0, math.min(sub, len - j * sub))
      var bestD = Double.NaN
      var bestC = 0
      var first = true
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * sub
        var naa = 0.0; var dab = 0.0; var nbb = 0.0
        var d = 0
        while (d < n) {
          val xv = v.getDouble(j * sub + d)
          val yv = bookArr(base + d)
          naa += xv * xv; dab += xv * yv; nbb += yv * yv
          d += 1
        }
        val dist = NearestSeed.round6(naa - 2.0 * dab + nbb)
        if (first || java.lang.Double.compare(dist, bestD) < 0) {
          bestD = dist; bestC = c; first = false
        }
        c += 1
      }
      codes(j) = bestC
      j += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val books = ctx.addReferenceObj("pqEncodeBooks", bookArr, "double[]")
      val len = ctx.freshName("len")
      val codes = ctx.freshName("codes")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val bestD = ctx.freshName("bestD")
      val bestC = ctx.freshName("bestC")
      val first = ctx.freshName("first")
      val c = ctx.freshName("c")
      val base = ctx.freshName("base")
      val naa = ctx.freshName("naa")
      val dab = ctx.freshName("dab")
      val nbb = ctx.freshName("nbb")
      val d = ctx.freshName("d")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      val dist = ctx.freshName("dist")
      s"""
         |int $len = $a.numElements();
         |int[] $codes = new int[$m];
         |for (int $j = 0; $j < $m; $j++) {
         |  int $n = Math.max(0, Math.min($sub, $len - $j * $sub));
         |  double $bestD = Double.NaN;
         |  int $bestC = 0;
         |  boolean $first = true;
         |  for (int $c = 0; $c < $ksub; $c++) {
         |    int $base = ($j * $ksub + $c) * $sub;
         |    double $naa = 0.0, $dab = 0.0, $nbb = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      double $xv = $a.getDouble($j * $sub + $d);
         |      double $yv = $books[$base + $d];
         |      $naa += $xv * $xv; $dab += $xv * $yv; $nbb += $yv * $yv;
         |    }
         |    double $dist = graft.functions.NearestSeed.round6($naa - 2.0 * $dab + $nbb);
         |    if ($first || java.lang.Double.compare($dist, $bestD) < 0) {
         |      $bestD = $dist; $bestC = $c; $first = false;
         |    }
         |  }
         |  $codes[$j] = $bestC;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Compiled ADC scoring kernel (round 21, [[PqEncode]]'s pair): the
  * rounded squared-L2 distance between a full-precision (residual)
  * query vector and a candidate's codebook RECONSTRUCTION, computed
  * straight from the codes — no per-row `concat(element_at…)`
  * reconstruction array is allocated.
  *
  * Bit-equivalence with the literal form
  * `round(sq_dist_l2(q, concat_j(books(j)(codes(j)))), 6)`
  * (spec-asserted): the reconstruction is a pure index mapping
  * (element i of the concat is books[i/sub][codes[i/sub]][i%sub]), the
  * accumulation is [[SqDistL2]]'s exact index-order naa/dab/nbb over
  * n = min(|q|, m·sub) elements, and the result rounds through
  * [[NearestSeed.round6]].
  */
case class AdcScore(left: Expression, right: Expression,
    m: Int, ksub: Int, flatBooks: Seq[Double]) extends BinaryExpression {

  require(m > 0 && ksub > 0, "adc_score requires m > 0 and ksub > 0")
  require(flatBooks.length % (m * ksub) == 0 && flatBooks.nonEmpty,
    s"flat codebook length ${flatBooks.length} not a positive multiple of m*ksub = ${m * ksub}")

  private val sub: Int = flatBooks.length / (m * ksub)
  @transient private lazy val bookArr: Array[Double] = flatBooks.toArray

  override def dataType: DataType = DoubleType
  override def prettyName: String = "adc_score"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<double>, array<int>) inputs, got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val codes = b.asInstanceOf[ArrayData]
    val n = math.min(q.numElements(), m * sub)
    var naa = 0.0; var dab = 0.0; var nbb = 0.0
    var i = 0
    while (i < n) {
      val j = i / sub
      val xv = q.getDouble(i)
      val yv = bookArr((j * ksub + codes.getInt(j)) * sub + i % sub)
      naa += xv * xv; dab += xv * yv; nbb += yv * yv
      i += 1
    }
    NearestSeed.round6(naa - 2.0 * dab + nbb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val books = ctx.addReferenceObj("adcScoreBooks", bookArr, "double[]")
      val n = ctx.freshName("n")
      val naa = ctx.freshName("naa")
      val dab = ctx.freshName("dab")
      val nbb = ctx.freshName("nbb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = Math.min($a.numElements(), ${m * sub});
         |double $naa = 0.0, $dab = 0.0, $nbb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $j = $i / $sub;
         |  double $xv = $a.getDouble($i);
         |  double $yv = $books[($j * $ksub + $b.getInt($j)) * $sub + $i % $sub];
         |  $naa += $xv * $xv; $dab += $xv * $yv; $nbb += $yv * $yv;
         |}
         |${ev.value} = graft.functions.NearestSeed.round6($naa - 2.0 * $dab + $nbb);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
