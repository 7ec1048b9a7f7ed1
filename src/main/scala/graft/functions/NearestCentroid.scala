package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native IVF coarse-quantizer assignment: index of the centroid with the
  * highest `dot(v, c_k) / ‖c_k‖` (first index on ties) over the
  * LCG-derived codebook of [[graft.ext.Similarity.centroidScores]].
  *
  * The codebook is precomputed once on the driver with EXACTLY the
  * arithmetic the in-expression HOF formulation performs — integer LCG
  * steps are exact, the [0,2)→[-1,1) scaling is exact in binary, and the
  * norm is the same left-to-right square sum — so the assignment is
  * bit-identical to the interpreted path and to the DuckDB oracle.
  *
  * Why native: the per-row assignment is the corpus-side cost of IVF (the
  * part that scales with the 100 TB corpus, unlike the tiny query-probe
  * side); as a HOF chain it evaluates interpreted lambdas per element.
  * This compiles to one fused loop in whole-stage codegen.
  */
case class NearestCentroid(child: Expression, nCentroids: Int, dim: Int,
                           seedOffset: Long) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  // same element-type dispatch as [[CosineSimilarity]]: float embeddings
  // widen exactly to double; double embeddings (the multimodal feature
  // bridge) pass through unchanged — so ivfTopK serves both
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  private lazy val floatElements: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val (weights, norms) =
    NearestCentroid.codebook(nCentroids, dim, seedOffset)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), dim)
    var bestK = 0; var bestS = Double.NegativeInfinity
    var k = 0
    while (k < nCentroids) {
      var dot = 0.0; var j = 0
      while (j < n) {
        val x = if (floatElements) a.getFloat(j).toDouble else a.getDouble(j)
        dot += x * weights(k * dim + j); j += 1
      }
      val s = dot / norms(k)
      if (s > bestS) { bestS = s; bestK = k } // strict > keeps FIRST max (tie rule)
      k += 1
    }
    bestK
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", weights, "double[]")
    val nm = ctx.addReferenceObj("norms", norms, "double[]")
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (floatElements) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val j = ctx.freshName("j"); val dot = ctx.freshName("dot")
      val s = ctx.freshName("s"); val bestK = ctx.freshName("bestK")
      val bestS = ctx.freshName("bestS")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $dim);
         |int $bestK = 0; double $bestS = Double.NEGATIVE_INFINITY;
         |for (int $k = 0; $k < $nCentroids; $k++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    $dot += ((double) $a.$get($j)) * $w[$k * $dim + $j];
         |  }
         |  double $s = $dot / $nm[$k];
         |  if ($s > $bestS) { $bestS = $s; $bestK = $k; }
         |}
         |${ev.value} = $bestK;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroid {

  /** The deterministic codebook: weight (k,j) = lcgUnit(seed + k·dim + j)
    * with the exact op sequence of `Similarity.lcgUnit`; norm k = sqrt of
    * the left-to-right sum of squares (the HOF fold order). */
  def codebook(nCentroids: Int, dim: Int, seedOffset: Long): (Array[Double], Array[Double]) = {
    val w = new Array[Double](nCentroids * dim)
    var k = 0
    while (k < nCentroids) {
      var j = 0
      while (j < dim) {
        val idx = seedOffset + k.toLong * dim + j
        val m = (1103515245L * idx + 12345L) % 2147483648L
        w(k * dim + j) = m.toDouble / 2147483648.0 * 2.0 - 1.0
        j += 1
      }
      k += 1
    }
    val norms = Array.tabulate(nCentroids) { kk =>
      var s = 0.0; var j = 0
      while (j < dim) { val x = w(kk * dim + j); s += x * x; j += 1 }
      math.sqrt(s)
    }
    (w, norms)
  }

  def apply(emb: Column, nCentroids: Int, dim: Int, seedOffset: Long): Column =
    Natives.callRegistered(s"nearest_centroid_${nCentroids}_${dim}_$seedOffset",
      exprs => NearestCentroid(exprs.head, nCentroids, dim, seedOffset), emb)
}
