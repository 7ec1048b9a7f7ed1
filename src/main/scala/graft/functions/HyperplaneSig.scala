package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Native random-hyperplane LSH signature: embedding →
  * `nPlanes` sign bits of LCG-derived hyperplane dot products — the
  * codegen'd twin of [[graft.ext.Similarity.hyperplaneSignatureHof]]
  * (`transform(sequence…)` over `zip_with` + `aggregate`, three
  * interpreted lambdas and two intermediate arrays per plane per row).
  *
  * Bit-parity contract (pinned by SimilaritySpec): plane p's weight for
  * dimension j is `((1103515245·(p·dim+j) + 12345) mod 2³¹)/2³¹ · 2 − 1`
  * — exact int64 arithmetic, exact int→double conversion (< 2³¹), and
  * the dot product is the sequential left-to-right sum of
  * `x_j·w_{p,j}` in ascending j, the identical IEEE op sequence of the
  * HOF fold and the DuckDB oracle's `list_sum(list_transform(…))`. A
  * sign bit could differ across formulations only if a dot landed
  * within 1 ulp of exactly 0 under a DIFFERENT summation order — and
  * the order here is the same, so signatures are bit-identical.
  * Float elements widen exactly; double elements pass through.
  *
  * Precondition (same as [[CosineSimilarity]]): embeddings are
  * non-null arrays of exactly `dim` non-null elements. Parity with the
  * HOF holds on that domain; malformed rows (short arrays, null
  * elements) are NOT normalized identically — the HOF null-poisons the
  * whole dot (every bit 0) where this computes a partial dot.
  *
  * Why native: the signature is the corpus-proportional cost of every
  * embedding LSH operator (x09/x12/x14) — nPlanes·dim interpreted
  * lambda calls per row become one fused whole-stage-codegen loop.
  */
case class HyperplaneSig(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression {

  require(nPlanes >= 1 && dim >= 1, s"need nPlanes/dim >= 1, got $nPlanes/$dim")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyperplane_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got ${t.sql}")
  }

  private lazy val floatElements: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = math.min(dim, a.numElements())
    val out = new Array[Int](nPlanes)
    var p = 0
    while (p < nPlanes) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val x = if (floatElements) a.getFloat(j).toDouble else a.getDouble(j)
        val k = p.toLong * dim + j
        val w = ((1103515245L * k + 12345L) % 2147483648L).toDouble /
          2147483648.0 * 2.0 - 1.0
        dot += x * w
        j += 1
      }
      out(p) = if (dot >= 0) 1 else 0
      p += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val get = if (floatElements) "getFloat" else "getDouble"
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val p = ctx.freshName("p"); val j = ctx.freshName("j")
      val dot = ctx.freshName("dot"); val k = ctx.freshName("k")
      val w = ctx.freshName("w")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |int[] $out = new int[$nPlanes];
         |for (int $p = 0; $p < $nPlanes; $p++) {
         |  double $dot = 0.0;
         |  for (int $j = 0; $j < $n; $j++) {
         |    long $k = (long) $p * $dim + $j;
         |    double $w = (double) ((1103515245L * $k + 12345L) % 2147483648L)
         |      / 2147483648.0 * 2.0 - 1.0;
         |    $dot += (double) $a.$get($j) * $w;
         |  }
         |  $out[$p] = ($dot >= 0) ? 1 : 0;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {
  def apply(emb: Column, nPlanes: Int, dim: Int): Column =
    Natives.callRegistered(s"hyperplane_sig_${nPlanes}_$dim",
      exprs => HyperplaneSig(exprs.head, nPlanes, dim), emb)
}
