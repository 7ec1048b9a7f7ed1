package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity over two
  * `array<float>` (or two `array<double>`) columns — the codegen'd hot
  * path for the ANN re-rank stages ([[graft.ext.Similarity]]). The
  * double flavor serves computed embeddings (e.g. the multimodal
  * feature bridge, [[graft.ext.Multimodal.FakeCodec.features]]) whose
  * values are born double-precision.
  *
  * Numeric contract (must stay in lockstep with the HOF formulation and
  * the DuckDB oracles): each float pair is widened to double (exact;
  * double elements pass through unchanged), the three accumulators
  * (dot, ‖a‖², ‖b‖²) are independent sequential left-to-right sums, and
  * the final value is `dot / (sqrt(na) * sqrt(nb))` — the exact IEEE
  * operation sequence both engines execute, so results are
  * bit-identical to the interpreted version. Array elements are assumed
  * non-null (embedding columns); either array null → result null.
  *
  * Why an Expression and not a HOF chain: `zip_with`/`aggregate`
  * evaluate their lambdas interpreted (one function call per element
  * per lambda), which dominates the ANN re-rank cost. This compiles to
  * a tight fused loop inside whole-stage codegen.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  // reject mixed/other element types at analysis time: getFloat on an
  // array<double> would silently read half of each element's bit pattern
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<float>, array<float>) or (array<double>, array<double>), " +
        s"got (${l.sql}, ${r.sql})")
  }

  private lazy val floatElements: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xv = if (floatElements) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (floatElements) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xv * yv; na += xv * xv; nb += yv * yv
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val get = if (floatElements) "getFloat" else "getDouble"
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xv = ctx.freshName("xv")
      val yv = ctx.freshName("yv")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xv = (double) $a.$get($i);
         |  double $yv = (double) $b.$get($i);
         |  $dot += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  val Name = "cosine_similarity"

  /** Column-API entry point: registers the expression in the active
    * session's function registry on first use and calls it — the public
    * route from Column to a custom Expression on Spark 4. */
  def apply(a: Column, b: Column): Column =
    Natives.callRegistered(Name,
      exprs => CosineSimilarity(exprs(0), exprs(1)), a, b)
}
